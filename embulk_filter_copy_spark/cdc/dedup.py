"""Watermarked last-writer-wins dedup on (repo, path, lsn).

The reference provides NO ordering guarantee at the sink — its fan-out
consumers drain a shared keyless queue (LoaderState.scala:36-37,
PipeInputPlugin.scala:45-54) — so order must be restored *semantically*.
Here that is per-key arg-max over the LSN, expressed two ways:

* :func:`lww_dedup` — single-pass ``groupBy(keys).agg(max_by(struct, order))``.
  Catalyst plans this as partial aggregation (map-side combine) + final
  aggregation after one shuffle on the keys — already two-phase.
* :func:`lww_dedup_salted` — EXPLICIT two-phase local-combine/global-merge
  with a salt column (north_rule requirement): hot keys are first reduced
  within (key, salt) groups so no single reducer sees a hot key's full
  event volume, then the (far smaller) per-salt winners are merged globally.
  At 10^10 events with Zipf-hot repos this caps per-task skew at
  ~1/n_salts of the hot key's volume.

Ties on equal LSN break deterministically by `commit` then `op` so replays
are bit-stable regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _order_struct(lsn_col: str, tiebreak: tuple[str, ...]) -> F.Column:
    return F.struct(F.col(lsn_col), *[F.col(c) for c in tiebreak])


def lww_dedup(
    events: DataFrame,
    keys: tuple[str, ...] = ("repo", "path"),
    lsn_col: str = "lsn",
    tiebreak: tuple[str, ...] = ("commit", "op"),
) -> DataFrame:
    """One surviving event per key: the max-(lsn, tiebreak) row image.

    Also collapses exact duplicate re-emissions of the same (key, lsn) —
    the dedup key required by north_star — because duplicates compare equal
    and max_by keeps a single row.
    """
    tb = tuple(c for c in tiebreak if c in events.columns)
    payload = [c for c in events.columns if c not in keys]
    agg = events.groupBy(*keys).agg(
        F.max_by(F.struct(*payload), _order_struct(lsn_col, tb)).alias("_win")
    )
    return agg.select(*keys, *[F.col(f"_win.{c}").alias(c) for c in payload])


def lww_dedup_salted(
    events: DataFrame,
    keys: tuple[str, ...] = ("repo", "path"),
    lsn_col: str = "lsn",
    tiebreak: tuple[str, ...] = ("commit", "op"),
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted LWW (north_rule: salted repartition + local-combine /
    global-merge keyed by (repo, path)).

    Phase 1 shuffles on (keys, salt) — a hot key's events spread over
    `n_salts` reducers, each emitting one local winner. Phase 2 merges the
    ≤ n_salts winners per key. The salt is a hash of the LSN (uniform,
    deterministic), not random, so replays are stable.
    """
    tb = tuple(c for c in tiebreak if c in events.columns)
    payload = [c for c in events.columns if c not in keys]
    salted = events.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(lsn_col)), F.lit(n_salts))
    )
    local = salted.groupBy(*keys, "_salt").agg(
        F.max_by(F.struct(*payload), _order_struct(lsn_col, tb)).alias("_win")
    )
    merged = local.groupBy(*keys).agg(
        F.max_by(
            F.col("_win"),
            F.struct(F.col(f"_win.{lsn_col}"), *[F.col(f"_win.{c}") for c in tb]),
        ).alias("_win")
    )
    return merged.select(*keys, *[F.col(f"_win.{c}").alias(c) for c in payload])
