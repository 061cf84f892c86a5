"""Sharded-WAL multiplexer: merge N independently-numbered change logs
into one totally-ordered log the replayer can consume.

Sharded upstreams (per-shard Postgres logical slots, Mongo shards, a
Debezium connector per database) each emit their OWN LSN domain — raw
union would let shard A's lsn=10^9 permanently outrank shard B's lsn=17
on... nothing, actually, per key (a hash-sharded upstream keeps each key
on one shard), but it would wreck every cross-shard LSN comparison the
engine makes: epoch splitting, commit watermarks, `read_changes` pruning,
quarantine thresholds.

The restamp is O(1) per row, shuffle-free and deterministic:

    lsn' = src_lsn * n_shards + shard_index

* strictly monotone WITHIN each shard → per-key ordering preserved (each
  key lives on one shard — the sharding contract, documented below);
* distinct ACROSS shards → one total order, no collisions;
* reversible → ``_shard`` / ``_src_lsn`` lineage columns carry the
  original coordinates for audit and for resuming per-shard tails.

Contract: keys must not migrate between shards mid-log (if they do, the
two fragments order by interleaved restamped LSNs — deterministic but not
the upstream wall-clock order; migrate keys through an explicit
delete+insert pair, as upstream shard-rebalancers do). For epochs to keep
``read_changes``' monotone-watermark property, feed the merged log in
``lsn'`` order — ``replay_batch`` does (contiguous lsn ranges), and
roughly co-progressing shard tails approximate it in streaming.

Scale: nothing here shuffles or sorts — the multiplexer is a per-row
projection, so 10^10 events cost exactly one map pass fused into the
replay's own scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_wal_shards(
    shards: list[DataFrame] | dict[str, DataFrame],
    lsn_col: str = "lsn",
) -> DataFrame:
    """Union N shard logs with the total-order restamp.

    ``shards``: list (shard index = position) or dict (shard names are
    recorded in ``_shard_name``; indexes follow sorted name order so the
    restamp is stable across runs). Output columns: the event envelope
    with ``lsn`` restamped, plus ``_shard`` (int), ``_src_lsn`` (the
    shard-local LSN) and, for dict input, ``_shard_name``.
    """
    if isinstance(shards, dict):
        names = sorted(shards)
        items = [(i, names[i], shards[names[i]]) for i in range(len(names))]
    else:
        items = [(i, None, df) for i, df in enumerate(shards)]
    if not items:
        raise ValueError("merge_wal_shards needs at least one shard")
    n = len(items)
    parts = []
    for idx, name, df in items:
        p = df.select(
            *[c for c in df.columns if c != lsn_col],
            (F.col(lsn_col) * F.lit(n) + F.lit(idx)).alias(lsn_col),
            F.lit(idx).alias("_shard"),
            F.col(lsn_col).alias("_src_lsn"),
        )
        if name is not None:
            p = p.withColumn("_shard_name", F.lit(name))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
