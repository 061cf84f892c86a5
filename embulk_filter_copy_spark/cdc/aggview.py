"""Incrementally-maintained aggregate views over a CDC sink table.

The lake analogue of a streaming materialized aggregate: a view holding
``GROUP BY group_cols → count + sums`` over a LakeTable's live rows, kept
fresh from the table's own change history instead of recomputed from
scratch. The reference has no aggregation at all (SURVEY.md §2.4 marks the
category absent/delegated); this is the generalized capability a CDC sink
feeding dashboards or routing decisions needs.

Maintenance algebra (the classic delta-maintenance rules for distributive
aggregates, applied over :meth:`LakeTable.changelog`'s pre/post images):

* insert  (I): ``+1`` row, ``+after``  to the AFTER-image's group;
* delete  (D): ``-1`` row, ``-before`` from the BEFORE-image's group;
* update  (U): both — which handles rows whose GROUP COLUMN itself changed
  (the row leaves one group and enters another; a naive "group by current
  group" delta silently corrupts both groups).

Only count/sum (and anything derivable: avg, rates) are delta-maintainable
under deletes without re-reading group members; min/max would need a
touched-group rescan and are out of scope here.

Cost model at 100 TB: the changelog side is manifest-diff + LSN pruned
(∝ changed data), the delta is ONE partial-aggregated shuffle on the group
columns (∝ changed rows, then ∝ touched groups), and the view merge joins
delta against the stored view (∝ #groups — repos/languages, not rows). No
stage ever scans the full fact table after the initial build.

Freshness/consistency contract: the view stores the exact table version it
reflects; refresh is idempotent (same version → no-op) and falls back to a
full rebuild when the change feed cannot be trusted across the gap — a
rollback or tombstone purge between the view's version and now (both raise
in ``read_changes``), or a view version AHEAD of the table (rollback past
the view).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from embulk_filter_copy_spark.lake.table import LakeTable

_META = "_VIEW_META.json"


def _meta_path(view_path: str) -> str:
    return os.path.join(view_path, _META)


def _read_meta(view_path: str) -> dict | None:
    p = _meta_path(view_path)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _view_cols(group_cols: list[str], sum_cols: list[str]) -> list[str]:
    return list(group_cols) + ["n_rows"] + [f"sum_{c}" for c in sum_cols]


def _aggregate(df: DataFrame, group_cols: list[str], sum_cols: list[str]) -> DataFrame:
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(F.coalesce(F.col(c), F.lit(0.0))).alias(f"sum_{c}") for c in sum_cols],
    )


def _commit_view(spark: SparkSession, view_path: str, df: DataFrame, meta: dict) -> None:
    """Write the view data then swing the meta pointer — a crash between the
    two leaves the previous (version, data dir) pair fully intact."""
    data_dir = os.path.join(view_path, f"data-{meta['version']:08d}-{uuid.uuid4().hex[:8]}")
    df.write.mode("errorifexists").parquet(data_dir)
    tmp = os.path.join(view_path, f".{_META}.{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(dict(meta, data_dir=os.path.basename(data_dir)), f)
    os.replace(tmp, _meta_path(view_path))
    # sweep EVERY non-current data dir, not just the immediately-previous
    # one — a crash between the pointer swap and this cleanup would
    # otherwise leak a directory forever
    keep = os.path.basename(data_dir)
    for name in os.listdir(view_path):
        if name.startswith("data-") and name != keep:
            shutil.rmtree(os.path.join(view_path, name), ignore_errors=True)


def read_agg_view(spark: SparkSession, view_path: str) -> DataFrame:
    meta = _read_meta(view_path)
    if meta is None:
        raise FileNotFoundError(f"no aggregate view at {view_path}")
    return spark.read.parquet(os.path.join(view_path, meta["data_dir"]))


def agg_view_version(view_path: str) -> int:
    meta = _read_meta(view_path)
    return -1 if meta is None else int(meta["version"])


def build_agg_view(
    spark: SparkSession,
    table: LakeTable,
    view_path: str,
    group_cols: list[str],
    sum_cols: list[str] | None = None,
) -> dict:
    """Full build: one aggregation over the table's live rows at a pinned
    version. Runs once; every later refresh is incremental."""
    sum_cols = list(sum_cols or [])
    version = table.current_version()
    os.makedirs(view_path, exist_ok=True)
    agg = _aggregate(table.read(version=version), group_cols, sum_cols)
    _commit_view(
        spark,
        view_path,
        agg,
        {"version": version, "group_cols": list(group_cols), "sum_cols": sum_cols},
    )
    return {"mode": "full", "version": version}


def _delta(
    log: DataFrame, keys: set[str], group_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    """Per-group (Δcount, Δsums) from a changelog frame. Key columns appear
    bare in the changelog; payload columns as before_/after_ pairs."""

    def ref(side: str, c: str):
        return F.col(c) if c in keys else F.col(f"{side}_{c}")

    def contrib(side: str, sign: int, ops: list[str]) -> DataFrame:
        return log.filter(F.col("op").isin(*ops)).select(
            *[ref(side, g).alias(g) for g in group_cols],
            F.lit(sign).cast("long").alias("_dn"),
            *[
                (F.lit(sign) * F.coalesce(ref(side, c), F.lit(0.0))).alias(f"_ds_{c}")
                for c in sum_cols
            ],
        )

    both = contrib("before", -1, ["U", "D"]).unionByName(contrib("after", +1, ["I", "U"]))
    return both.groupBy(*group_cols).agg(
        F.sum("_dn").alias("_dn"),
        *[F.sum(f"_ds_{c}").alias(f"_ds_{c}") for c in sum_cols],
    )


def refresh_agg_view(spark: SparkSession, table: LakeTable, view_path: str) -> dict:
    """Incremental refresh from the table's changelog since the view's
    version. Idempotent; falls back to a full rebuild when the feed refuses
    the gap (rollback / tombstone purge) or the table regressed below the
    view's version."""
    meta = _read_meta(view_path)
    if meta is None:
        raise FileNotFoundError(
            f"no aggregate view at {view_path}; run build_agg_view first"
        )
    group_cols, sum_cols = meta["group_cols"], meta["sum_cols"]
    version = table.current_version()
    since = int(meta["version"])
    if version == since:
        return {"mode": "noop", "version": version}
    if version < since:
        res = build_agg_view(spark, table, view_path, group_cols, sum_cols)
        return dict(res, mode="rebuild", reason="table regressed below view version")
    try:
        # pin the window's END to the version the meta will record — a
        # commit landing between the version read and the changelog scan
        # would otherwise be covered by the scan but NOT by the recorded
        # version, and the next refresh would re-apply it (double count)
        log = table.changelog(since, version=version)
    except ValueError as e:
        res = build_agg_view(spark, table, view_path, group_cols, sum_cols)
        return dict(res, mode="rebuild", reason=str(e))
    keys = set(table.key_columns)
    delta = _delta(log, keys, group_cols, sum_cols)
    view = read_agg_view(spark, view_path)
    # null-safe group equality: NULL is a legitimate group value, and a
    # plain equi-join would never match it (duplicating the null group on
    # every refresh)
    d = delta.select(
        *[F.col(g).alias(f"_g_{g}") for g in group_cols],
        "_dn",
        *[F.col(f"_ds_{c}") for c in sum_cols],
    )
    cond = None
    for g in group_cols:
        piece = view[g].eqNullSafe(d[f"_g_{g}"])
        cond = piece if cond is None else (cond & piece)
    merged = (
        view.join(d, on=cond, how="full_outer")
        .select(
            *[F.coalesce(view[g], d[f"_g_{g}"]).alias(g) for g in group_cols],
            (F.coalesce(F.col("n_rows"), F.lit(0)) + F.coalesce(F.col("_dn"), F.lit(0))).alias(
                "n_rows"
            ),
            *[
                (
                    F.coalesce(F.col(f"sum_{c}"), F.lit(0.0))
                    + F.coalesce(F.col(f"_ds_{c}"), F.lit(0.0))
                ).alias(f"sum_{c}")
                for c in sum_cols
            ],
        )
        .filter(F.col("n_rows") > 0)
    )
    _commit_view(
        spark,
        view_path,
        merged,
        {"version": version, "group_cols": group_cols, "sum_cols": sum_cols},
    )
    return {"mode": "incremental", "version": version, "since": since}
