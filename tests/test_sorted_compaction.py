"""Sort-ordered compaction, per-file col_stats, manifest range pruning."""

import os

import pytest
from pyspark.sql import functions as F

from embulk_filter_copy_spark.lake.table import LakeTable


def _mk(spark, path, n=4000, n_buckets=4):
    t = LakeTable.create(
        spark, path,
        [("k", "long"), ("ts_val", "long"), ("v", "string")],
        key_columns=["k"], n_buckets=n_buckets,
    )
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            # value correlated with nothing: hash order, so pre-sort files
            # have overlapping ranges and the sorted rewrite matters
            F.pmod(F.xxhash64("id"), F.lit(100_000)).alias("ts_val"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        )
        .withColumn("_lsn", F.lit(1))
    )
    t.append(df)
    return t


def test_sorted_compaction_records_stats_and_prunes(spark, tmpdir_path):
    t = _mk(spark, os.path.join(tmpdir_path, "t"))
    res = t.compact(sort_by=["ts_val"], files_per_bucket_out=4)
    assert res["buckets_compacted"]  # a clustering request forces rewrites

    files = t.files()
    assert all("col_stats" in f and "ts_val" in f["col_stats"] for f in files)
    # range-split: ~4 files per bucket, ranges disjoint within each bucket
    per_bucket: dict = {}
    for f in files:
        per_bucket.setdefault(f["bucket"], []).append(f["col_stats"]["ts_val"])
    for b, ranges in per_bucket.items():
        assert len(ranges) >= 2
        ranges.sort()
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2, (b, ranges)

    lo, hi = 20_000, 30_000
    pruned = t.read(stat_filter=("ts_val", lo, hi))
    full = t.read().filter(F.col("ts_val").between(lo, hi))
    assert sorted(r["k"] for r in pruned.collect()) == sorted(
        r["k"] for r in full.collect()
    )
    # the scan planned strictly fewer files than the table holds
    kept = [
        f for f in files
        if not (f["col_stats"]["ts_val"][1] < lo or f["col_stats"]["ts_val"][0] > hi)
    ]
    assert 0 < len(kept) < len(files)
    # and the pruned plan reads exactly those files' rows
    assert pruned.count() == full.count() > 0


def test_stat_filter_is_exact_without_stats(spark, tmpdir_path):
    """Files written before any sorted compaction carry no col_stats —
    stat_filter must still return exact results (prune nothing, filter
    rows)."""
    t = _mk(spark, os.path.join(tmpdir_path, "t"), n=500)
    got = t.read(stat_filter=("ts_val", 10_000, 50_000)).count()
    want = t.read().filter(F.col("ts_val").between(10_000, 50_000)).count()
    assert got == want > 0


def test_stat_filter_never_prunes_delta_buckets(spark, tmpdir_path):
    """MOR correctness: the LWW winner may live in a delta file OUTSIDE the
    range — buckets holding deltas are exempt from file pruning, and the
    post-resolution row filter keeps results exact."""
    t = _mk(spark, os.path.join(tmpdir_path, "t"), n=400, n_buckets=2)
    t.compact(sort_by=["ts_val"], files_per_bucket_out=3)
    # move key 7's ts_val OUT of every range via a MOR delta (newer lsn)
    t.append_delta(
        spark.createDataFrame([(7, 999_999, "moved")], "k long, ts_val long, v string")
        .withColumn("_lsn", F.lit(100)),
        commit={"run_id": "d", "epoch": 0, "seq": -1},
    )
    # a range query over the OLD value's range must NOT see key 7's stale row
    old_val = 0
    rows = t.read(stat_filter=("ts_val", 0, 200_000)).filter(F.col("k") == 7).collect()
    assert rows == []  # new value 999_999 is outside the asked range
    rows = t.read(stat_filter=("ts_val", 900_000, None)).filter(F.col("k") == 7).collect()
    assert len(rows) == 1 and rows[0]["v"] == "moved"


def test_stat_filter_survives_rename(spark, tmpdir_path):
    """col_stats are stored under the file's column name at write time; a
    later rename must still prune (field-id mapping)."""
    t = _mk(spark, os.path.join(tmpdir_path, "t"), n=800)
    t.compact(sort_by=["ts_val"], files_per_bucket_out=4)
    t.update_schema({"action": "rename", "from": "ts_val", "to": "event_ts"}, schema_lsn=99)
    got = t.read(stat_filter=("event_ts", 0, 10_000))
    want = t.read().filter(F.col("event_ts") <= 10_000)
    assert got.count() == want.count() > 0
    assert "event_ts" in got.columns


def test_extra_stat_columns_recorded_and_pruned(spark, tmpdir_path):
    """stat_columns beyond the sort key: recorded per file; prunable when
    the column correlates with the sort order (here k correlates with
    nothing, so its ranges overlap — kept files still answer exactly)."""
    t = _mk(spark, os.path.join(tmpdir_path, "t"), n=1000)
    t.compact(sort_by=["ts_val"], files_per_bucket_out=3, stat_columns=["k"])
    files = t.files()
    assert all("k" in f["col_stats"] and "ts_val" in f["col_stats"] for f in files)
    got = t.read(stat_filter=("k", 0, 100)).count()
    want = t.read().filter(F.col("k") <= 100).count()
    assert got == want > 0
