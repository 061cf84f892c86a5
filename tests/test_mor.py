"""Merge-on-read mode: O(batch) delta appends + scan-time LWW resolution +
compaction fold-back. Must be semantically identical to copy-on-write."""

import os

from pyspark.sql import functions as F

from embulk_filter_copy_spark.cdc.replayer import replay_batch
from embulk_filter_copy_spark.fixtures import (
    REPO_FILES_SCHEMA,
    gen_change_events,
    gen_repo_files,
    replay_oracle,
)
from embulk_filter_copy_spark.lake.table import LakeTable


def _bootstrap(spark, tmpdir_path, name, n_base=150, seed=42):
    base = gen_repo_files(spark, n_base, seed=seed)
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, name), REPO_FILES_SCHEMA,
        key_columns=["repo", "path"], n_buckets=8,
    )
    t.append(base.withColumn("_lsn", F.lit(0)))
    return t, base


def _golden(base, ev):
    return replay_oracle(base.toPandas(), ev.toPandas())


def _assert_matches(t, golden):
    got = t.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert len(got) == len(golden)
    assert got[["repo", "path", "content", "commit"]].equals(
        golden[["repo", "path", "content", "commit"]].reset_index(drop=True))


def test_mor_replay_matches_oracle(spark, tmpdir_path):
    t, base = _bootstrap(spark, tmpdir_path, "mor")
    ev = gen_change_events(spark, 150, 800, seed=42, dup_rate=0.05)
    replay_batch(spark, ev, t, run_id="mor", n_epochs=4, merge_mode="mor")
    assert t.delta_file_count() > 0  # no rewrites happened
    _assert_matches(t, _golden(base, ev))


def test_mor_equals_cow_final_state(spark, tmpdir_path):
    ev = gen_change_events(spark, 150, 600, seed=7, dup_rate=0.1)
    t1, base = _bootstrap(spark, tmpdir_path, "cow", seed=7)
    t2, _ = _bootstrap(spark, tmpdir_path, "mor", seed=7)
    replay_batch(spark, ev, t1, run_id="r", n_epochs=3, merge_mode="cow")
    replay_batch(spark, ev, t2, run_id="r", n_epochs=3, merge_mode="mor")
    a = t1.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    b = t2.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert a.equals(b)


def test_mor_compaction_folds_deltas(spark, tmpdir_path):
    t, base = _bootstrap(spark, tmpdir_path, "mor", seed=5)
    ev = gen_change_events(spark, 150, 500, seed=5)
    replay_batch(spark, ev, t, run_id="r", n_epochs=3, merge_mode="mor")
    before = t.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert t.delta_file_count() > 0
    t.compact(purge_tombstones=True)
    assert t.delta_file_count() == 0
    after = t.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert before.equals(after)
    _assert_matches(t, _golden(base, ev))
    # tombstones physically gone
    assert t.read(include_meta=True).filter(F.col("_deleted")).count() == 0


def test_mor_epoch_reapply_skipped(spark, tmpdir_path):
    t, _ = _bootstrap(spark, tmpdir_path, "mor", seed=3)
    ev = gen_change_events(spark, 150, 300, seed=3)
    replay_batch(spark, ev, t, run_id="r", n_epochs=2, merge_mode="mor")
    v = t.current_version()
    res = replay_batch(spark, ev, t, run_id="r", n_epochs=2, merge_mode="mor")
    assert all(r["skipped"] for r in res)
    assert t.current_version() == v


def test_mixed_mor_then_cow(spark, tmpdir_path):
    """A CoW merge over a table holding MOR deltas resolves them correctly
    (the merge reads the resolved view) and clears delta files for the
    buckets it rewrites."""
    t, base = _bootstrap(spark, tmpdir_path, "mix", seed=9)
    ev = gen_change_events(spark, 150, 600, seed=9)
    half = ev.filter("lsn <= 300")
    rest = ev.filter("lsn > 300")
    replay_batch(spark, half, t, run_id="a", n_epochs=1, merge_mode="mor")
    assert t.delta_file_count() > 0
    replay_batch(spark, rest, t, run_id="b", n_epochs=1, merge_mode="cow")
    _assert_matches(t, _golden(base, ev))
