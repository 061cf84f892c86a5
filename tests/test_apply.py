"""M1: batch replay end-to-end vs the pandas oracle (sha256 parity)."""

import hashlib
import os

from pyspark.sql import functions as F

from embulk_filter_copy_spark.cdc.apply import apply_batch, read_lineage
from embulk_filter_copy_spark.cdc.replayer import replay_batch
from embulk_filter_copy_spark.fixtures import (
    REPO_FILES_SCHEMA,
    gen_change_events,
    gen_repo_files,
    replay_oracle,
)
from embulk_filter_copy_spark.lake.table import LakeTable


def _bootstrap(spark, tmpdir_path, n_base=200, n_buckets=8, seed=42):
    base = gen_repo_files(spark, n_base, seed=seed)
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "tbl"), REPO_FILES_SCHEMA,
        key_columns=["repo", "path"], n_buckets=n_buckets,
    )
    t.append(base.withColumn("_lsn", F.lit(0)))
    return t, base


def _assert_parity(spark, table, base, events):
    golden = replay_oracle(base.toPandas(), events.toPandas())
    got = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert len(got) == len(golden), f"row count {len(got)} != oracle {len(golden)}"

    def sha(s):
        return s.map(lambda x: None if x is None else hashlib.sha256(str(x).encode()).hexdigest())

    for frame in (got, golden):
        frame["content_sha"] = sha(frame["content"])
    cols = ["repo", "path", "content_sha", "commit", "lang"]
    gl = golden[cols].reset_index(drop=True)
    gt = got[cols].reset_index(drop=True)
    diff = gt.compare(gl) if gt.shape == gl.shape else "shape-mismatch"
    assert gt.equals(gl), f"mismatch:\n{diff}"


def test_single_batch_apply_matches_oracle(spark, tmpdir_path):
    t, base = _bootstrap(spark, tmpdir_path)
    ev = gen_change_events(spark, 200, 1000, seed=42, dup_rate=0.05)
    res = apply_batch(t, ev, run_id="r1", epoch=0)
    assert not res["skipped"] and res["rows_applied"] > 0
    _assert_parity(spark, t, base, ev)


def test_multi_epoch_replay_matches_oracle(spark, tmpdir_path):
    t, base = _bootstrap(spark, tmpdir_path, seed=11)
    ev = gen_change_events(spark, 200, 1500, seed=11, dup_rate=0.1)
    replay_batch(spark, ev, t, run_id="mr", n_epochs=5)
    _assert_parity(spark, t, base, ev)


def test_epoch_reapply_is_noop(spark, tmpdir_path):
    t, _ = _bootstrap(spark, tmpdir_path)
    ev = gen_change_events(spark, 200, 300, seed=5)
    apply_batch(t, ev, run_id="r1", epoch=0)
    v = t.current_version()
    res = apply_batch(t, ev, run_id="r1", epoch=0)
    assert res["skipped"]
    assert t.current_version() == v  # no new snapshot


def test_out_of_order_epochs_tombstone_protection(spark, tmpdir_path):
    """A delete at high LSN applied before an insert at lower LSN must win."""
    t, _ = _bootstrap(spark, tmpdir_path, n_base=0)
    ddl = ("lsn long, ts timestamp, op string, repo string, path string,"
           " commit string, lang string, content string, schema_change string")
    hi = spark.createDataFrame(
        [(100, None, "D", "o/r", "p", None, None, None, None)], ddl
    ).withColumn("ts", F.timestamp_seconds(F.lit(1_767_225_700)))
    lo = spark.createDataFrame(
        [(50, None, "I", "o/r", "p", "c", "py", "body", None)], ddl
    ).withColumn("ts", F.timestamp_seconds(F.lit(1_767_225_650)))
    apply_batch(t, hi, run_id="r", epoch=0)   # delete arrives first
    apply_batch(t, lo, run_id="r", epoch=1)   # stale insert afterwards
    assert t.read().count() == 0  # tombstone blocked resurrection


def test_lineage_written_per_partition(spark, tmpdir_path):
    t, _ = _bootstrap(spark, tmpdir_path)
    ev = gen_change_events(spark, 200, 400, seed=9)
    apply_batch(t, ev, run_id="lin", epoch=0)
    lin = read_lineage(t)
    assert len(lin) == 1
    rec = lin[0]
    assert rec["run_id"] == "lin" and rec["rows"] > 0 and rec["events_per_sec"] > 0
    # partition rows = SOURCE events read per partition (pre-dedup);
    # rec["rows"] = exact applied rows observed during the merge
    assert sum(p["rows"] for p in rec["partitions"]) >= rec["rows"]
    assert all(p["lsn_min"] <= p["lsn_max"] for p in rec["partitions"])


def test_merge_reads_only_affected_buckets(spark, tmpdir_path):
    """File pruning: a 1-key batch must not rewrite unrelated buckets."""
    t, _ = _bootstrap(spark, tmpdir_path, n_base=200, n_buckets=16)
    files_before = {f["path"] for f in t.files()}
    ddl = ("lsn long, ts timestamp, op string, repo string, path string,"
           " commit string, lang string, content string, schema_change string")
    one = spark.createDataFrame(
        [(10, None, "I", "zz/r", "newfile", "c", "py", "body", None)], ddl
    ).withColumn("ts", F.timestamp_seconds(F.lit(1_767_225_700)))
    res = apply_batch(t, one, run_id="r", epoch=0)
    assert len(res["buckets"]) == 1
    untouched = [f for f in t.files() if f["bucket"] != res["buckets"][0]]
    assert all(f["path"] in files_before for f in untouched)
