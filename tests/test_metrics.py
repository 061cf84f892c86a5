"""Streaming observability: listener progress records + observed metrics."""

import os

from embulk_filter_copy_spark.cdc.replayer import replay_stream
from embulk_filter_copy_spark.fixtures import REPO_FILES_SCHEMA, gen_change_events, gen_repo_files
from embulk_filter_copy_spark.lake.table import LakeTable
from embulk_filter_copy_spark.streaming.metrics import ProgressRecorder

from pyspark.sql import functions as F


def test_progress_recorder_and_observed_metrics(spark, tmpdir_path):
    base = gen_repo_files(spark, 60, seed=2)
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "tbl"), REPO_FILES_SCHEMA,
        key_columns=["repo", "path"], n_buckets=4,
    )
    t.append(base.withColumn("_lsn", F.lit(0)))
    ev = gen_change_events(spark, 60, 200, seed=2)
    log = os.path.join(tmpdir_path, "log")
    ev.coalesce(2).write.parquet(log)
    pdir = os.path.join(tmpdir_path, "progress")
    replay_stream(
        spark, log, os.path.join(tmpdir_path, "tbl"),
        checkpoint=os.path.join(tmpdir_path, "ck"),
        max_files_per_trigger=1,
        progress_dir=pdir,
    )
    import time

    expected = ev.count()
    progress = []
    for _ in range(30):  # listener delivery is async — poll up to 15 s
        recs = ProgressRecorder(pdir).records()
        progress = [r for r in recs if r["event"] == "progress" and r["numInputRows"] > 0]
        if sum(r["numInputRows"] for r in progress) >= expected:
            break
        time.sleep(0.5)
    assert len(progress) >= 2  # one per microbatch
    assert sum(r["numInputRows"] for r in progress) == expected
    m = progress[0]["observedMetrics"].get("cdc_metrics")
    assert m and m["rows"] > 0 and m["lsn_min"] <= m["lsn_max"]
    assert any(r["event"] == "started" for r in recs)
