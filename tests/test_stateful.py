"""applyInPandasWithState operator: state accumulates across microbatches
AND across restarts (checkpointed state store)."""

import os

from pyspark.sql import functions as F

from embulk_filter_copy_spark.cdc.replayer import event_struct
from embulk_filter_copy_spark.fixtures import gen_change_events
from embulk_filter_copy_spark.streaming.stateful import repo_change_stats


def _run(spark, wal, ckpt):
    """Run the stream to completion, returning every emitted row (the memory
    sink cannot recover from a checkpoint; foreachBatch can)."""
    rows = []
    stream = spark.readStream.schema(event_struct()).parquet(wal)
    q = (
        repo_change_stats(stream)
        .writeStream.foreachBatch(lambda df, eid: rows.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rows


def test_state_accumulates_across_restarts(spark, tmp_path):
    wal = os.path.join(str(tmp_path), "wal")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    ev = gen_change_events(spark, 50, 400, seed=7).cache()
    half1 = ev.filter(F.col("lsn") <= 200)
    half2 = ev.filter(F.col("lsn") > 200)
    half1.write.mode("append").parquet(wal)
    run1 = _run(spark, wal, ckpt)

    # restart with more WAL files: the second run must see ONLY the delta but
    # the emitted totals must include run 1's events (state survived)
    half2.write.mode("append").parquet(wal)
    run2 = _run(spark, wal, ckpt)
    assert run1 and run2

    # latest emission per repo across both runs = full-log totals
    latest = {}
    for r in run1 + run2:
        if r["lsn_max"] is not None:
            prev = latest.get(r["repo"])
            if prev is None or r["lsn_max"] >= prev["lsn_max"]:
                latest[r["repo"]] = r

    expected = (
        ev.filter(F.col("op") != "S")
        .groupBy("repo")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("lsn").alias("lo"),
            F.max("lsn").alias("hi"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("d"),
        )
        .collect()
    )
    for e in expected:
        got = latest[e["repo"]]
        assert got["n_events"] == e["n"], (e["repo"], got["n_events"], e["n"])
        assert got["lsn_min"] == e["lo"] and got["lsn_max"] == e["hi"]
        assert got["n_deletes"] == e["d"]
        assert got["n_upserts"] + got["n_deletes"] == got["n_events"]
    ev.unpersist()
