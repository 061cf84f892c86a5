"""Sharded-WAL multiplexer: total-order restamp, lineage, replay parity."""

import os

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from embulk_filter_copy_spark.cdc.replayer import replay_batch
from embulk_filter_copy_spark.cdc.shards import merge_wal_shards
from embulk_filter_copy_spark.fixtures import (
    REPO_FILES_SCHEMA,
    gen_change_events,
    gen_repo_files,
)
from embulk_filter_copy_spark.lake.table import LakeTable


def test_restamp_is_total_order_preserving_and_reversible(spark):
    a = spark.createDataFrame([(1, "a"), (2, "b"), (10**9, "c")], "lsn long, v string")
    b = spark.createDataFrame([(17, "x"), (18, "y")], "lsn long, v string")
    m = merge_wal_shards({"alpha": a, "beta": b})
    rows = m.collect()
    # distinct global lsns, one per input row
    assert len({r["lsn"] for r in rows}) == 5
    # per-shard order preserved under the restamp
    for shard in (0, 1):
        ours = sorted((r["_src_lsn"], r["lsn"]) for r in rows if r["_shard"] == shard)
        assert [x[1] for x in ours] == sorted(x[1] for x in ours)
    # lineage reverses the restamp; names follow sorted order (alpha=0)
    for r in rows:
        assert r["lsn"] == r["_src_lsn"] * 2 + r["_shard"]
        assert r["_shard_name"] == ("alpha" if r["_shard"] == 0 else "beta")


def test_sharded_replay_matches_unsharded(spark, tmpdir_path):
    """Split one WAL into 3 hash shards, renumber each shard's LSNs densely
    from 1 (its own domain), merge, replay in epochs — the final table must
    equal replaying the ORIGINAL unsharded log."""
    base = gen_repo_files(spark, 60, seed=8)
    ev = gen_change_events(spark, 60, 300, seed=8).localCheckpoint(eager=True)

    def mk(name):
        t = LakeTable.create(
            spark, os.path.join(tmpdir_path, name), REPO_FILES_SCHEMA,
            key_columns=["repo", "path"], n_buckets=8,
        )
        t.append(base.withColumn("_lsn", F.lit(0)))
        return t

    # shard by key hash (the upstream contract: a key lives on ONE shard);
    # per-shard dense renumbering destroys the global domain on purpose —
    # shard 2's lsn=5 must not be comparable to shard 0's lsn=5 pre-restamp
    shard = F.pmod(F.xxhash64("repo", "path"), F.lit(3))
    sharded = ev.withColumn("_s", shard)
    shards = []
    for i in range(3):
        s = sharded.filter(F.col("_s") == i).drop("_s")
        s = s.withColumn(
            "lsn", F.row_number().over(W.orderBy("lsn")).cast("long")
        )
        shards.append(s)

    t_sharded = mk("sharded")
    replay_batch(spark, merge_wal_shards(shards), t_sharded, run_id="sh", n_epochs=3)
    t_plain = mk("plain")
    replay_batch(spark, ev, t_plain, run_id="pl", n_epochs=3)

    a = sorted(tuple(r) for r in t_sharded.read().collect())
    b = sorted(tuple(r) for r in t_plain.read().collect())
    assert a == b and len(a) > 0


def test_lineage_columns_never_reach_the_sink_schema(spark, tmpdir_path):
    base = gen_repo_files(spark, 20, seed=9)
    ev = gen_change_events(spark, 20, 40, seed=9)
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), REPO_FILES_SCHEMA,
        key_columns=["repo", "path"], n_buckets=4,
    )
    t.append(base.withColumn("_lsn", F.lit(0)))
    replay_batch(spark, merge_wal_shards([ev]), t, run_id="one", n_epochs=1)
    assert "_shard" not in t.read().columns
    assert "_src_lsn" not in t.read().columns
