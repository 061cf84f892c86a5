"""Partial-column patch updates (op='P'): the per-key fold and the
patch-aware merge. Reference contrast: the reference forwards whole pages
verbatim (CopyFilterPlugin.scala:70-79 passes records unchanged); partial
images are a capability of the generalized CDC engine, modeled on Debezium
partial row images / MongoDB update ops."""

import pytest
from pyspark.sql import functions as F

from embulk_filter_copy_spark.cdc.apply import apply_batch
from embulk_filter_copy_spark.cdc.dedup import dedup_events, fold_patches
from embulk_filter_copy_spark.lake.table import LakeTable

SCHEMA = "k string, lsn long, op string, a string, b string, ts timestamp"


def _fold(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r["k"]: r for r in fold_patches(df, keys=("k",)).collect()}


def test_patches_after_full_image_override_per_column(spark):
    out = _fold(spark, [
        ("k", 1, "U", "a1", "b1", None),
        ("k", 2, "P", "a2", None, None),   # patches a only
        ("k", 3, "P", None, "b3", None),   # patches b only
    ])["k"]
    # BOTH patches apply — plain LWW would have kept only lsn 3's columns
    assert (out["a"], out["b"]) == ("a2", "b3")
    assert out["op"] == "U" and out["lsn"] == 3


def test_patch_superseded_by_later_full_image(spark):
    out = _fold(spark, [
        ("k", 1, "P", "old", None, None),
        ("k", 2, "U", "new", "b2", None),
    ])["k"]
    assert (out["a"], out["b"]) == ("new", "b2") and out["lsn"] == 2


def test_patch_after_delete_is_dropped(spark):
    out = _fold(spark, [
        ("k", 1, "U", "a1", "b1", None),
        ("k", 2, "D", None, None, None),
        ("k", 3, "P", "zombie", None, None),
    ])["k"]
    assert out["op"] == "D" and out["lsn"] == 2
    assert out["a"] is None and out["b"] is None


def test_patch_only_key_keeps_patch_op(spark):
    out = _fold(spark, [
        ("k", 5, "P", None, "b5", None),
        ("k", 6, "P", None, "b6", None),
    ])["k"]
    assert out["op"] == "P" and out["lsn"] == 6
    assert out["a"] is None and out["b"] == "b6"


def test_fold_collapses_transport_duplicates(spark):
    out = _fold(spark, [
        ("k", 1, "U", "a1", "b1", None),
        ("k", 1, "U", "a1", "b1", None),  # identical re-delivery
        ("k", 2, "P", "a2", None, None),
        ("k", 2, "P", "a2", None, None),
    ])["k"]
    assert (out["a"], out["b"], out["lsn"]) == ("a2", "b1", 2)


@pytest.fixture()
def patch_table(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"),
        [("k", "string"), ("a", "string"), ("b", "string")],
        key_columns=["k"], n_buckets=4,
    )
    t.append(
        spark.createDataFrame(
            [("k1", "a0", "b0"), ("k2", "x0", "y0")], "k string, a string, b string"
        ).withColumn("_lsn", F.lit(10))
    )
    return t


def test_merge_patch_only_key_coalesces_with_target(spark, patch_table):
    batch = spark.createDataFrame([("k1", 11, "P", None, "bNEW", None)], SCHEMA)
    apply_batch(patch_table, batch, run_id="r", epoch=0, dedup="patch")
    rows = {r["k"]: r for r in patch_table.read().collect()}
    # patched column updated, unpatched column PRESERVED (full-image merge
    # would have nulled a)
    assert (rows["k1"]["a"], rows["k1"]["b"]) == ("a0", "bNEW")
    assert (rows["k2"]["a"], rows["k2"]["b"]) == ("x0", "y0")
    meta = {r["k"]: r for r in patch_table.read(include_meta=True).collect()}
    assert meta["k1"]["_lsn"] == 11


def test_merge_patch_cannot_create_or_resurrect(spark, patch_table):
    # delete k2, then patch it and patch a key that never existed
    apply_batch(
        patch_table,
        spark.createDataFrame([("k2", 11, "D", None, None, None)], SCHEMA),
        run_id="r", epoch=0,
    )
    batch = spark.createDataFrame(
        [("k2", 12, "P", "back?", None, None), ("k9", 12, "P", "new?", None, None)], SCHEMA
    )
    apply_batch(patch_table, batch, run_id="r", epoch=1, dedup="patch")
    keys = {r["k"] for r in patch_table.read().collect()}
    assert keys == {"k1"}  # k2 stays deleted, k9 never materializes


def test_merge_stale_patch_loses_to_lsn_guard(spark, patch_table):
    batch = spark.createDataFrame([("k1", 5, "P", None, "stale", None)], SCHEMA)
    apply_batch(patch_table, batch, run_id="r", epoch=0, dedup="patch")
    rows = {r["k"]: r for r in patch_table.read().collect()}
    assert rows["k1"]["b"] == "b0"  # lsn 5 < table _lsn 10 -> guard wins


def test_patch_full_mix_end_to_end(spark, patch_table):
    batch = spark.createDataFrame([
        ("k1", 11, "U", "a1", "b1", None),
        ("k1", 12, "P", None, "b2", None),
        ("k2", 11, "P", "xP", None, None),
        ("k3", 11, "I", "n1", "n2", None),
        ("k3", 12, "P", "n1P", None, None),
    ], SCHEMA)
    apply_batch(patch_table, batch, run_id="r", epoch=0, dedup="patch")
    rows = {r["k"]: r for r in patch_table.read().collect()}
    assert (rows["k1"]["a"], rows["k1"]["b"]) == ("a1", "b2")
    assert (rows["k2"]["a"], rows["k2"]["b"]) == ("xP", "y0")
    assert (rows["k3"]["a"], rows["k3"]["b"]) == ("n1P", "n2")


def test_patch_requires_cow(spark, patch_table):
    batch = spark.createDataFrame([("k1", 11, "P", None, "b", None)], SCHEMA)
    with pytest.raises(ValueError, match="patch"):
        apply_batch(
            patch_table, batch, run_id="r", epoch=0, dedup="patch",
            merge_mode="mor",
        )


def test_dedup_events_dispatches_patch(spark):
    df = spark.createDataFrame(
        [("k", 1, "U", "a1", "b1", None), ("k", 2, "P", None, "b2", None)], SCHEMA
    )
    out = dedup_events(df, "patch", keys=("k",)).collect()
    assert len(out) == 1 and out[0]["b"] == "b2" and out[0]["a"] == "a1"


# --- streaming: patch fold through the fan-out replay path ---------------

import os

from embulk_filter_copy_spark.cdc.replayer import replay_stream
from embulk_filter_copy_spark.cdc.splitter import SinkSpec

EV_DDL = ("lsn long, ts timestamp, op string, k string, a string, b string,"
          " schema_change string")


def _mk_table(spark, path, rows):
    t = LakeTable.create(
        spark, path, [("k", "string"), ("a", "string"), ("b", "string")],
        key_columns=["k"], n_buckets=4,
    )
    t.append(
        spark.createDataFrame(rows, "k string, a string, b string")
        .withColumn("_lsn", F.lit(0))
    )
    return t


def test_streaming_patch_replay(spark, tmpdir_path):
    t = _mk_table(spark, os.path.join(tmpdir_path, "tbl"),
                  [("k1", "a0", "b0"), ("k2", "x0", "y0")])
    ev = spark.createDataFrame([
        (1, None, "P", "k1", None, "b1", None),   # patch b
        (2, None, "U", "k2", "x2", "y2", None),   # full image
        (3, None, "P", "k1", "a3", None, None),   # patch a
        (4, None, "P", "k2", None, "yP", None),   # patch after full image
    ], EV_DDL)
    # two chunks -> two epochs: patches land in different epochs than their
    # base images, so merge-time target resolution is exercised, not just
    # the in-batch fold
    ev.filter("lsn <= 2").coalesce(1).write.mode("append").parquet(
        os.path.join(tmpdir_path, "log"))
    ev.filter("lsn > 2").coalesce(1).write.mode("append").parquet(
        os.path.join(tmpdir_path, "log"))
    replay_stream(
        spark, os.path.join(tmpdir_path, "log"),
        os.path.join(tmpdir_path, "tbl"),
        checkpoint=os.path.join(tmpdir_path, "ckpt"),
        keys=("k",), dedup="patch", max_files_per_trigger=1,
        event_schema=EV_DDL,
    )
    rows = {r["k"]: r for r in t.read().collect()}
    assert (rows["k1"]["a"], rows["k1"]["b"]) == ("a3", "b1")
    assert (rows["k2"]["a"], rows["k2"]["b"]) == ("x2", "yP")


def test_streaming_patch_shared_fanout(spark, tmpdir_path):
    """Two projection-only sinks share ONE patch fold; each leaf gets its
    column subset with both patches applied."""
    ta = _mk_table(spark, os.path.join(tmpdir_path, "ta"), [("k1", "a0", "b0")])
    tb = _mk_table(spark, os.path.join(tmpdir_path, "tb"), [("k1", "a0", "b0")])
    ev = spark.createDataFrame([
        (1, None, "U", "k1", "a1", "b1", None),
        (2, None, "P", "k1", None, "b2", None),
        (3, None, "P", "k1", "a3", None, None),
    ], EV_DDL)
    ev.coalesce(1).write.mode("append").parquet(os.path.join(tmpdir_path, "log"))
    sinks = SinkSpec(name="root", children=(
        SinkSpec(name="a", path=os.path.join(tmpdir_path, "ta")),
        SinkSpec(name="b", path=os.path.join(tmpdir_path, "tb")),
    ))
    replay_stream(
        spark, os.path.join(tmpdir_path, "log"), sinks,
        checkpoint=os.path.join(tmpdir_path, "ckpt"),
        keys=("k",), dedup="patch", event_schema=EV_DDL,
    )
    for t in (ta, tb):
        row = {r["k"]: r for r in t.read().collect()}["k1"]
        assert (row["a"], row["b"]) == ("a3", "b2")


def test_streaming_patch_guards(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "t")
    _mk_table(spark, path, [("k1", "a0", "b0")])
    with pytest.raises(ValueError, match="cow"):
        replay_stream(spark, os.path.join(tmpdir_path, "log"),
                      path, checkpoint=os.path.join(tmpdir_path, "ck1"),
                      keys=("k",), dedup="patch", merge_mode="mor")
    with pytest.raises(ValueError, match="history"):
        replay_stream(spark, os.path.join(tmpdir_path, "log"),
                      SinkSpec(name="h", path=path, mode="history"),
                      checkpoint=os.path.join(tmpdir_path, "ck2"),
                      keys=("k",), dedup="patch")
    with pytest.raises(ValueError, match="with_column"):
        replay_stream(
            spark, os.path.join(tmpdir_path, "log"),
            SinkSpec(name="w", path=path,
                     transforms=(("with_column", "c", "upper(a)"),)),
            checkpoint=os.path.join(tmpdir_path, "ck3"),
            keys=("k",), dedup="patch")


def test_patch_fold_across_mid_batch_ddl(spark, tmpdir_path):
    """A column-add DDL mid-batch with dedup='patch': sub-units on each
    side of the DDL fold independently; a patch on the NEW column applies
    after the DDL, and a pre-DDL patch on an old column survives (the
    post-DDL full-image semantics would have nulled nothing — patches
    resolve per column against the evolving target)."""
    import json
    import os

    from embulk_filter_copy_spark.lake.table import LakeTable

    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"),
        [("k", "string"), ("a", "string")], key_columns=["k"], n_buckets=2,
    )
    t.append(
        spark.createDataFrame([("k1", "a0")], "k string, a string")
        .withColumn("_lsn", F.lit(1))
    )
    ddl = "k string, lsn long, op string, a string, b string, ts timestamp, schema_change string"
    batch = spark.createDataFrame([
        ("k1", 2, "P", "aP", None, None, None),                     # pre-DDL patch
        (None, 3, "S", None, None, None,
         json.dumps({"action": "add", "column": "b", "type": "string"})),
        ("k1", 4, "P", None, "bNEW", None, None),                   # patches the NEW column
    ], ddl)
    apply_batch(t, batch, run_id="r", epoch=0, dedup="patch")
    row = t.read().collect()[0]
    assert (row["a"], row["b"]) == ("aP", "bNEW")
