"""M4: transactional schema evolution sequenced inside the replay."""

import os

from pyspark.sql import functions as F

from embulk_filter_copy_spark.cdc.apply import apply_batch
from embulk_filter_copy_spark.cdc.replayer import replay_stream
from embulk_filter_copy_spark.fixtures import (
    REPO_FILES_SCHEMA,
    gen_change_events,
    gen_repo_files,
    replay_oracle,
)
from embulk_filter_copy_spark.lake.table import LakeTable


def _bootstrap(spark, tmpdir_path, n_base=80, seed=42):
    base = gen_repo_files(spark, n_base, seed=seed)
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "tbl"), REPO_FILES_SCHEMA,
        key_columns=["repo", "path"], n_buckets=4,
    )
    t.append(base.withColumn("_lsn", F.lit(0)))
    return t, base


def test_schema_change_within_one_batch(spark, tmpdir_path):
    """add-column S event in the middle of a batch: DDL lands between the
    merges; final data parity with the oracle."""
    t, base = _bootstrap(spark, tmpdir_path, seed=3)
    ev = gen_change_events(
        spark, 80, 400, seed=3,
        schema_changes=[(200, {"action": "add", "column": "stars", "type": "long"})],
    )
    apply_batch(t, ev, run_id="se", epoch=0)
    assert "stars" in t.read().columns
    golden = replay_oracle(base.toPandas(), ev.toPandas())
    got = t.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert list(got.columns) == list(golden.columns)
    assert got[["repo", "path", "content"]].equals(
        golden[["repo", "path", "content"]].reset_index(drop=True))
    assert got["stars"].isna().all()
    # multiple sub-units → per-seq manifests + epoch-done marker
    seqs = {(c["epoch"], c["seq"]) for c in t.commits() if c["run_id"] == "se"}
    assert (0, -1) in seqs and len(seqs) >= 2


def test_schema_changes_streaming_add_rename_widen(spark, tmpdir_path):
    t, base = _bootstrap(spark, tmpdir_path, seed=7)
    changes = [
        (100, {"action": "add", "column": "score", "type": "int"}),
        (200, {"action": "rename", "from": "score", "to": "points"}),
        (300, {"action": "widen", "column": "points", "to": "double"}),
    ]
    ev = gen_change_events(spark, 80, 500, seed=7, schema_changes=changes)
    log = os.path.join(tmpdir_path, "log")
    ev.coalesce(2).write.parquet(log)
    replay_stream(spark, log, os.path.join(tmpdir_path, "tbl"),
                  checkpoint=os.path.join(tmpdir_path, "ck"))
    got = t.read()
    assert "points" in got.columns and "score" not in got.columns
    assert dict(got.dtypes)["points"] == "double"
    golden = replay_oracle(base.toPandas(), ev.toPandas())
    gp = got.toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert len(gp) == len(golden)
    assert gp[["repo", "path", "content", "commit"]].equals(
        golden[["repo", "path", "content", "commit"]].reset_index(drop=True))


def test_ddl_idempotent_on_epoch_replay(spark, tmpdir_path):
    t, _ = _bootstrap(spark, tmpdir_path, seed=5)
    ev = gen_change_events(
        spark, 80, 200, seed=5,
        schema_changes=[(100, {"action": "add", "column": "x", "type": "long"})],
    )
    apply_batch(t, ev, run_id="r", epoch=0)
    sv = t.snapshot()["schema_version"]
    apply_batch(t, ev, run_id="r", epoch=0)  # full replay → everything skipped
    assert t.snapshot()["schema_version"] == sv


def test_drop_column_id_semantics(spark, tmpdir_path):
    """Drop + re-add with the same NAME: the new field gets a fresh id, so
    old files' values never resurrect under it (Iceberg drop semantics).
    Time travel below the drop still sees the column."""
    import pytest

    from embulk_filter_copy_spark.lake.schema import SchemaEvolutionError

    t, base = _bootstrap(spark, tmpdir_path, seed=5)
    v_before = t.current_version()
    assert t.read().filter(F.col("lang").isNotNull()).count() > 0

    assert t.update_schema({"action": "drop", "column": "lang"}, schema_lsn=50)
    assert "lang" not in t.read().columns
    assert "lang" in t.read(version=v_before).columns  # time travel intact

    # merges keep working; event rows still carrying `lang` are projected off
    ev = gen_change_events(spark, 80, 100, seed=5)
    apply_batch(t, ev, run_id="drop", epoch=0)
    assert "lang" not in t.read().columns

    # re-add the NAME: fresh field id — every row reads NULL, nothing
    # resurrects from the old physical column still present in files
    assert t.update_schema({"action": "add", "column": "lang", "type": "string"}, schema_lsn=60)
    assert t.read().filter(F.col("lang").isNotNull()).count() == 0

    # identity/placement columns are protected
    with pytest.raises(SchemaEvolutionError, match="key/bucket"):
        t.update_schema({"action": "drop", "column": "repo"}, schema_lsn=70)


def test_drop_column_mid_batch_ddl(spark, tmpdir_path):
    """op='S' drop event sequenced inside a batch: rows after the DDL land
    without the column; the final read carries the post-drop schema."""
    t, base = _bootstrap(spark, tmpdir_path, seed=9)
    ev = gen_change_events(
        spark, 80, 300, seed=9,
        schema_changes=[(150, {"action": "drop", "column": "lang"})],
    )
    apply_batch(t, ev, run_id="sed", epoch=0)
    got = t.read()
    assert "lang" not in got.columns
    # data parity on the surviving columns vs the golden replayer
    golden = replay_oracle(base.toPandas(), ev.toPandas())
    gp = got.toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert len(gp) == len(golden)
    assert gp[["repo", "path", "content"]].equals(
        golden[["repo", "path", "content"]].reset_index(drop=True))
