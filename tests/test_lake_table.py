import os

import pytest
from pyspark.sql import functions as F

from embulk_filter_copy_spark.lake import CommitConflict, LakeTable, TableSchema


SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]


def make_table(spark, tmpdir_path, n_buckets=4):
    return LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), SCHEMA,
        key_columns=["repo", "path"], n_buckets=n_buckets,
    )


def test_create_and_empty_read(spark, tmpdir_path):
    t = make_table(spark, tmpdir_path)
    df = t.read()
    assert df.columns == ["repo", "path", "commit", "lang", "content"]
    assert df.count() == 0


def test_append_and_read(spark, tmpdir_path):
    t = make_table(spark, tmpdir_path)
    df = spark.createDataFrame(
        [("a/r", "f1", "c1", "py", "x"), ("a/r", "f2", "c2", "go", None)],
        "repo string, path string, commit string, lang string, content string",
    )
    res = t.append(df)
    assert res["rows"] == 2
    got = t.read().orderBy("path").collect()
    assert [r["path"] for r in got] == ["f1", "f2"]
    assert got[1]["content"] is None


def test_bucket_pruning_reads_subset_of_files(spark, tmpdir_path):
    t = make_table(spark, tmpdir_path, n_buckets=8)
    rows = [(f"o/r{i}", f"p{i}", "c", "py", "x") for i in range(50)]
    t.append(spark.createDataFrame(rows, "repo string, path string, commit string, lang string, content string"))
    all_files = t.files()
    some_bucket = all_files[0]["bucket"]
    pruned = t.files(buckets=[some_bucket])
    assert 0 < len(pruned) < len(all_files)
    got = t.read(buckets=[some_bucket])
    # every row read must actually hash to the pruned bucket
    chk = got.withColumn("_b", t.bucket_expr()).filter(F.col("_b") != some_bucket).count()
    assert chk == 0


def test_snapshot_isolation_and_versions(spark, tmpdir_path):
    t = make_table(spark, tmpdir_path)
    assert t.current_version() == 1
    t.append(spark.createDataFrame([("a", "b", "c", "py", "x")], "repo string, path string, commit string, lang string, content string"))
    assert t.current_version() == 2
    snap = t.snapshot()
    assert snap["parent"] == 1 and len(snap["files"]) >= 1


def test_commit_conflict_on_same_version(spark, tmpdir_path):
    t = make_table(spark, tmpdir_path)
    snap_a = t._next_snapshot()
    snap_b = t._next_snapshot()
    t._write_snapshot(snap_a)
    with pytest.raises(CommitConflict):
        t._write_snapshot(snap_b)


def test_commit_manifest_atomic_with_data(spark, tmpdir_path):
    t = make_table(spark, tmpdir_path)
    df = spark.createDataFrame([("a", "b", "c", "py", "x")], "repo string, path string, commit string, lang string, content string")
    t.append(df, commit={"run_id": "r1", "epoch": 0, "seq": -1, "rows_applied": 1})
    assert t.has_commit("r1", 0, -1)
    assert not t.has_commit("r1", 1, -1)
    assert not t.has_commit("r2", 0, -1)


def test_replace_buckets_copy_on_write(spark, tmpdir_path):
    t = make_table(spark, tmpdir_path, n_buckets=4)
    rows = [(f"o/r{i}", f"p{i}", "c", "py", "old") for i in range(40)]
    ddl = "repo string, path string, commit string, lang string, content string"
    t.append(spark.createDataFrame(rows, ddl))
    before = {f["path"]: f for f in t.files()}
    # rewrite one bucket with new content
    b = t.files()[0]["bucket"]
    repl = t.read(buckets=[b]).withColumn("content", F.lit("new"))
    t.replace_buckets([b], repl)
    after = t.files()
    untouched = [f for f in after if f["bucket"] != b]
    assert all(f["path"] in before for f in untouched)  # other buckets unchanged
    assert t.read().filter("content = 'new'").count() == t.read(buckets=[b]).count()


def test_schema_evolution_add_rename_widen(spark, tmpdir_path):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t2"),
        SCHEMA + [("score", "int")], key_columns=["repo", "path"], n_buckets=2,
    )
    ddl = "repo string, path string, commit string, lang string, content string, score int"
    t.append(spark.createDataFrame([("a", "b", "c", "py", "x", 5)], ddl))
    # add
    assert t.update_schema({"action": "add", "column": "stars", "type": "long"}, schema_lsn=10)
    got = t.read().collect()[0]
    assert got["stars"] is None and got["score"] == 5
    # idempotent re-apply (same lsn) is a no-op
    assert not t.update_schema({"action": "add", "column": "stars", "type": "long"}, schema_lsn=10)
    # rename: old files resolve by field id
    assert t.update_schema({"action": "rename", "from": "score", "to": "points"}, schema_lsn=11)
    got = t.read().collect()[0]
    assert got["points"] == 5
    assert "score" not in t.read().columns
    # widen int -> double: cast-on-read for old files
    assert t.update_schema({"action": "widen", "column": "points", "to": "double"}, schema_lsn=12)
    got = t.read().collect()[0]
    assert got["points"] == 5.0 and isinstance(got["points"], float)
    # new writes under the new schema coexist with old files
    t.append(spark.createDataFrame(
        [("a", "b2", "c", "py", "x", 2.5, 7)],
        "repo string, path string, commit string, lang string, content string, points double, stars long",
    ))
    vals = {r["path"]: r["points"] for r in t.read().collect()}
    assert vals == {"b": 5.0, "b2": 2.5}


def test_tombstones_hidden_from_logical_read(spark, tmpdir_path):
    t = make_table(spark, tmpdir_path)
    ddl = "repo string, path string, commit string, lang string, content string, _lsn long, _deleted boolean"
    df = spark.createDataFrame(
        [("a", "live", "c", "py", "x", 1, False), ("a", "dead", "c", "py", "x", 2, True)], ddl
    )
    t.append(df)
    assert t.read().count() == 1
    assert t.read(include_meta=True).count() == 2
