"""Complex (array/struct/map) columns as first-class lake-table citizens:
schema round-trip, merge semantics, and change-feed emission.

Reference parity: the JSON column type carries arbitrary nested values
(CopyColumnVisitor.scala:53-56, msgpack nil/array/map)."""

import os

import pytest
from pyspark.sql import functions as F

from embulk_filter_copy_spark.cdc.apply import apply_batch
from embulk_filter_copy_spark.lake.schema import TableSchema, spark_type
from embulk_filter_copy_spark.lake.table import LakeTable


def test_spark_type_parses_complex_ddl():
    assert spark_type("array<float>").simpleString() == "array<float>"
    assert spark_type("struct<a:int,b:string>").simpleString() == "struct<a:int,b:string>"
    assert spark_type("map<string,long>").simpleString() == "map<string,bigint>"
    assert spark_type("array<struct<x:double,y:double>>").simpleString() == \
        "array<struct<x:double,y:double>>"
    with pytest.raises(ValueError):
        spark_type("definitely_not_a_type<")


def test_schema_json_roundtrip_with_complex_types():
    s = TableSchema.from_pairs(
        [("k", "long"), ("emb", "array<float>"), ("meta", "struct<w:int,h:int>")]
    )
    back = TableSchema.from_json(s.to_json())
    assert back == s
    assert TableSchema.from_struct(s.to_struct()).to_struct() == s.to_struct()


def test_merge_upsert_delete_array_column(spark, tmpdir_path):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "emb"),
        [("k", "long"), ("emb", "array<float>"), ("meta", "struct<w:int,h:int>")],
        key_columns=["k"], n_buckets=4,
    )
    rows = [(1, [1.0, 2.0], (3, 4)), (2, [5.0], (6, 7))]
    df = spark.createDataFrame(rows, "k long, emb array<float>, meta struct<w:int,h:int>")
    t.append(df.withColumn("_lsn", F.lit(0)))

    ev = spark.createDataFrame(
        [(10, "U", 1, [9.0, 9.0], (1, 1)), (11, "D", 2, None, None)],
        "lsn long, op string, k long, emb array<float>, meta struct<w:int,h:int>",
    ).withColumn("ts", F.timestamp_micros("lsn"))
    res = apply_batch(t, ev, run_id="cx", epoch=0)
    assert res["rows_applied"] == 2
    got = {r["k"]: r for r in t.read().collect()}
    assert list(got) == [1]
    assert got[1]["emb"] == [9.0, 9.0] and got[1]["meta"]["w"] == 1


def test_read_changes_carries_complex_columns(spark, tmpdir_path):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "feed"),
        [("k", "long"), ("emb", "array<float>")], key_columns=["k"], n_buckets=2,
    )
    v0 = t.current_version()
    t.append(
        spark.createDataFrame([(1, [0.5, 0.5])], "k long, emb array<float>")
        .withColumn("_lsn", F.lit(7)),
        commit={"run_id": "r", "epoch": 0, "seq": -1, "lsn_min": 7, "lsn_max": 7},
    )
    feed = t.read_changes(since_version=v0).collect()
    assert len(feed) == 1 and feed[0]["op"] == "U" and feed[0]["emb"] == [0.5, 0.5]
