"""F4 type-parity: the reference's canonical 6-type fixture
(TestCopyFilterPlugin.scala:27-45 — boolean, string, long, double,
timestamp(ms), json) plus an all-null row, pushed through the fan-out
splitter into multiple sinks. Verifies the engine is type- and
null-faithful, mirroring reference tests 1 and 3."""

import datetime as dt
import os

from pyspark.sql import functions as F

from embulk_filter_copy_spark.cdc.replayer import replay_stream
from embulk_filter_copy_spark.cdc.splitter import SinkSpec
from embulk_filter_copy_spark.lake.table import LakeTable

TYPE_SCHEMA = [
    ("c0", "boolean"), ("c1", "string"), ("c2", "long"),
    ("c3", "double"), ("c4", "timestamp"), ("c5", "string"),
]
EV_DDL = (
    "lsn long, ts timestamp, op string, c0 boolean, c1 string, c2 long,"
    " c3 double, c4 timestamp, c5 string, schema_change string"
)

ROW1 = (True, "l1", 1, 1.11, dt.datetime(1970, 1, 1, 0, 0, 0, 5000), '{"a":5,"b":"x","c":{"y":"z"}}')
ROW2 = (None, "l2", None, None, None, None)


def _events(spark):
    base_ts = dt.datetime(2026, 1, 1)
    rows = [
        (1, base_ts, "I", *ROW1, None),
        (2, base_ts, "I", *ROW2, None),
    ]
    return spark.createDataFrame(rows, EV_DDL)


def _mk(spark, tmpdir_path, name, schema=None):
    path = os.path.join(tmpdir_path, name)
    LakeTable.create(spark, path, schema or TYPE_SCHEMA, key_columns=["c1"], n_buckets=2)
    return path


def test_all_six_types_and_nulls_roundtrip_two_sinks(spark, tmpdir_path):
    """Reference test 1: plain copy to 2 sinks, all values + nulls intact."""
    ev = _events(spark)
    log = os.path.join(tmpdir_path, "log")
    ev.coalesce(1).write.parquet(log)
    s1, s2 = _mk(spark, tmpdir_path, "s1"), _mk(spark, tmpdir_path, "s2")
    replay_stream(
        spark, log,
        [SinkSpec(name="s1", path=s1), SinkSpec(name="s2", path=s2)],
        checkpoint=os.path.join(tmpdir_path, "ck"),
        keys=("c1",), event_schema=EV_DDL,
    )
    for p in (s1, s2):
        got = {r["c1"]: r for r in LakeTable.load(spark, p).read().collect()}
        r1 = got["l1"]
        assert r1["c0"] is True
        assert r1["c2"] == 1 and isinstance(r1["c2"], int)
        assert abs(r1["c3"] - 1.11) < 1e-12
        assert r1["c4"] == ROW1[4]  # ms-precision timestamp preserved
        assert r1["c5"] == ROW1[5]  # canonical JSON text
        # JSON stays queryable
        tbl = LakeTable.load(spark, p).read()
        assert tbl.filter("c1 = 'l1'").select(
            F.get_json_object("c5", "$.c.y")).collect()[0][0] == "z"
        r2 = got["l2"]
        assert all(r2[c] is None for c in ("c0", "c2", "c3", "c4", "c5"))


def test_per_sink_projection_type_fixture(spark, tmpdir_path):
    """Reference test 3: sink A drops (c2, c3), sink B drops (c4, c5);
    each sink sees its own schema, values preserved for kept columns."""
    ev = _events(spark)
    log = os.path.join(tmpdir_path, "log")
    ev.coalesce(1).write.parquet(log)
    a_schema = [("c0", "boolean"), ("c1", "string"), ("c4", "timestamp"), ("c5", "string")]
    b_schema = [("c0", "boolean"), ("c1", "string"), ("c2", "long"), ("c3", "double")]
    sa = _mk(spark, tmpdir_path, "sa", a_schema)
    sb = _mk(spark, tmpdir_path, "sb", b_schema)
    replay_stream(
        spark, log,
        [
            SinkSpec(name="a", path=sa, transforms=(("drop", ["c2", "c3"]),)),
            SinkSpec(name="b", path=sb, transforms=(("drop", ["c4", "c5"]),)),
        ],
        checkpoint=os.path.join(tmpdir_path, "ck"),
        keys=("c1",), event_schema=EV_DDL,
    )
    a = LakeTable.load(spark, sa).read()
    b = LakeTable.load(spark, sb).read()
    assert a.columns == ["c0", "c1", "c4", "c5"]
    assert b.columns == ["c0", "c1", "c2", "c3"]
    ra = {r["c1"]: r for r in a.collect()}
    rb = {r["c1"]: r for r in b.collect()}
    assert ra["l1"]["c4"] == ROW1[4] and ra["l1"]["c5"] == ROW1[5]
    assert rb["l1"]["c2"] == 1 and abs(rb["l1"]["c3"] - 1.11) < 1e-12
