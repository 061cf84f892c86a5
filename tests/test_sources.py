"""F5 source parity: typed TSV read mirroring the reference's example config
(example/config.yml:1-15 — declared columns, null_string '', timestamp
format, strict mode) and the sink registry."""

import os

from embulk_filter_copy_spark.sources import read_csv_typed, write_sink

COLUMNS = [
    ("id", "long"),
    ("description", "string"),
    ("name", "string"),
    ("t", "timestamp"),
    ("payload", "string"),
]

TSV = (
    "0\tdesc0\tname0\t2017-09-30 10:00:00 +0900\t{\"a\":1}\n"
    "1\tdesc1\t\t2017-09-30 11:00:00 +0900\t{\"a\":2}\n"
)


def test_read_tsv_typed_nulls_and_timestamps(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "data.tsv")
    with open(p, "w") as f:
        f.write(TSV)
    df = read_csv_typed(spark, p, COLUMNS, delimiter="\t", null_string="")
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == 2
    assert rows[1]["name"] is None  # null_string '' → NULL (example parity)
    assert rows[0]["t"].hour == 1  # 10:00 +0900 → 01:00 UTC
    assert rows[0]["payload"] == '{"a":1}'
    assert dict(df.dtypes)["id"] == "bigint"


def test_write_sink_registry(spark, tmpdir_path):
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    out = os.path.join(tmpdir_path, "out.parquet")
    write_sink(df, "parquet", out)
    assert spark.read.parquet(out).count() == 1
    write_sink(df, "noop")
    write_sink(df, "stdout")
    try:
        write_sink(df, "bogus")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
