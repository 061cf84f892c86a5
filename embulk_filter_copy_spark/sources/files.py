"""File sources with the reference's outer-pipeline parser semantics.

The reference's example config (example/config.yml:1-15) reads TSV with an
explicitly typed column list, a ``null_string`` marker, a timestamp format
and strict error handling — all of which map 1:1 onto Spark's CSV reader
options (schema declared, no inference, FAILFAST), so the parser stays
JVM-side and the scan supports predicate pushdown after parsing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_filter_copy_spark.lake.schema import spark_type


def _struct(columns: list[tuple[str, str]]) -> T.StructType:
    return T.StructType([T.StructField(n, spark_type(t), True) for n, t in columns])


def read_csv_typed(
    spark: SparkSession,
    path: str,
    columns: list[tuple[str, str]],
    delimiter: str = "\t",
    header: bool = False,
    null_string: str = "",
    timestamp_format: str = "yyyy-MM-dd HH:mm:ss X",
    strict: bool = True,
) -> DataFrame:
    """Typed CSV/TSV source (reference example/config.yml parity: declared
    schema, null_string, timestamp format, strict mode — no inference)."""
    return (
        spark.read.schema(_struct(columns))
        .options(
            sep=delimiter,
            header=str(header).lower(),
            nullValue=null_string,
            timestampFormat=timestamp_format,
            mode="FAILFAST" if strict else "PERMISSIVE",
        )
        .csv(path)
    )


def read_json_typed(
    spark: SparkSession, path: str, columns: list[tuple[str, str]], strict: bool = True
) -> DataFrame:
    return (
        spark.read.schema(_struct(columns))
        .option("mode", "FAILFAST" if strict else "PERMISSIVE")
        .json(path)
    )
