from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# re-exported for the query modules; the definitions live in the leaf
# `portable` module so operator modules can import them without touching
# the queries package (which would cycle through its eager __init__)
from embulk_filter_copy_spark.portable import (  # noqa: F401
    ROUND_EPS,
    duck_phash,
    reps,
    spark_phash,
    sql_reps,
)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
