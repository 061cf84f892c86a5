"""SparkSession factory tuned for the CDC engine.

Local-mode defaults mirror what the same code would do under
``spark-submit --py-files`` on a multi-executor cluster: AQE on (runtime
coalescing + skew-join splitting), Arrow enabled (every Python crossing is
vectorized), UTC session timezone (stable oracle comparison), shuffle
partitions sized to cores rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "embulk-filter-copy-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = default_parallelism()
    master = master or f"local[{cores}]"
    shuffle_partitions = shuffle_partitions or cores
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.schemaInference", "false")
        # keep local runs quiet and deterministic
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # bucketed writes: one open writer per bucket dir instead of the
        # dynamic-partition sort (sorting full rows by _bucket inside each
        # write task dominated merge epochs; see BASELINE.md)
        .config("spark.sql.maxConcurrentOutputFileWriters", "128")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
