"""Sink registry: the engine's generalization of the reference's pluggable
OutputPlugin resolution (BreakinBulkLoader.scala:110-114 resolves any output
plugin by type name at runtime). Here a sink is resolved by type string; the
transactional lake sink is the LakeTable merge path, the rest are thin
wrappers over Spark writers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_sink(df: DataFrame, sink_type: str, path: str | None = None, **options) -> None:
    """Resolve a sink by type name: 'stdout' (reference example's sink),
    'parquet', 'csv', 'json', 'noop' (benchmark), 'memory' is streaming-only."""
    if sink_type == "stdout":
        df.show(int(options.get("num_rows", 20)), truncate=int(options.get("truncate", 20)))
        return
    if sink_type == "noop":
        df.write.format("noop").mode("overwrite").save()
        return
    if sink_type in ("parquet", "csv", "json"):
        w = df.write.mode(options.pop("mode", "overwrite"))
        for k, v in options.items():
            w = w.option(k, v)
        getattr(w, sink_type)(path)
        return
    if sink_type == "laketable":
        from embulk_filter_copy_spark.lake.table import LakeTable

        table = LakeTable.load(df.sparkSession, path)
        table.append(df)
        return
    raise ValueError(f"unknown sink type: {sink_type!r}")
