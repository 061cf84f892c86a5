from embulk_filter_copy_spark.sources.files import read_csv_typed, read_json_typed
from embulk_filter_copy_spark.sources.sinks import write_sink

__all__ = ["read_csv_typed", "read_json_typed", "write_sink"]
