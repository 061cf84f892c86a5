"""CDC / incremental-ingest core: dedup, merge-apply, streaming replay, fan-out."""

from embulk_filter_copy_spark.cdc.apply import apply_batch, merge_into
from embulk_filter_copy_spark.cdc.dedup import lww_dedup, lww_dedup_salted
from embulk_filter_copy_spark.cdc.replayer import replay_batch, replay_stream
from embulk_filter_copy_spark.cdc.splitter import SinkSpec, flatten_specs

__all__ = [
    "lww_dedup",
    "lww_dedup_salted",
    "apply_batch",
    "merge_into",
    "replay_batch",
    "replay_stream",
    "SinkSpec",
    "flatten_specs",
]
