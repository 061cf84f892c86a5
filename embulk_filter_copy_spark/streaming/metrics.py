"""Streaming observability: the engine's replacement for the reference's
async progress logging ("Copy in progress {done: k/n}",
CopyFilterPlugin.scala:103-113) and 1 s drain polling
(LoaderState.scala:194-206).

Two mechanisms, both zero-cost on executors:
  * ``with_observed_metrics`` — ``df.observe()`` named aggregates riding the
    microbatch (row counts, LSN range), surfaced in each progress event;
  * :class:`ProgressRecorder` — a ``StreamingQueryListener`` persisting every
    microbatch's progress (rows/sec, batch duration, watermark, observed
    metrics) as JSON lines, the stream-level companion of the per-partition
    lineage files the applier writes.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


def with_observed_metrics(df: DataFrame, name: str = "cdc_metrics", lsn_col: str = "lsn") -> DataFrame:
    """Attach named observed metrics to a (streaming) DataFrame: row count,
    LSN range, and op histogram — computed inline with the batch, no extra
    pass."""
    return df.observe(
        name,
        F.count(F.lit(1)).alias("rows"),
        F.min(lsn_col).alias("lsn_min"),
        F.max(lsn_col).alias("lsn_max"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("deletes"),
        F.sum(F.when(F.col("op") == "S", 1).otherwise(0)).alias("schema_changes"),
    )


class ProgressRecorder(StreamingQueryListener):
    """Persists per-microbatch progress to ``<dir>/progress.jsonl``."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "progress.jsonl")

    def onQueryStarted(self, event) -> None:
        self._write({"event": "started", "id": str(event.id), "runId": str(event.runId)})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        rec = {
            "event": "progress",
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "inputRowsPerSecond": p.inputRowsPerSecond,
            "processedRowsPerSecond": p.processedRowsPerSecond,
            "durationMs": dict(p.durationMs) if p.durationMs else {},
            "eventTime": dict(p.eventTime) if p.eventTime else {},
            "observedMetrics": {
                k: v.asDict() for k, v in (p.observedMetrics or {}).items()
            },
        }
        self._write(rec)

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        self._write({"event": "terminated", "id": str(event.id)})

    def _write(self, rec: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(rec, default=str) + "\n")

    def records(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]
