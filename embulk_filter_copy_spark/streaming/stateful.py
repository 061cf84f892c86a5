"""Custom stateful streaming operator: per-repo running CDC statistics via
``applyInPandasWithState`` (Arrow-batched grouped state — SURVEY.md §2.9).

The reference's only cross-batch state is the in-memory ``LoaderState``
TrieMap registry (LoaderState.scala:40-50), which dies with the JVM. This
operator is the distributed, durable generalization: per-key state lives in
Spark's checkpointed state store, survives restarts, and is updated one
Arrow batch at a time (no per-row Python — the pandas UDF sees each group's
microbatch rows as whole DataFrames).

Semantics: for every ``repo``, maintain
  (n_events, n_upserts, n_deletes, lsn_min, lsn_max, last_ts)
accumulated across ALL microbatches since stream start, emitting the updated
row for every repo present in the current batch (output mode ``update``).
At 10^10-event scale state is O(#distinct repos) — bounded by the key space,
not the event count — and hash-partitioned by repo across executors.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_upserts", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("lsn_min", T.LongType()),
        T.StructField("lsn_max", T.LongType()),
        T.StructField("last_ts_ms", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("n_upserts", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("lsn_min", T.LongType()),
        T.StructField("lsn_max", T.LongType()),
        T.StructField("last_ts_ms", T.LongType()),
    ]
)


def _update_repo_stats(key, pdf_iter, state: GroupState):
    (repo,) = key
    n, up, dels = 0, 0, 0
    lsn_min, lsn_max, last_ms = None, None, None
    if state.exists:
        n, up, dels, lsn_min, lsn_max, last_ms = state.get
    for pdf in pdf_iter:
        data = pdf[pdf["op"] != "S"]
        n += len(data)
        up += int((data["op"].isin(["I", "U"])).sum())
        dels += int((data["op"] == "D").sum())
        if len(data):
            lo, hi = int(data["lsn"].min()), int(data["lsn"].max())
            lsn_min = lo if lsn_min is None else min(lsn_min, lo)
            lsn_max = hi if lsn_max is None else max(lsn_max, hi)
            ts_max = data["ts"].max()
            if pd.notna(ts_max):  # all-null ts → keep None, not the NaT sentinel
                ms = int(ts_max.value // 1_000_000)
                last_ms = ms if last_ms is None else max(last_ms, ms)
    state.update((n, up, dels, lsn_min, lsn_max, last_ms))
    yield pd.DataFrame(
        [
            {
                "repo": repo,
                "n_events": n,
                "n_upserts": up,
                "n_deletes": dels,
                "lsn_min": lsn_min,
                "lsn_max": lsn_max,
                "last_ts_ms": last_ms,
            }
        ]
    )


def repo_change_stats(events: DataFrame) -> DataFrame:
    """Streaming per-repo running stats (see module docstring).

    ``events`` must be a streaming DataFrame in the engine event schema;
    returns an ``update``-mode stream of one row per repo per batch in
    :data:`STATS_SCHEMA`.
    """
    return events.groupBy("repo").applyInPandasWithState(
        _update_repo_stats,
        outputStructType=STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
