"""Property-based replay correctness (hypothesis): ANY event log — random
ops, duplicate re-deliveries, arbitrary (even non-contiguous) assignment of
events to epochs, either merge mode, either dedup strategy — must land on
exactly the pandas oracle's final table state.

This is the distilled form of the north_rule correctness contract: the
engine's batched/unordered execution may never disagree with a strict
LSN-ordered single-threaded replay.
"""

import hashlib
import shutil
import tempfile

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from embulk_filter_copy_spark.cdc.apply import apply_batch
from embulk_filter_copy_spark.fixtures import REPO_FILES_SCHEMA, replay_oracle
from embulk_filter_copy_spark.lake.table import LakeTable

KEYS = [(f"org/r{i}", f"src/p{j}.py") for i in range(2) for j in range(3)]

EVENT_DDL = (
    "lsn long, ts timestamp, op string, repo string, path string,"
    " commit string, lang string, content string, schema_change string"
)


@st.composite
def event_logs(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    ops = draw(st.lists(st.sampled_from(["I", "U", "U", "D"]), min_size=n, max_size=n))
    key_idx = draw(st.lists(st.integers(0, len(KEYS) - 1), min_size=n, max_size=n))
    events = []
    for lsn, (op, ki) in enumerate(zip(ops, key_idx), start=1):
        repo, path = KEYS[ki]
        if op == "D":
            events.append((lsn, None, "D", repo, path, None, None, None, None))
        else:
            events.append(
                (lsn, None, op, repo, path, f"c{lsn}", "py", f"content-{lsn}-{ki}", None)
            )
    # duplicate re-deliveries of a random subset (exact copies — the
    # at-least-once source contract)
    dup_idx = draw(st.lists(st.integers(0, n - 1), max_size=5))
    events += [events[i] for i in dup_idx]
    # arbitrary epoch assignment: events may land in ANY epoch, in any order
    n_epochs = draw(st.integers(1, 3))
    assign = draw(
        st.lists(st.integers(0, n_epochs - 1), min_size=len(events), max_size=len(events))
    )
    merge_mode = draw(st.sampled_from(["cow", "mor"]))
    dedup = draw(st.sampled_from(["plain", "salted"]))
    return events, assign, n_epochs, merge_mode, dedup


def _sha(x):
    return None if x is None else hashlib.sha256(str(x).encode()).hexdigest()


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(event_logs())
def test_any_epoching_matches_oracle(spark, log):
    events, assign, n_epochs, merge_mode, dedup = log
    root = tempfile.mkdtemp(prefix="efc-prop-")
    try:
        table = LakeTable.create(
            spark, f"{root}/t", REPO_FILES_SCHEMA,
            key_columns=["repo", "path"], n_buckets=4,
        )
        for e in range(n_epochs):
            chunk = [ev for ev, a in zip(events, assign) if a == e]
            if not chunk:
                continue
            df = spark.createDataFrame(chunk, EVENT_DDL).withColumn(
                "ts", F.timestamp_seconds(F.lit(1_767_225_700) + F.col("lsn"))
            )
            apply_batch(
                table, df, run_id="prop", epoch=e,
                dedup=dedup, merge_mode=merge_mode,
            )

        base = pd.DataFrame(columns=[c for c, _ in REPO_FILES_SCHEMA])
        ev_pdf = pd.DataFrame(
            events,
            columns=["lsn", "ts", "op", "repo", "path", "commit", "lang", "content", "schema_change"],
        )
        golden = replay_oracle(base, ev_pdf)

        got = (
            table.read()
            .toPandas()
            .sort_values(["repo", "path"])
            .reset_index(drop=True)
        )
        assert len(got) == len(golden), (len(got), len(golden))
        if len(golden):
            for frame in (got, golden):
                frame["content_sha"] = frame["content"].map(_sha)
            cols = ["repo", "path", "content_sha", "commit", "lang"]
            assert got[cols].reset_index(drop=True).equals(
                golden[cols].reset_index(drop=True)
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
