"""Property-based patch-replay correctness (hypothesis): ANY event log
mixing full images, deletes, and partial-column patches — with duplicate
re-deliveries into their original epochs — replayed through
``apply_batch(dedup='patch')`` over LSN-ordered epoch splits must land on
exactly the state of a strict single-threaded per-event replay.

Unlike plain LWW (order-insensitive: the property suite feeds it ARBITRARY
epoch assignment), patch folding is exact only when epoch batches respect
LSN order — the WAL/CDC transport contract — AND exact duplicates are
re-delivered within their ORIGINAL epoch (the crash-replay shape). The
generator enforces both: the log splits at sorted LSN boundaries and
duplicates land in their own epoch. A duplicate leaking into a LATER epoch
is out of contract — the fold resolves it against that batch's own images
and a stale patch can outrank the column's true state (the boundary is
pinned by `test_cross_epoch_duplicate_is_out_of_contract` below, and the
streaming replayer's watermark dedup absorbs such duplicates before the
fold within the watermark horizon).
"""

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from embulk_filter_copy_spark.cdc.apply import apply_batch
from embulk_filter_copy_spark.lake.table import LakeTable

KEYS = [f"k{i}" for i in range(4)]
EVENT_DDL = "lsn long, ts timestamp, op string, k string, a string, b string, schema_change string"
BASE = {"k0": {"a": "base-a", "b": "base-b"}}

_TOMB = object()


def sequential_oracle(events):
    """Strict per-event replay in LSN order: the semantics the engine's
    batched fold + merge must reproduce. Exact duplicates collapse to their
    first delivery; a patch applies only to a live key."""
    state = {k: dict(v) for k, v in BASE.items()}
    seen = set()
    for ev in sorted(events, key=lambda e: e[0]):
        lsn, _, op, k, a, b, _ = ev
        if lsn in seen:
            continue
        seen.add(lsn)
        if op == "D":
            state[k] = _TOMB
        elif op == "P":
            cur = state.get(k)
            if cur is not None and cur is not _TOMB:
                if a is not None:
                    cur["a"] = a
                if b is not None:
                    cur["b"] = b
        else:  # I / U full image
            state[k] = {"a": a, "b": b}
    return {k: v for k, v in state.items() if v is not _TOMB}


@st.composite
def patch_logs(draw):
    n = draw(st.integers(min_value=1, max_value=24))
    events = []
    for lsn in range(1, n + 1):
        op = draw(st.sampled_from(["I", "U", "P", "P", "D"]))
        k = draw(st.sampled_from(KEYS))
        if op == "D":
            events.append((lsn, None, "D", k, None, None, None))
        elif op == "P":
            which = draw(st.sampled_from(["a", "b", "ab"]))
            events.append((
                lsn, None, "P", k,
                f"pa{lsn}" if "a" in which else None,
                f"pb{lsn}" if "b" in which else None,
                None,
            ))
        else:
            events.append((lsn, None, op, k, f"a{lsn}", f"b{lsn}", None))
    # contiguous LSN-ordered epoch split (the WAL delivery contract patch
    # folding requires; see module docstring)
    n_epochs = draw(st.integers(1, 3))
    cuts = sorted(draw(st.lists(st.integers(0, n), min_size=n_epochs - 1,
                                max_size=n_epochs - 1)))
    bounds = [0, *cuts, n]
    epochs = [events[bounds[i]:bounds[i + 1]] for i in range(n_epochs)]
    # duplicate re-deliveries: exact copies into their ORIGINAL epoch (the
    # crash-replay shape — the delivery contract patch folding requires;
    # cross-epoch duplicates are out of contract, see module docstring)
    for i in draw(st.lists(st.integers(0, n - 1), max_size=4)):
        src_epoch = next(
            e for e in range(n_epochs) if bounds[e] <= i < bounds[e + 1]
        )
        epochs[src_epoch] = [*epochs[src_epoch], events[i]]
    return events, epochs


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(patch_logs())
def test_patch_replay_matches_sequential_oracle(spark, log):
    events, epochs = log
    root = tempfile.mkdtemp(prefix="efc-patchprop-")
    try:
        table = LakeTable.create(
            spark, f"{root}/t", [("k", "string"), ("a", "string"), ("b", "string")],
            key_columns=["k"], n_buckets=4,
        )
        table.append(
            spark.createDataFrame(
                [(k, v["a"], v["b"]) for k, v in BASE.items()],
                "k string, a string, b string",
            ).withColumn("_lsn", F.lit(0))
        )
        for e, chunk in enumerate(epochs):
            if not chunk:
                continue
            df = spark.createDataFrame(chunk, EVENT_DDL)
            apply_batch(table, df, run_id="pp", epoch=e, dedup="patch")

        golden = sequential_oracle(events)
        got = {r["k"]: r for r in table.read().collect()}
        assert set(got) == set(golden), (sorted(got), sorted(golden))
        for k, v in golden.items():
            assert (got[k]["a"], got[k]["b"]) == (v["a"], v["b"]), (
                k, got[k], v, events)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_cross_epoch_duplicate_is_out_of_contract(spark):
    """Pins the contract boundary (the review counterexample): a patch
    duplicate leaking into a LATER epoch after its effect was superseded
    resurrects the stale column — which is exactly why the contract
    requires same-epoch re-delivery and why the streaming replayer runs
    dropDuplicatesWithinWatermark BEFORE the fold. If this test ever
    starts producing 'a8', the fold gained per-column merge guards and the
    contract (plus this test) should be relaxed."""
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="efc-patchoob-")
    try:
        table = LakeTable.create(
            spark, f"{root}/t", [("k", "string"), ("a", "string"), ("b", "string")],
            key_columns=["k"], n_buckets=4,
        )
        e_p1 = ("k1", 1, "P", "pa1", None, None)
        ddl = "k string, lsn long, op string, a string, b string, ts timestamp"
        apply_batch(
            table,
            spark.createDataFrame([e_p1, ("k1", 8, "I", "a8", "b8", None)], ddl),
            run_id="r", epoch=0, dedup="patch",
        )
        # epoch 1: fresh P@12 plus the OUT-OF-CONTRACT re-delivery of P@1
        apply_batch(
            table,
            spark.createDataFrame(
                [e_p1, ("k1", 12, "P", None, "pb12", None)], ddl),
            run_id="r", epoch=1, dedup="patch",
        )
        row = table.read().collect()[0]
        assert row["b"] == "pb12"
        # stale column resurrected — documented out-of-contract behavior
        assert row["a"] == "pa1"
    finally:
        shutil.rmtree(root, ignore_errors=True)
