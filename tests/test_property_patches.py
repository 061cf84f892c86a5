"""Property-based patch-replay correctness (hypothesis): ANY event log
mixing full images, deletes, and partial-column patches — with duplicate
re-deliveries into their original epoch OR any LATER epoch — replayed
through ``apply_batch(dedup='patch')`` over LSN-ordered epoch splits must
land on exactly the state of a strict single-threaded per-event replay.

Unlike plain LWW (order-insensitive: the property suite feeds it ARBITRARY
epoch assignment), patch folding is exact only when epoch batches respect
LSN order for FIRST deliveries — the WAL/CDC transport contract (a patch's
validity is inherently relative to base-image order, so an out-of-order
first delivery is unresolvable without per-column LSNs in the TABLE).
Duplicates, by contrast, may leak anywhere later: the fold emits per-piece
LSNs (``_img_lsn``/``_del_lsn``/``_pl_<col>``) and the merge resolves each
piece against the target's ``_lsn``, so a stale duplicate patch, full
image, or delete loses per piece (``test_cross_epoch_duplicate_resolved``
pins the once-out-of-contract shape).
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
    # crash-replay shape) or ANY LATER epoch (out-of-horizon transport
    # duplicates) — the per-piece merge guards must absorb both
    for i in draw(st.lists(st.integers(0, n - 1), max_size=4)):
        src_epoch = next(
            e for e in range(n_epochs) if bounds[e] <= i < bounds[e + 1]
        )
        dup_epoch = draw(st.integers(src_epoch, n_epochs - 1))
        epochs[dup_epoch] = [*epochs[dup_epoch], events[i]]
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


def test_cross_epoch_duplicate_resolved(spark):
    """The round-4 review counterexample, now resolved: a patch duplicate
    leaking into a LATER epoch after its effect was superseded used to
    resurrect the stale column (the fold resolved it against the batch's
    own images). With per-piece merge guards (_pl_<col> vs the target's
    _lsn) the stale patch loses per column while the fresh patch in the
    same batch still applies."""
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
        # the stale duplicate P@1 loses to the per-column LSN guard
        # (_pl_a=1 ≤ target _lsn=8); the column keeps its true state
        assert row["a"] == "a8"
    finally:
        shutil.rmtree(root, ignore_errors=True)
