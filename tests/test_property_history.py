"""Property-based SCD2 correctness (hypothesis): ANY change log — random
ops, duplicate re-deliveries that may land in DIFFERENT epochs, arbitrary
assignment of events to epochs — must yield a version history identical to
the one-shot `scd2_history` operator over the unique event set.

The append-only store has no LSN-guard merge to absorb cross-epoch
re-delivery, so this pins the read-side duplicate guard as well as the
epoch-splitting machinery.
"""

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from embulk_filter_copy_spark.cdc.history import (
    apply_history_batch,
    create_history_table,
    read_history,
    scd2_history,
)

KEYS = [f"k{i}" for i in range(4)]
_ctr = [0]
DDL = "k string, lsn long, op string, v string"


@st.composite
def change_logs(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    ops = draw(st.lists(st.sampled_from(["I", "U", "U", "D"]), min_size=n, max_size=n))
    key_idx = draw(st.lists(st.integers(0, len(KEYS) - 1), min_size=n, max_size=n))
    events = []
    for lsn, (op, ki) in enumerate(zip(ops, key_idx), start=1):
        v = None if op == "D" else f"v{lsn}-{ki}"
        events.append((KEYS[ki], lsn, op, v))
    # duplicate re-deliveries (exact copies), assigned to ARBITRARY epochs —
    # a duplicate may land in a different epoch than its original
    dup_idx = draw(st.lists(st.integers(0, n - 1), max_size=5))
    events += [events[i] for i in dup_idx]
    n_epochs = draw(st.integers(1, 3))
    assign = draw(
        st.lists(st.integers(0, n_epochs - 1), min_size=len(events), max_size=len(events))
    )
    return events, assign, n_epochs


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(change_logs())
def test_incremental_history_equals_batch_for_any_log(spark, tmpdir_path, log):
    events, assign, n_epochs = log
    _ctr[0] += 1
    tdir = os.path.join(tmpdir_path, f"h{_ctr[0]}")
    table = create_history_table(
        spark, tdir, [("k", "string"), ("v", "string")], key_cols=["k"], n_buckets=2
    )
    for e in range(n_epochs):
        batch = [ev for ev, a in zip(events, assign) if a == e]
        df = spark.createDataFrame(batch, DDL) if batch else spark.createDataFrame([], DDL)
        apply_history_batch(table, df, run_id="prop", epoch=e)
    # replay one epoch again: must be fully gated
    batch0 = [ev for ev, a in zip(events, assign) if a == 0]
    if batch0:
        assert apply_history_batch(
            table, spark.createDataFrame(batch0, DDL), run_id="prop", epoch=0
        )["skipped"]

    uniq = list(dict.fromkeys(events))  # unique events, original order
    want = scd2_history(spark.createDataFrame(uniq, DDL), ["k"])
    cols = ["k", "v", "valid_from_lsn", "valid_to_lsn", "is_current"]
    got_rows = sorted(map(tuple, read_history(table).select(*cols).collect()))
    want_rows = sorted(map(tuple, want.select(*cols).collect()))
    assert got_rows == want_rows
