"""Property-based correctness for the two round-5 read primitives:

* ``LakeTable.changelog`` — for ANY I/U/D log split anywhere into two
  phases, the pre/post-image changelog between the phase snapshots must
  equal a brute-force model computed from the raw events (ops classified
  against cut-time visibility, images exact, never-visible keys omitted);
* ``cdc.aggview`` — for ANY multi-epoch log with group-moving updates and
  null groups, the incrementally-refreshed view must equal a direct
  GROUP BY recompute of the final table after EVERY epoch.
"""

import datetime
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from embulk_filter_copy_spark.cdc.apply import apply_batch
from embulk_filter_copy_spark.lake.table import LakeTable

KEYS = list(range(5))
GROUPS = ["a", "b", None]
EVENT_DDL = "lsn long, ts timestamp, op string, k long, grp string, x double, schema_change string"


@st.composite
def iud_logs(draw, max_n=24, n_phases=2):
    n = draw(st.integers(min_value=2, max_value=max_n))
    events = []
    for lsn in range(1, n + 1):
        op = draw(st.sampled_from(["I", "U", "U", "D"]))
        k = draw(st.sampled_from(KEYS))
        if op == "D":
            events.append((lsn, "D", k, None, None))
        else:
            grp = draw(st.sampled_from(GROUPS))
            events.append((lsn, op, k, grp, float(lsn)))
    cuts = sorted(draw(st.lists(st.integers(0, n), min_size=n_phases - 1,
                                max_size=n_phases - 1)))
    bounds = [0, *cuts, n]
    return [events[bounds[i]:bounds[i + 1]] for i in range(n_phases)]


def _df(spark, rows):
    data = [
        (lsn, datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=lsn),
         op, k, grp, x, None)
        for (lsn, op, k, grp, x) in rows
    ]
    return spark.createDataFrame(data, EVENT_DDL)


def _model_state(events):
    """Visible (non-deleted) state after a strict per-event replay."""
    state = {}
    for (lsn, op, k, grp, x) in sorted(events):
        if op == "D":
            state[k] = None
        else:
            state[k] = (lsn, grp, x)
    return {k: v for k, v in state.items() if v is not None}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(iud_logs())
def test_changelog_matches_brute_force_model(spark, phases):
    p1, p2 = phases
    root = tempfile.mkdtemp(prefix="efc-clogprop-")
    try:
        t = LakeTable.create(
            spark, f"{root}/t", [("k", "long"), ("grp", "string"), ("x", "double")],
            key_columns=["k"], n_buckets=2,
        )
        if p1:
            apply_batch(t, _df(spark, p1), run_id="p", epoch=0)
        v_cut = t.current_version()
        if p2:
            apply_batch(t, _df(spark, p2), run_id="p", epoch=1)

        got = {
            r["k"]: (r["op"], r["lsn"], r["before_grp"], r["before_x"],
                     r["after_grp"], r["after_x"])
            for r in t.changelog(v_cut).collect()
        }

        before = _model_state(p1)
        # the feed's per-key net change: final row across BOTH phases for
        # keys whose final lsn is past the cut
        final = {}
        for (lsn, op, k, grp, x) in sorted(p1 + p2):
            final[k] = (lsn, op, grp, x)
        cut_lsn = max((e[0] for e in p1), default=0)
        want = {}
        for k, (lsn, op, grp, x) in final.items():
            if lsn <= cut_lsn:
                continue
            if op == "D":
                if k in before:
                    b = before[k]
                    want[k] = ("D", lsn, b[1], b[2], None, None)
                # delete of a never-visible key: omitted
            elif k in before:
                b = before[k]
                want[k] = ("U", lsn, b[1], b[2], grp, x)
            else:
                want[k] = ("I", lsn, None, None, grp, x)
        assert got == want, (got, want)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(iud_logs(max_n=20, n_phases=3))
def test_aggview_incremental_equals_recompute_every_epoch(spark, phases):
    from embulk_filter_copy_spark.cdc.aggview import (
        build_agg_view,
        read_agg_view,
        refresh_agg_view,
    )

    root = tempfile.mkdtemp(prefix="efc-avprop-")
    try:
        t = LakeTable.create(
            spark, f"{root}/t", [("k", "long"), ("grp", "string"), ("x", "double")],
            key_columns=["k"], n_buckets=2,
        )
        if phases[0]:
            apply_batch(t, _df(spark, phases[0]), run_id="p", epoch=0)
        build_agg_view(spark, t, f"{root}/v", group_cols=["grp"], sum_cols=["x"])
        for i, ph in enumerate(phases[1:], start=1):
            if ph:
                apply_batch(t, _df(spark, ph), run_id="p", epoch=i)
            refresh_agg_view(spark, t, f"{root}/v")
            got = {
                r["grp"]: (r["n_rows"], round(r["sum_x"], 6))
                for r in read_agg_view(spark, f"{root}/v").collect()
            }
            want = {
                r["grp"]: (r["n"], round(r["s"] or 0.0, 6))
                for r in t.read()
                .groupBy("grp")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum(F.coalesce("x", F.lit(0.0))).alias("s"))
                .collect()
            }
            assert got == want, (i, got, want)
    finally:
        shutil.rmtree(root, ignore_errors=True)
