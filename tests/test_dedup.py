from pyspark.sql import functions as F

from embulk_filter_copy_spark.cdc.dedup import lww_dedup, lww_dedup_salted
from embulk_filter_copy_spark.fixtures import gen_change_events


def _expected_winners(ev_pdf):
    ev = ev_pdf.sort_values(["lsn", "commit"]).drop_duplicates(["repo", "path"], keep="last")
    return {(r.repo, r.path): r.lsn for r in ev.itertuples()}


def test_lww_dedup_matches_pandas(spark):
    ev = gen_change_events(spark, 100, 500, seed=7, dup_rate=0.2)
    got = lww_dedup(ev)
    assert got.groupBy("repo", "path").count().filter("count > 1").count() == 0
    winners = {(r["repo"], r["path"]): r["lsn"] for r in got.collect()}
    assert winners == _expected_winners(ev.toPandas())


def test_salted_equals_plain(spark):
    ev = gen_change_events(spark, 100, 500, seed=7, dup_rate=0.2)
    plain = lww_dedup(ev)
    salted = lww_dedup_salted(ev, n_salts=8)
    cols = plain.columns
    assert plain.select(cols).exceptAll(salted.select(cols)).count() == 0
    assert salted.select(cols).exceptAll(plain.select(cols)).count() == 0


def test_dedup_drops_exact_duplicates(spark):
    ev = gen_change_events(spark, 50, 100, seed=3, dup_rate=0.5)
    n_keys = ev.select("repo", "path").distinct().count()
    assert lww_dedup(ev).count() == n_keys
    assert lww_dedup_salted(ev, n_salts=4).count() == n_keys


def test_salted_two_phase_plan_has_two_aggregates(spark):
    ev = gen_change_events(spark, 50, 100, seed=3)
    plan = lww_dedup_salted(ev, n_salts=4)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") >= 2  # local combine + global merge
