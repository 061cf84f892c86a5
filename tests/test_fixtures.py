from pyspark.sql import functions as F

from embulk_filter_copy_spark.fixtures import gen_change_events, gen_repo_files, replay_oracle


def test_repo_files_deterministic_and_unique_keys(spark):
    a = gen_repo_files(spark, 500, seed=42)
    b = gen_repo_files(spark, 500, seed=42)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert a.select("repo", "path").distinct().count() == 500
    # ~1% null content
    nnulls = a.filter(F.col("content").isNull()).count()
    assert 0 <= nnulls <= 25


def test_repo_files_skew(spark):
    df = gen_repo_files(spark, 2000, seed=42)
    top = df.groupBy("repo").count().orderBy(F.desc("count")).first()
    assert top["count"] > 2000 / 100 * 3  # hot repo well above uniform share


def test_change_events_shape(spark):
    ev = gen_change_events(spark, n_base_rows=300, n_events=1000, seed=42, dup_rate=0.05)
    assert ev.count() > 1000  # duplicates added
    assert ev.select("lsn").distinct().count() == 1000
    ops = {r["op"] for r in ev.select("op").distinct().collect()}
    assert ops == {"I", "U", "D"}
    dels = ev.filter("op = 'D' and content is not null").count()
    assert dels == 0


def test_change_events_schema_rows(spark):
    ev = gen_change_events(
        spark, 100, 200, schema_changes=[(50, {"action": "add", "column": "x", "type": "long"})]
    )
    s = ev.filter("op = 'S'").collect()
    assert len(s) == 1 and s[0]["lsn"] == 50 and "add" in s[0]["schema_change"]


def test_oracle_replay_basics(spark):
    base = gen_repo_files(spark, 50, seed=1).toPandas()
    ev = gen_change_events(spark, 50, 200, seed=1, dup_rate=0.1).toPandas()
    final = replay_oracle(base, ev)
    # keys unique
    assert final.duplicated(subset=["repo", "path"]).sum() == 0
    # deleted keys are gone: replaying a D as last event for a key removes it
    last_per_key = (
        ev.sort_values("lsn").drop_duplicates(["repo", "path"], keep="last")
    )
    deleted = last_per_key[last_per_key["op"] == "D"][["repo", "path"]]
    merged = final.merge(deleted, on=["repo", "path"], how="inner")
    assert len(merged) == 0
