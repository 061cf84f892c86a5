"""fsck consistency audit + bucket-pruned point lookup."""

import json
import os

import pytest
from pyspark.sql import functions as F

from embulk_filter_copy_spark.cdc.apply import apply_batch
from embulk_filter_copy_spark.fixtures import (
    REPO_FILES_SCHEMA,
    gen_change_events,
    gen_repo_files,
)
from embulk_filter_copy_spark.lake.fsck import fsck
from embulk_filter_copy_spark.lake.table import LakeTable


def _bootstrap(spark, path, n_base=80, merge_mode="cow"):
    t = LakeTable.create(
        spark, path, REPO_FILES_SCHEMA, key_columns=["repo", "path"], n_buckets=8
    )
    t.append(gen_repo_files(spark, n_base, seed=6).withColumn("_lsn", F.lit(0)))
    ev = gen_change_events(spark, n_base, 200, seed=6)
    apply_batch(t, ev, run_id="fsck", epoch=0, merge_mode=merge_mode)
    return t


def _tamper(t, mutate):
    """Break snapshot immutability on purpose: rewrite the CURRENT snapshot
    JSON in place and drop the table's cache."""
    v = t.current_version()
    p = os.path.join(t._meta_dir, f"v{v:08d}.json")
    with open(p) as f:
        snap = json.load(f)
    mutate(snap)
    os.remove(p)
    with open(p, "w") as f:
        json.dump(snap, f)
    t._snap_cache_version = None


def test_fsck_clean_table_is_ok(spark, tmpdir_path):
    t = _bootstrap(spark, os.path.join(tmpdir_path, "ok"))
    # exercise schema evolution + a rename so the by-field-id audit paths run
    t.update_schema({"action": "rename", "from": "content", "to": "body"}, schema_lsn=500)
    rep = fsck(spark, t)
    assert rep["ok"], rep["issues"]
    assert rep["checked"]["deep"] is True


def test_fsck_clean_mor_table_is_ok(spark, tmpdir_path):
    t = _bootstrap(spark, os.path.join(tmpdir_path, "mor"), merge_mode="mor")
    rep = fsck(spark, t)
    # delta files legitimately repeat keys — fsck must not flag them
    assert rep["ok"], rep["issues"]


def test_fsck_detects_missing_file_and_row_count(spark, tmpdir_path):
    t = _bootstrap(spark, os.path.join(tmpdir_path, "bad"))
    files = t.files()
    # delete one data file outright
    os.remove(os.path.join(t.path, files[0]["path"]))
    # lie about another's row count
    victim = files[1]["path"]

    def mutate(snap):
        for f in snap["files"]:
            if f["path"] == victim:
                f["rows"] = f["rows"] + 7

    _tamper(t, mutate)
    rep = fsck(spark, t)
    kinds = {i["kind"] for i in rep["issues"]}
    assert not rep["ok"]
    assert "missing_data_file" in kinds
    assert "row_count_mismatch" in kinds


def test_fsck_detects_bucket_mismatch_and_dup_commit(spark, tmpdir_path):
    t = _bootstrap(spark, os.path.join(tmpdir_path, "bad2"))

    def mutate(snap):
        # claim a file belongs to the wrong bucket: every row now hashes
        # elsewhere — exactly what a stale-rescale mix would look like
        snap["files"][0]["bucket"] = (snap["files"][0]["bucket"] + 1) % 8
        snap["commits"] = snap["commits"] + [dict(snap["commits"][-1])]

    _tamper(t, mutate)
    rep = fsck(spark, t)
    kinds = {i["kind"] for i in rep["issues"]}
    assert "bucket_mismatch" in kinds
    assert "duplicate_commit" in kinds


def test_fsck_detects_duplicate_base_key(spark, tmpdir_path):
    t = _bootstrap(spark, os.path.join(tmpdir_path, "bad3"))
    one = t.read().limit(1)
    # low-level append bypasses the merge: the key now exists in two base
    # files of the same bucket — the copy-on-write invariant broken
    t.append(one.withColumn("_lsn", F.lit(10**9)))
    rep = fsck(spark, t)
    assert any(i["kind"] == "duplicate_key_in_base" for i in rep["issues"])


# ---------------------------------------------------------------------------
def test_lookup_prunes_to_one_bucket(spark, tmpdir_path):
    t = _bootstrap(spark, os.path.join(tmpdir_path, "lk"))
    row = t.read().first()
    key = {"repo": row["repo"], "path": row["path"]}
    got = t.lookup(key).collect()
    assert len(got) == 1 and got[0]["content"] == row["content"]

    # pruning: the lookup's snapshot scan planned only ONE bucket's files
    bucket = int(
        spark.range(1).select(
            F.pmod(F.xxhash64(F.lit(key["repo"]), F.lit(key["path"])), F.lit(8)).alias("b")
        ).first()["b"]
    )
    assert len(t.files([bucket])) < len(t.files())

    with pytest.raises(ValueError, match="bucket column"):
        t.lookup({"repo": row["repo"]})

    # absent key: empty, still single-bucket work
    assert t.lookup({"repo": "no/such", "path": "nope.py"}).count() == 0


# ---------------------------------------------------------------------------
def test_rebucket_by_new_columns(spark, tmpdir_path):
    """Partition-spec evolution: rebucket a (repo, path)-keyed table by
    (repo) alone — state identical, lookups prune on repo only, and fsck
    verifies every row's placement under the NEW spec."""
    import pytest

    t = _bootstrap(spark, os.path.join(tmpdir_path, "rb"))
    before = sorted(tuple(r) for r in t.read().collect())

    res = t.rescale_buckets(new_n_buckets=4, new_bucket_columns=["repo"])
    assert res["bucket_columns"] == ["repo"] and res["n_buckets"] == 4
    assert t.bucket_columns == ["repo"] and t.n_buckets == 4
    assert sorted(tuple(r) for r in t.read().collect()) == before

    # the whole point: per-repo access now needs only the repo
    row = t.read().first()
    got = t.lookup({"repo": row["repo"], "path": row["path"]}).collect()
    assert len(got) == 1

    # fsck re-derives every row's bucket under the NEW spec — all placed
    rep = fsck(spark, t)
    assert rep["ok"], rep["issues"]

    # merges keep working against the new spec
    ev = gen_change_events(spark, 80, 60, seed=7).withColumn(
        "lsn", F.col("lsn") + F.lit(10**6)
    )
    apply_batch(t, ev, run_id="fsck", epoch=1)
    assert fsck(spark, t)["ok"]

    with pytest.raises(ValueError, match="subset of key columns"):
        t.rescale_buckets(new_bucket_columns=["lang"])
    with pytest.raises(ValueError, match="give new_n_buckets"):
        t.rescale_buckets()
