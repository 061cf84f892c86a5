"""CLI (spark-submit shape) end-to-end + compaction maintenance."""

import json
import os

from pyspark.sql import functions as F

from embulk_filter_copy_spark.fixtures import REPO_FILES_SCHEMA, gen_change_events, gen_repo_files
from embulk_filter_copy_spark.lake.table import LakeTable


def test_compaction_merges_files_and_purges_tombstones(spark, tmpdir_path):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), REPO_FILES_SCHEMA,
        key_columns=["repo", "path"], n_buckets=2,
    )
    ddl = "repo string, path string, commit string, lang string, content string, _lsn long, _deleted boolean"
    for i in range(4):  # 4 appends → ≥4 files per bucket
        t.append(spark.createDataFrame(
            [("o/r", f"p{i}", "c", "py", "x", i, False),
             ("o/r", f"dead{i}", "c", "py", None, i, True)], ddl))
    live_before = t.read().count()
    files_before = len(t.files())
    res = t.compact(purge_tombstones=True, max_files_per_bucket=1)
    assert res["files_after"] < files_before
    assert t.read().count() == live_before            # logical content unchanged
    assert t.read(include_meta=True).count() == live_before  # tombstones gone
    # physical files actually reduced
    assert len(t.files()) == res["files_after"]


def test_cli_bootstrap_replay_compact(spark, tmpdir_path, capsys):
    from embulk_filter_copy_spark import cli

    base_p = os.path.join(tmpdir_path, "base.parquet")
    gen_repo_files(spark, 80, seed=3).write.parquet(base_p)
    wal = os.path.join(tmpdir_path, "wal")
    gen_change_events(spark, 80, 300, seed=3).coalesce(1).write.parquet(wal)
    table = os.path.join(tmpdir_path, "lake")

    cli.main(["--master", "local[4]", "bootstrap", "--table", table,
              "--snapshot", base_p, "--keys", "repo,path", "--buckets", "8"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 80

    cli.main(["--master", "local[4]", "replay", "--events", wal, "--sink", table,
              "--checkpoint", os.path.join(tmpdir_path, "ck")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows_applied"] > 0

    cli.main(["--master", "local[4]", "compact", "--table", table, "--purge-tombstones"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "buckets_compacted" in out

    t = LakeTable.load(spark, table)
    assert t.read().count() > 0
    assert t.read(include_meta=True).filter(F.col("_deleted")).count() == 0


def test_cli_changes_feed(spark, tmpdir_path, capsys):
    from embulk_filter_copy_spark import cli

    base_p = os.path.join(tmpdir_path, "base.parquet")
    gen_repo_files(spark, 50, seed=5).write.parquet(base_p)
    wal = os.path.join(tmpdir_path, "wal")
    gen_change_events(spark, 50, 150, seed=5).coalesce(1).write.parquet(wal)
    table = os.path.join(tmpdir_path, "lake")

    cli.main(["--master", "local[4]", "bootstrap", "--table", table,
              "--snapshot", base_p, "--keys", "repo,path", "--buckets", "8"])
    capsys.readouterr()
    v0 = LakeTable.load(spark, table).current_version()
    cli.main(["--master", "local[4]", "replay", "--events", wal, "--sink", table,
              "--checkpoint", os.path.join(tmpdir_path, "ck")])
    capsys.readouterr()

    out_p = os.path.join(tmpdir_path, "feed")
    cli.main(["--master", "local[4]", "changes", "--table", table,
              "--since-version", str(v0), "--out", out_p])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] > 0
    feed = spark.read.parquet(out_p)
    assert set(feed.select("op").distinct().toPandas()["op"]) <= {"U", "D"}
    assert feed.count() == out["rows"]


def test_cli_sink_spec_tree(spark, tmpdir_path, capsys):
    from embulk_filter_copy_spark import cli

    wal = os.path.join(tmpdir_path, "wal")
    gen_change_events(spark, 40, 120, seed=5).coalesce(1).write.parquet(wal)
    p1, p2 = os.path.join(tmpdir_path, "s1"), os.path.join(tmpdir_path, "s2")
    for p in (p1, p2):
        LakeTable.create(spark, p, REPO_FILES_SCHEMA, key_columns=["repo", "path"], n_buckets=4)
    spec = {
        "name": "root", "path": p1,
        "children": [{"name": "narrow", "path": p2, "transforms": [["drop", ["commit"]]]}],
    }
    spec_file = os.path.join(tmpdir_path, "spec.json")
    with open(spec_file, "w") as f:
        json.dump(spec, f)
    cli.main(["replay", "--events", wal, "--sink-spec", spec_file,
              "--checkpoint", os.path.join(tmpdir_path, "ck2")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows_applied"] > 0
    assert LakeTable.load(spark, p2).read().count() == LakeTable.load(spark, p1).read().count()
