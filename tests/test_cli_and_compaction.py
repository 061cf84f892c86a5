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


def test_expire_snapshots_gc(spark, tmpdir_path):
    """Copy-on-write rewrites strand replaced files in old snapshots;
    expire_snapshots must delete exactly the files no kept snapshot
    references, keep the current state readable, and make time travel
    below the horizon raise."""
    import glob
    import os

    import pytest
    from pyspark.sql import functions as F

    from embulk_filter_copy_spark.cdc.apply import apply_batch
    from embulk_filter_copy_spark.lake.table import LakeTable

    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "gc"),
        [("k", "long"), ("v", "string")], key_columns=["k"], n_buckets=2,
    )
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
             .withColumn("_lsn", F.lit(1)))
    for i in range(4):  # repeated upserts → repeated bucket rewrites
        ev = spark.createDataFrame(
            [(10 + i, "U", 1, f"v{i}")], "lsn long, op string, k long, v string"
        ).withColumn("ts", F.timestamp_micros("lsn"))
        apply_batch(t, ev, run_id="gc", epoch=i)
    files_before = len(glob.glob(os.path.join(tmpdir_path, "gc", "data", "*", "*", "*.parquet")))
    live_refs = {f["path"] for f in t.files()}
    res = t.expire_snapshots(keep_last=2)
    assert res["snapshots_expired"] > 0 and res["files_deleted"] > 0
    on_disk = {os.path.relpath(p, t.path) for p in
               glob.glob(os.path.join(tmpdir_path, "gc", "data", "*", "*", "*.parquet"))}
    assert live_refs <= on_disk            # everything referenced survives
    assert len(on_disk) < files_before     # orphans actually deleted
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == {1: "v3", 2: "b"}        # current state intact
    with pytest.raises(FileNotFoundError):
        t.read(version=1)                  # below horizon: gone
    # idempotent re-run
    res2 = t.expire_snapshots(keep_last=2)
    assert res2["snapshots_expired"] == 0 and res2["files_deleted"] == 0


def test_expire_orphan_sweep_collects_aborted_commit_files(spark, tmpdir_path):
    """An aborted commit (data files written, snapshot never committed —
    the CommitConflict-loser shape) leaves files referenced by NO snapshot;
    the reference-diff GC can't see them, the orphan sweep must — but only
    past the grace window, so an in-flight writer's files survive."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from embulk_filter_copy_spark.lake.table import LakeTable

    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "orph"),
        [("k", "long"), ("v", "string")], key_columns=["k"], n_buckets=2,
    )
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
             .withColumn("_lsn", F.lit(1)))
    # simulate the aborted commit: copy a committed data dir to an
    # uncommitted name (same layout _write_data_files produces)
    committed = glob.glob(os.path.join(t.path, "data", "c*"))[0]
    aborted = os.path.join(t.path, "data", "c99999999-deadbeef")
    shutil.copytree(committed, aborted)
    orphan_files = glob.glob(os.path.join(aborted, "_bucket=*", "*.parquet"))
    assert orphan_files
    # inside the grace window: kept (could be an in-flight commit)
    res = t.expire_snapshots(keep_last=1, sweep_orphans=True,
                             orphan_grace_seconds=3600)
    assert res["orphans_swept"] == 0
    assert all(os.path.exists(p) for p in orphan_files)
    # past the grace window: swept; referenced files untouched
    res = t.expire_snapshots(keep_last=1, sweep_orphans=True,
                             orphan_grace_seconds=0)
    assert res["orphans_swept"] == len(orphan_files)
    assert not any(os.path.exists(p) for p in orphan_files)
    assert {r["k"] for r in t.read().collect()} == {1, 2}


def test_expire_rejects_nonpositive_keep_last(spark, tmpdir_path):
    import os

    import pytest
    from pyspark.sql import functions as F

    from embulk_filter_copy_spark.lake.table import LakeTable

    t = LakeTable.create(spark, os.path.join(tmpdir_path, "kl"),
                         [("k", "long")], key_columns=["k"], n_buckets=1)
    t.append(spark.createDataFrame([(1,)], "k long").withColumn("_lsn", F.lit(1)))
    with pytest.raises(ValueError, match="keep_last"):
        t.expire_snapshots(keep_last=0)
    assert t.read().count() == 1  # nothing was deleted


def test_rescale_buckets_preserves_state_and_merging(spark, tmpdir_path):
    """Rescaling rewrites every row under the new bucket function; reads,
    tombstones and subsequent merges must be unaffected."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from embulk_filter_copy_spark.cdc.apply import apply_batch
    from embulk_filter_copy_spark.lake.table import LakeTable

    t = LakeTable.create(spark, os.path.join(tmpdir_path, "rs"),
                         [("k", "long"), ("v", "string")], key_columns=["k"], n_buckets=2)
    t.append(spark.createDataFrame([(i, f"v{i}") for i in range(20)], "k long, v string")
             .withColumn("_lsn", F.lit(1)))
    # delete one key (tombstone) pre-rescale
    ev = spark.createDataFrame([(5, "D", 7, None)], "lsn long, op string, k long, v string")\
        .withColumn("ts", F.timestamp_micros("lsn"))
    apply_batch(t, ev, run_id="rs", epoch=0)
    before = {r["k"]: r["v"] for r in t.read().collect()}

    res = t.rescale_buckets(16)
    assert t.n_buckets == 16 and res["rows"] == 20  # 19 live + 1 tombstone
    buckets = {f["bucket"] for f in t.files()}
    assert buckets <= set(range(16)) and len(buckets) > 2
    assert {r["k"]: r["v"] for r in t.read().collect()} == before

    # merges keep working under the new bucketing (incl. the deleted key
    # staying deleted unless re-inserted at a higher LSN)
    ev2 = spark.createDataFrame([(10, "U", 3, "new3"), (11, "I", 7, "back7")],
                                "lsn long, op string, k long, v string")\
        .withColumn("ts", F.timestamp_micros("lsn"))
    apply_batch(t, ev2, run_id="rs", epoch=1)
    after = {r["k"]: r["v"] for r in t.read().collect()}
    assert after[3] == "new3" and after[7] == "back7" and len(after) == 20

    with pytest.raises(ValueError):
        t.rescale_buckets(0)


def test_cli_history_view_and_snapshot(spark, tmpdir_path, capsys):
    from embulk_filter_copy_spark import cli
    from embulk_filter_copy_spark.cdc.history import (
        apply_history_batch,
        create_history_table,
    )

    htable = create_history_table(
        spark, os.path.join(tmpdir_path, "hist"),
        [("repo", "string"), ("path", "string"), ("commit", "string"),
         ("lang", "string"), ("content", "string")],
        key_cols=["repo", "path"], n_buckets=2,
    )
    ev = gen_change_events(spark, 40, 200, seed=11)
    apply_history_batch(htable, ev, run_id="clih", epoch=0)

    out_p = os.path.join(tmpdir_path, "hist_out")
    cli.main(["--master", "local[4]", "history", "--table", htable.path,
              "--out", out_p])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] > 0

    mid = ev.agg(F.expr("percentile_approx(lsn, 0.5)")).first()[0]
    snap_p = os.path.join(tmpdir_path, "hist_snap")
    cli.main(["--master", "local[4]", "history", "--table", htable.path,
              "--as-of-lsn", str(int(mid)), "--out", snap_p])
    snap = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < snap["rows"] <= out["rows"]
    # snapshot rows are versions live at that LSN
    df = spark.read.parquet(snap_p)
    assert df.filter(
        (F.col("valid_from_lsn") > int(mid))
        | ((F.col("valid_to_lsn").isNotNull()) & (F.col("valid_to_lsn") <= int(mid)))
    ).count() == 0


def test_cli_materialize_build_then_refresh(spark, tmpdir_path, capsys):
    from embulk_filter_copy_spark import cli
    from embulk_filter_copy_spark.cdc.history import (
        apply_history_batch,
        create_history_table,
    )

    store = create_history_table(
        spark, os.path.join(tmpdir_path, "store"),
        [("repo", "string"), ("path", "string"), ("commit", "string"),
         ("lang", "string"), ("content", "string")],
        key_cols=["repo", "path"], n_buckets=4,
    )
    ev = gen_change_events(spark, 40, 200, seed=21)
    apply_history_batch(store, ev.filter("lsn <= 100"), run_id="m", epoch=0)

    view = os.path.join(tmpdir_path, "view")
    cli.main(["--master", "local[4]", "materialize", "--store", store.path, "--view", view])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out.get("built") and out["rows"] > 0

    # second run without new store commits: idempotent refresh
    cli.main(["--master", "local[4]", "materialize", "--store", store.path, "--view", view])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out.get("skipped")

    apply_history_batch(store, ev.filter("lsn > 100"), run_id="m", epoch=1)
    cli.main(["--master", "local[4]", "materialize", "--store", store.path, "--view", view])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert not out.get("skipped") and out["rows"] > 0


def test_compact_quarantine_folds_dirs_idempotently(spark, tmpdir_path, capsys):
    """Per-epoch qpart dirs fold into one compacted dir; rows survive
    exactly (mixed pre/post layouts readable); a re-run (crash between the
    atomic rename and the source deletes) never duplicates rows; repeated
    compactions fold prior qcompact dirs instead of accumulating them."""
    import shutil

    from embulk_filter_copy_spark import cli
    from embulk_filter_copy_spark.cdc.apply import (
        compact_quarantine,
        read_quarantine,
        write_quarantine,
    )

    q = os.path.join(tmpdir_path, "quar")
    os.makedirs(q)
    mk = lambda n: spark.range(n).selectExpr("id", "cast(id as string) AS v")
    for epoch in range(5):
        write_quarantine(mk(10 + epoch), q, "run1", epoch, "sinkA")
    write_quarantine(mk(3), q, "run1", 0, "sinkB")
    total = read_quarantine(spark, q).count()
    assert total == 10 + 11 + 12 + 13 + 14 + 3

    res = compact_quarantine(spark, q, keep_recent=2)
    # keep_recent protects (run, epoch) GROUPS by last-write recency: the
    # sinkB write made epoch 0's group the most recent, so groups {0, 4}
    # stay (3 dirs — BOTH of epoch 0's sinks), epochs 1-3 fold
    assert res["dirs_compacted"] == 3 and res["rows"] > 0
    names = sorted(os.listdir(q))
    assert sum(n.startswith("qpart=") for n in names) == 3
    assert sum(n.startswith("qcompact=") for n in names) == 1
    assert read_quarantine(spark, q).count() == total

    # crash-resume: target exists, sources linger -> re-create one source
    # dir's worth of already-compacted rows and re-run with the same set
    again = compact_quarantine(spark, q, keep_recent=2)
    assert again["dirs_compacted"] == 0  # nothing new to fold
    assert read_quarantine(spark, q).count() == total

    # second round: new epochs arrive; old qcompact folds in too
    for epoch in range(5, 9):
        write_quarantine(mk(2), q, "run1", epoch, "sinkA")
    total2 = read_quarantine(spark, q).count()
    res2 = compact_quarantine(spark, q, keep_recent=2)
    assert res2["dirs_compacted"] >= 2
    assert sum(n.startswith("qcompact=") for n in os.listdir(q)) == 1
    assert read_quarantine(spark, q).count() == total2

    # CLI verb
    cli.main(["--master", "local[4]", "compact-quarantine", "--path", q,
              "--keep-recent", "0"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["dirs_compacted"] >= 1
    assert read_quarantine(spark, q).count() == total2
    assert sum(n.startswith("qpart=") for n in os.listdir(q)) == 0


def test_compact_min_delta_files_defers_fold(spark, tmpdir_path):
    """min_delta_files defers delta folding until enough deltas accumulate;
    base fragmentation and delta depth are independent thresholds; reads
    stay correct at any delta depth."""
    from embulk_filter_copy_spark.cdc.apply import apply_batch

    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), REPO_FILES_SCHEMA,
        key_columns=["repo", "path"], n_buckets=2,
    )
    ddl = ("lsn long, ts timestamp, op string, repo string, path string,"
           " commit string, lang string, content string, schema_change string")

    def ev(lsn, path):
        return spark.createDataFrame(
            [(lsn, None, "U", "o/r", path, f"c{lsn}", "py", f"v{lsn}", None)], ddl)

    for e in range(2):  # 2 MOR epochs -> up to 2 deltas in the hot bucket
        apply_batch(t, ev(e + 1, "hot"), run_id="r", epoch=e, merge_mode="mor")
    n_deltas = sum(1 for f in t.files() if f.get("kind") == "delta")
    assert n_deltas >= 2
    rows_before = {(r["repo"], r["path"], r["content"])
                   for r in t.read().collect()}

    # threshold above the accumulated depth: nothing folds
    res = t.compact(max_files_per_bucket=8, min_delta_files=n_deltas + 1)
    assert res["buckets_compacted"] == []
    assert sum(1 for f in t.files() if f.get("kind") == "delta") == n_deltas

    # threshold reached: deltas fold, logical content unchanged
    res = t.compact(max_files_per_bucket=8, min_delta_files=n_deltas)
    assert res["buckets_compacted"] != []
    assert sum(1 for f in t.files() if f.get("kind") == "delta") == 0
    assert {(r["repo"], r["path"], r["content"])
            for r in t.read().collect()} == rows_before


def test_bootstrap_snapshot_lsn_guards_partial_wal(spark, tmpdir_path, capsys):
    """The snapshot+catch-up dance: a snapshot taken at WAL position L,
    replayed against a partial tail that overlaps it, must not regress a
    key to a pre-snapshot state. Stamping _lsn=L makes stragglers with
    lsn <= L lose to the merge guard; the historical _lsn=0 stamp is only
    correct when the WAL holds the full history."""
    from embulk_filter_copy_spark.cdc.apply import apply_batch
    from embulk_filter_copy_spark.cli import main as cli_main

    ddl = ("lsn long, ts timestamp, op string, repo string, path string,"
           " commit string, lang string, content string, schema_change string")
    # snapshot at L=10 reflects lsn-7 state "v7"; the available WAL tail
    # only reaches back to lsn 5 — replaying its lsn-5 event must lose
    snap = spark.createDataFrame(
        [("o/r", "p", "c7", "py", "v7")],
        "repo string, path string, commit string, lang string, content string",
    )
    snap_path = os.path.join(tmpdir_path, "snap")
    snap.write.parquet(snap_path)
    tpath = os.path.join(tmpdir_path, "t")
    cli_main(["--master", "local[4]", "bootstrap", "--table", tpath,
              "--snapshot", snap_path, "--buckets", "4",
              "--snapshot-lsn", "10"])
    t = LakeTable.load(spark, tpath)
    tail = spark.createDataFrame(
        [(5, None, "U", "o/r", "p", "c5", "py", "v5-stale", None),
         (12, None, "U", "o/r", "p", "c12", "py", "v12", None)], ddl)
    apply_batch(t, tail, run_id="r", epoch=0)
    row = t.read().collect()[0]
    assert row["content"] == "v12"  # straggler lost, post-snapshot applied
    meta = t.read(include_meta=True).collect()[0]
    assert meta["_lsn"] == 12
    # counter-example guard: an _lsn=0 bootstrap WOULD have taken the
    # straggler if it were the only event (documenting why the stamp matters)
    t0path = os.path.join(tmpdir_path, "t0")
    cli_main(["--master", "local[4]", "bootstrap", "--table", t0path,
              "--snapshot", snap_path, "--buckets", "4"])
    t0 = LakeTable.load(spark, t0path)
    apply_batch(t0, tail.filter("lsn = 5"), run_id="r", epoch=0)
    assert t0.read().collect()[0]["content"] == "v5-stale"


def test_compact_quarantine_true_crash_window_heals(spark, tmpdir_path):
    """THE crash window: the compacted dir was renamed into place but the
    crash hit before the sources were swept. The review-found failure mode:
    a digest over the literal dir listing sees its own output, computes a
    fresh digest, and re-folds everything — doubling every row. The
    transitive-source-manifest digest recomputes the SAME target, skips
    the fold, and only sweeps."""
    import shutil as _sh
    from unittest import mock

    import pytest as _pytest

    from embulk_filter_copy_spark.cdc.apply import (
        compact_quarantine,
        read_quarantine,
        write_quarantine,
    )

    q = os.path.join(tmpdir_path, "quar")
    os.makedirs(q)
    for epoch in range(4):
        write_quarantine(spark.range(5).selectExpr("id"), q, "r", epoch, "s")
    assert read_quarantine(spark, q).count() == 20

    real_rmtree = _sh.rmtree

    def crash_on_sweep(path, **kw):
        if "qpart=" in str(path):
            raise RuntimeError("injected crash during source sweep")
        return real_rmtree(path, **kw)

    with mock.patch("shutil.rmtree", side_effect=crash_on_sweep):
        with _pytest.raises(RuntimeError, match="injected crash"):
            compact_quarantine(spark, q, keep_recent=0)
    # the window: target present, all sources linger
    assert sum(e.startswith("qcompact=") for e in os.listdir(q)) == 1
    assert sum(e.startswith("qpart=") for e in os.listdir(q)) == 4

    res = compact_quarantine(spark, q, keep_recent=0)
    assert read_quarantine(spark, q).count() == 20  # healed, NOT 40
    dirs = [e for e in os.listdir(q) if not e.startswith(".")]
    assert dirs == [os.path.basename(res["out"])]

    # two-round manifest transitivity: new epochs + the healed compact
    for epoch in range(4, 6):
        write_quarantine(spark.range(5).selectExpr("id"), q, "r", epoch, "s")
    compact_quarantine(spark, q, keep_recent=0)
    assert read_quarantine(spark, q).count() == 30
    assert sum(e.startswith("qcompact=") for e in os.listdir(q)) == 1


def test_bootstrap_snapshot_lsn_advances_change_feed_watermark(spark, tmpdir_path, capsys):
    """The bootstrap commit must carry the stamped lsn bounds: after a
    bucket rewrite (copy-on-write re-adds the unchanged bootstrap rows),
    read_changes since the bootstrap version must emit ONLY the real
    change, not the re-added bootstrap rows (review-found invariant)."""
    from embulk_filter_copy_spark.cdc.apply import apply_batch
    from embulk_filter_copy_spark.cli import main as cli_main

    snap = spark.createDataFrame(
        [("o/r", f"p{i}", f"c{i}", "py", f"v{i}") for i in range(8)],
        "repo string, path string, commit string, lang string, content string",
    )
    snap_path = os.path.join(tmpdir_path, "snap")
    snap.write.parquet(snap_path)
    tpath = os.path.join(tmpdir_path, "t")
    cli_main(["--master", "local[4]", "bootstrap", "--table", tpath,
              "--snapshot", snap_path, "--buckets", "2",
              "--snapshot-lsn", "10"])
    t = LakeTable.load(spark, tpath)
    v0 = t.current_version()
    assert t.high_lsn() == 10  # the commit records the stamp
    ddl = ("lsn long, ts timestamp, op string, repo string, path string,"
           " commit string, lang string, content string, schema_change string")
    # one real change: its COW bucket rewrite re-adds that bucket's
    # unchanged bootstrap rows to the new snapshot's file set
    apply_batch(
        t,
        spark.createDataFrame(
            [(12, None, "U", "o/r", "p0", "c12", "py", "v12", None)], ddl),
        run_id="r", epoch=0,
    )
    feed = t.read_changes(v0).collect()
    assert [(r["path"], r["lsn"], r["op"]) for r in feed] == [("p0", 12, "U")]


def test_compact_quarantine_crash_then_new_epochs_no_double_fold(spark, tmpdir_path):
    """The second-order crash window (review round 2): after a crash
    mid-sweep, NEW qpart dirs arrive before the heal, shifting the digest —
    the covered leftovers must be swept WITHOUT being re-read (their rows
    already live in the crashed run's compacted dir), or every covered row
    doubles permanently. Also pins the manifest trim: a completed
    compaction's _SRC holds only its own name."""
    import shutil as _sh
    from unittest import mock

    import pytest as _pytest

    from embulk_filter_copy_spark.cdc.apply import (
        compact_quarantine,
        read_quarantine,
        write_quarantine,
    )

    q = os.path.join(tmpdir_path, "quar")
    os.makedirs(q)
    for epoch in range(4):
        write_quarantine(spark.range(5).selectExpr("id"), q, "r", epoch, "s")

    real_rmtree = _sh.rmtree

    def crash_on_sweep(path, **kw):
        if "qpart=" in str(path):
            raise RuntimeError("injected crash during source sweep")
        return real_rmtree(path, **kw)

    with mock.patch("shutil.rmtree", side_effect=crash_on_sweep):
        with _pytest.raises(RuntimeError, match="injected crash"):
            compact_quarantine(spark, q, keep_recent=0)
    # new epochs land BEFORE the heal -> next digest differs from the
    # crashed run's
    for epoch in range(4, 6):
        write_quarantine(spark.range(5).selectExpr("id"), q, "r", epoch, "s")

    compact_quarantine(spark, q, keep_recent=0)
    assert read_quarantine(spark, q).count() == 30  # NOT 50
    dirs = [e for e in os.listdir(q) if not e.startswith(".")]
    assert len(dirs) == 1 and dirs[0].startswith("qcompact=")
    with open(os.path.join(q, dirs[0], "_SRC")) as fh:
        assert fh.read().strip() == dirs[0]  # manifest trimmed post-sweep


def test_compact_quarantine_protects_whole_inflight_epoch_group(spark, tmpdir_path):
    """Round-4 review finding: one epoch quarantining to MORE sinks than
    keep_recent used to get some of its dirs folded while the epoch was
    still in flight — the resume then re-created a folded dir and its rows
    doubled forever. keep_recent now protects (run, epoch) GROUPS per run,
    so every sink dir of an in-flight epoch survives, and the resume's
    overwrite stays idempotent."""
    import os

    from embulk_filter_copy_spark.cdc.apply import (
        compact_quarantine,
        read_quarantine,
        write_quarantine,
    )

    q = os.path.join(tmpdir_path, "quar")
    os.makedirs(q)
    mk = lambda n: spark.range(n).selectExpr("id", "cast(id as string) AS v")
    # a finished epoch 0, then an IN-FLIGHT epoch 1 fanning out to 3 sinks
    write_quarantine(mk(5), q, "run1", 0, "sinkA")
    for sink in ("sinkA", "sinkB", "sinkC"):
        write_quarantine(mk(7), q, "run1", 1, sink)
    total = read_quarantine(spark, q).count()

    res = compact_quarantine(spark, q, keep_recent=1)
    # epoch 1's THREE dirs are all protected (one group), epoch 0 folds
    assert res["dirs_compacted"] == 1
    assert sum(n.startswith("qpart=") for n in os.listdir(q)) == 3

    # the epoch resumes: every sink dir overwrites idempotently
    for sink in ("sinkA", "sinkB", "sinkC"):
        write_quarantine(mk(7), q, "run1", 1, sink)
    assert read_quarantine(spark, q).count() == total

    # epoch finishes, epoch 2 opens -> epoch 1 unprotects and folds once
    write_quarantine(mk(2), q, "run1", 2, "sinkA")
    compact_quarantine(spark, q, keep_recent=1)
    assert read_quarantine(spark, q).count() == total + 2

    # a second run's in-flight epoch is protected INDEPENDENTLY
    write_quarantine(mk(4), q, "run2", 0, "sinkA")
    res3 = compact_quarantine(spark, q, keep_recent=1)
    assert res3["dirs_compacted"] == 0  # both runs' latest groups protected
    assert read_quarantine(spark, q).count() == total + 2 + 4

    # protect_age=0: everything is considered idle and folds
    res4 = compact_quarantine(spark, q, keep_recent=1, protect_age=0.0)
    assert sum(n.startswith("qpart=") for n in os.listdir(q)) == 0
    assert read_quarantine(spark, q).count() == total + 2 + 4


# --- property: compaction preserves the quarantine row set ----------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def quarantine_op_sequences(draw):
    """Contract-respecting op sequences: per-run epochs open in order, only
    a run's LATEST epoch may be re-written (the resume shape), and
    compactions keep >= 1 recent group per run."""
    ops = []
    next_epoch = {"A": 0, "B": 0}
    n = draw(st.integers(2, 8))
    for _ in range(n):
        kind = draw(st.sampled_from(["write", "write", "write", "rewrite", "compact"]))
        run = draw(st.sampled_from(["A", "B"]))
        if kind == "write":
            sinks = draw(st.sets(st.sampled_from(["s1", "s2"]), min_size=1, max_size=2))
            ops.append(("write", run, next_epoch[run], sorted(sinks)))
            next_epoch[run] += 1
        elif kind == "rewrite" and next_epoch[run] > 0:
            e = next_epoch[run] - 1
            written = [o for o in ops if o[0] == "write" and o[1] == run and o[2] == e]
            if written:
                ops.append(("rewrite", run, e, written[0][3]))
        else:
            ops.append(("compact", draw(st.integers(1, 2))))
    return ops


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(quarantine_op_sequences())
def test_property_compaction_preserves_rows(spark, ops):
    """No interleaving of epoch writes, resume re-writes, and compactions
    may lose or duplicate a quarantined row — the invariant behind both
    round-4 and round-5 review findings on this component."""
    import shutil
    import tempfile

    from embulk_filter_copy_spark.cdc.apply import (
        compact_quarantine,
        read_quarantine,
        write_quarantine,
    )

    q = tempfile.mkdtemp(prefix="efc-quarprop-")
    try:
        expected: set = set()

        def rows_for(run, epoch, sink):
            return [(f"{run}-{epoch}-{sink}-{i}",) for i in range(3)]

        for op in ops:
            if op[0] in ("write", "rewrite"):
                _, run, epoch, sinks = op
                for s in sinks:
                    rows = rows_for(run, epoch, s)
                    write_quarantine(
                        spark.createDataFrame(rows, "marker string"),
                        q, run, epoch, s,
                    )
                    expected.update(r[0] for r in rows)
            else:
                compact_quarantine(spark, q, keep_recent=op[1])
        got = sorted(r["marker"] for r in read_quarantine(spark, q).collect())
        assert got == sorted(expected), (ops, got, sorted(expected))
    finally:
        shutil.rmtree(q, ignore_errors=True)
