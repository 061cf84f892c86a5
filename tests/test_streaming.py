"""M2: Structured-Streaming replay, exactly-once resume, quarantine."""

import os

from pyspark.sql import functions as F

from embulk_filter_copy_spark.cdc.replayer import replay_stream, run_id_for_checkpoint
from embulk_filter_copy_spark.fixtures import (
    REPO_FILES_SCHEMA,
    gen_change_events,
    gen_repo_files,
    replay_oracle,
)
from embulk_filter_copy_spark.lake.table import LakeTable

DDL = ("lsn long, ts timestamp, op string, repo string, path string,"
       " commit string, lang string, content string, schema_change string")


def write_event_log(ev, path, n_chunks=4):
    """Write the log as n_chunks sequential files (ascending lsn ranges) so
    the file stream's batches arrive in roughly LSN order, like a WAL tail."""
    bounds = ev.agg(F.min("lsn"), F.max("lsn")).collect()[0]
    lo, hi = bounds[0], bounds[1]
    span = (hi - lo + 1) / n_chunks
    for c in range(n_chunks):
        c_lo = lo + int(c * span)
        c_hi = lo + int((c + 1) * span) if c < n_chunks - 1 else hi + 1
        chunk = ev.filter((F.col("lsn") >= c_lo) & (F.col("lsn") < c_hi))
        chunk.coalesce(1).write.mode("append").parquet(path)


def _bootstrap(spark, tmpdir_path, n_base=150, seed=42):
    base = gen_repo_files(spark, n_base, seed=seed)
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "tbl"), REPO_FILES_SCHEMA,
        key_columns=["repo", "path"], n_buckets=8,
    )
    t.append(base.withColumn("_lsn", F.lit(0)))
    return t, base


def _parity(table, base, events_applied):
    golden = replay_oracle(base.toPandas(), events_applied.toPandas())
    got = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert len(got) == len(golden)
    gl = golden[["repo", "path", "content", "commit"]].reset_index(drop=True)
    gt = got[["repo", "path", "content", "commit"]].reset_index(drop=True)
    assert gt.equals(gl)


def test_streaming_replay_matches_oracle(spark, tmpdir_path):
    t, base = _bootstrap(spark, tmpdir_path)
    ev = gen_change_events(spark, 150, 800, seed=42, dup_rate=0.05)
    log = os.path.join(tmpdir_path, "log")
    write_event_log(ev, log, n_chunks=4)
    results = replay_stream(
        spark, log, os.path.join(tmpdir_path, "tbl"),
        checkpoint=os.path.join(tmpdir_path, "ckpt"),
        max_files_per_trigger=1,
    )
    assert len(results) >= 2  # several microbatch epochs
    _parity(t, base, ev)


def test_crash_resume_exactly_once(spark, tmpdir_path):
    t, base = _bootstrap(spark, tmpdir_path, seed=13)
    ev = gen_change_events(spark, 150, 600, seed=13, dup_rate=0.1)
    log = os.path.join(tmpdir_path, "log")
    write_event_log(ev, log, n_chunks=4)
    ckpt = os.path.join(tmpdir_path, "ckpt")

    replay_stream(spark, log, os.path.join(tmpdir_path, "tbl"),
                  checkpoint=ckpt, max_files_per_trigger=1, fail_after_epoch=1)
    v_after_crash = t.current_version()
    # restart from the same checkpoint — must complete and not double-apply
    replay_stream(spark, log, os.path.join(tmpdir_path, "tbl"),
                  checkpoint=ckpt, max_files_per_trigger=1)
    _parity(t, base, ev)
    # manifests unique per (run, epoch, seq)
    run_id = run_id_for_checkpoint(ckpt)
    commits = [(c["run_id"], c["epoch"], c["seq"]) for c in t.commits()]
    assert len(commits) == len(set(commits))
    assert all(c[0] == run_id for c in commits if c[0] != "bootstrap")
    assert t.current_version() > v_after_crash


def test_replayed_epoch_skipped_not_reapplied(spark, tmpdir_path):
    """Re-delivered microbatch (same epoch id) is a manifest no-op."""
    t, base = _bootstrap(spark, tmpdir_path, seed=21)
    ev = gen_change_events(spark, 150, 300, seed=21)
    log = os.path.join(tmpdir_path, "log")
    write_event_log(ev, log, n_chunks=2)
    ckpt = os.path.join(tmpdir_path, "ckpt")
    replay_stream(spark, log, os.path.join(tmpdir_path, "tbl"), checkpoint=ckpt)
    v = t.current_version()
    # second run: same checkpoint, no new files → no epochs, no commits
    replay_stream(spark, log, os.path.join(tmpdir_path, "tbl"), checkpoint=ckpt)
    assert t.current_version() == v


def test_quarantine_late_events(spark, tmpdir_path):
    t, base = _bootstrap(spark, tmpdir_path, n_base=50, seed=5)
    ev = gen_change_events(spark, 50, 200, seed=5, disorder_seconds=5)
    # inject one pathologically late event (1h older than the rest)
    late = spark.createDataFrame(
        [(9999, None, "I", "late/r", "p", "c", "py", "late-body", None)], DDL
    ).withColumn("ts", F.timestamp_seconds(F.lit(1_767_225_600 - 3600)))
    full = ev.unionByName(late)
    log = os.path.join(tmpdir_path, "log")
    full.coalesce(1).write.parquet(log)
    qpath = os.path.join(tmpdir_path, "quarantine")
    replay_stream(
        spark, log, os.path.join(tmpdir_path, "tbl"),
        checkpoint=os.path.join(tmpdir_path, "ckpt"),
        quarantine=(qpath, 600),
    )
    from embulk_filter_copy_spark.cdc.apply import read_quarantine

    q = read_quarantine(spark, qpath)
    assert q.count() == 1 and q.first()["repo"] == "late/r"
    assert t.read().filter("repo = 'late/r'").count() == 0
    _parity(t, base, ev)  # oracle over the non-late events only


def test_streaming_commit_records_exact_applied(spark, tmpdir_path):
    """Manifest rows_applied must equal the post-dedup (distinct-key) count,
    not the raw source count, even inside foreachBatch where Observation is
    unusable (round-1 gap: exact_applied=False approximated it)."""
    t, base = _bootstrap(spark, tmpdir_path, n_base=60, seed=9)
    ev = gen_change_events(spark, 60, 300, seed=9)
    log = os.path.join(tmpdir_path, "log")
    ev.coalesce(1).write.parquet(log)  # single chunk → one epoch
    replay_stream(spark, log, os.path.join(tmpdir_path, "tbl"),
                  checkpoint=os.path.join(tmpdir_path, "ckpt"))
    commits = [c for c in t.commits() if c.get("run_id") != "__compaction__"
               and c.get("rows_source") is not None]
    assert len(commits) == 1
    expect = ev.filter("op != 'S'").select("repo", "path").distinct().count()
    assert commits[0]["rows_applied"] == expect
    # rows_source counts events AFTER the stream's exact-redelivery drop
    # (dropDuplicatesWithinWatermark on keys+lsn)
    assert commits[0]["rows_source"] == (
        ev.filter("op != 'S'").select("repo", "path", "lsn").distinct().count()
    )
    assert commits[0]["rows_applied"] <= commits[0]["rows_source"]


def test_all_late_batch_quarantined_via_high_water_mark(spark, tmpdir_path):
    """A batch consisting ENTIRELY of late events must still quarantine:
    the threshold derives from the table-level max-event-time high-water
    mark (commit manifests), not only the batch's own max ts."""
    from embulk_filter_copy_spark.cdc.apply import apply_batch

    t, base = _bootstrap(spark, tmpdir_path, n_base=50, seed=7)
    ev = gen_change_events(spark, 50, 200, seed=7)
    qpath = os.path.join(tmpdir_path, "q")
    # epoch 0: normal events — establishes the ts high-water mark
    r0 = apply_batch(t, ev, run_id="hwm", epoch=0, quarantine=(qpath, 600))
    assert r0["quarantined"] == 0 and t.high_ts() is not None
    # epoch 1: every event 2h older than the HWM → all quarantined
    late = ev.withColumn("ts", F.col("ts") - F.expr("INTERVAL 2 HOURS")).withColumn(
        "lsn", F.col("lsn") + F.lit(10_000_000)
    )
    r1 = apply_batch(t, late, run_id="hwm", epoch=1, quarantine=(qpath, 600))
    assert r1["quarantined"] == late.count()
    assert r1["rows_applied"] == 0


def test_null_ts_event_survives_quarantine_split(spark, tmpdir_path):
    """A NULL event time is 'unorderable', not 'late': both `< threshold`
    and `>= threshold` evaluate to NULL for it, so a bare >= data filter
    silently dropped the row from BOTH branches — neither merged nor
    quarantined (CDC data loss). It must flow to the merge side; LSN
    ordering (the real merge key) still governs it."""
    from embulk_filter_copy_spark.cdc.apply import apply_batch, read_quarantine

    t, base = _bootstrap(spark, tmpdir_path, n_base=30, seed=15)
    ev = gen_change_events(spark, 30, 100, seed=15)
    extra = spark.createDataFrame(
        [
            (9_999_998, None, "I", "late/r", "p", "c", "py", "late-body", None),
            (9_999_999, None, "I", "null-ts/r", "p", "c", "py", "null-ts-body", None),
        ],
        DDL,
    )
    # one genuinely-late row (triggers the quarantine re-filter) + one NULL-ts row
    extra = extra.withColumn(
        "ts",
        F.when(F.col("repo") == "late/r",
               F.timestamp_seconds(F.lit(1_767_225_600 - 7200))),
    )
    qpath = os.path.join(tmpdir_path, "q")
    r = apply_batch(t, ev.unionByName(extra), run_id="nts", epoch=0,
                    quarantine=(qpath, 600))
    assert r["quarantined"] == 1
    assert read_quarantine(spark, qpath).first()["repo"] == "late/r"
    assert t.read().filter("repo = 'null-ts/r'").count() == 1
    assert t.read().filter("repo = 'late/r'").count() == 0


def test_read_quarantine_tolerates_legacy_flat_layout(spark, tmpdir_path):
    """A quarantine root carrying BOTH pre-upgrade flat part files and the
    current per-(run,epoch,sink) `qpart=` subdirectories must stay readable:
    partition discovery raises 'conflicting directory structures' on mixed
    depths, so read_quarantine uses recursiveFileLookup instead."""
    from embulk_filter_copy_spark.cdc.apply import read_quarantine, write_quarantine

    qpath = os.path.join(tmpdir_path, "q")
    legacy = spark.createDataFrame(
        [(1, None, "I", "old/r", "p", "c", "py", "b", None)], DDL
    )
    legacy.coalesce(1).write.mode("append").parquet(qpath)  # old flat layout
    fresh = spark.createDataFrame(
        [(2, None, "I", "new/r", "p", "c", "py", "b", None)], DDL
    )
    write_quarantine(fresh, qpath, "run", 0, "sinkA")
    got = read_quarantine(spark, qpath)
    assert {r["repo"] for r in got.collect()} == {"old/r", "new/r"}
    assert "qpart" not in got.columns


def test_partial_sink_failure_resumes_only_missing_sink(spark, tmpdir_path):
    """Concurrent fan-out + per-sink manifests: if one sink's merge job
    fails after a sibling committed, the restart must skip the committed
    sink and apply only the missing one (the reference's committed-task
    skip, ReuseInputExecutorPlugin.scala:61-64, distributed)."""
    import pytest

    from embulk_filter_copy_spark.cdc.splitter import SinkSpec, register_transform
    from embulk_filter_copy_spark.fixtures import replay_oracle

    flag = os.path.join(tmpdir_path, "boom-flag")
    open(flag, "w").close()

    @register_transform("boom_if_flag")
    def _boom(df):
        def op(it):
            for pdf in it:
                if os.path.exists(flag):
                    raise RuntimeError("injected sink failure")
                yield pdf
        return df.mapInPandas(op, schema=df.schema)

    base = gen_repo_files(spark, 80, seed=31)
    ev = gen_change_events(spark, 80, 300, seed=31)
    log = os.path.join(tmpdir_path, "log")
    ev.coalesce(1).write.parquet(log)

    tables = {}
    sinks = []
    for name, tr in (("good", ()), ("bad", (("pandas", "boom_if_flag"),))):
        pth = os.path.join(tmpdir_path, name)
        t = LakeTable.create(spark, pth, REPO_FILES_SCHEMA,
                             key_columns=["repo", "path"], n_buckets=4)
        t.append(base.withColumn("_lsn", F.lit(0)))
        tables[name] = t
        sinks.append(SinkSpec(name=name, path=pth, transforms=tr))
    ckpt = os.path.join(tmpdir_path, "ckpt")
    with pytest.raises(Exception):  # bad sink's merge job raises
        replay_stream(spark, log, sinks, checkpoint=ckpt)
    good, bad = tables["good"], tables["bad"]
    v_good = good.current_version()
    assert v_good > 2      # good sink committed its merge before the epoch failed
    assert bad.current_version() == 2  # bootstrap only — merge never committed

    os.remove(flag)  # "fix" the sink, restart from the same checkpoint
    results = replay_stream(spark, log, sinks, checkpoint=ckpt)
    # epoch 0 is redelivered on restart (availableNow may add an empty tail
    # epoch afterwards — ignore it)
    by_sink = {r["sink"]: r for r in results if r["epoch"] == 0}
    assert by_sink["good"].get("skipped") is True   # manifest skip, no rework
    assert by_sink["bad"].get("skipped") is not True
    assert good.current_version() == v_good          # untouched on resume
    golden = replay_oracle(base.toPandas(), ev.toPandas())
    for t in (good, bad):
        got = t.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
        assert len(got) == len(golden)
        assert got[["repo", "path", "content"]].equals(
            golden[["repo", "path", "content"]].reset_index(drop=True))


def test_all_late_epoch_gated_on_redelivery(spark, tmpdir_path):
    """A fully-quarantined epoch must still write its epoch-done manifest:
    an at-least-once redelivery would otherwise re-append the same late
    rows to the quarantine path."""
    from embulk_filter_copy_spark.cdc.apply import apply_batch

    t, base = _bootstrap(spark, tmpdir_path, n_base=40, seed=11)
    ev = gen_change_events(spark, 40, 150, seed=11)
    qpath = os.path.join(tmpdir_path, "q")
    apply_batch(t, ev, run_id="late", epoch=0, quarantine=(qpath, 600))
    late = ev.withColumn("ts", F.col("ts") - F.expr("INTERVAL 3 HOURS")).withColumn(
        "lsn", F.col("lsn") + F.lit(10_000_000))
    r1 = apply_batch(t, late, run_id="late", epoch=1, quarantine=(qpath, 600))
    assert r1["quarantined"] == late.count()
    from embulk_filter_copy_spark.cdc.apply import read_quarantine

    n_quarantined = read_quarantine(spark, qpath).count()
    # redeliver the same epoch: manifest skip, quarantine unchanged
    r2 = apply_batch(t, late, run_id="late", epoch=1, quarantine=(qpath, 600))
    assert r2.get("skipped") is True
    assert read_quarantine(spark, qpath).count() == n_quarantined


def test_multi_sink_quarantine_shared_path(spark, tmpdir_path):
    """Two concurrent sinks quarantining into ONE path: each (sink, epoch)
    writes its own deterministic directory (no shared _temporary/, no lock
    — safe even across separate driver processes), and each sink
    contributes its copy of the late rows."""
    from embulk_filter_copy_spark.cdc.splitter import SinkSpec

    base = gen_repo_files(spark, 40, seed=17)
    ev = gen_change_events(spark, 40, 150, seed=17)
    one_late = spark.createDataFrame(
        [(99999, None, "I", "late/r", "p", "c", "py", "late", None)], DDL
    ).withColumn("ts", F.timestamp_seconds(F.lit(1_767_225_600 - 7200)))
    full = ev.unionByName(one_late)
    log = os.path.join(tmpdir_path, "log")
    full.coalesce(1).write.parquet(log)
    sinks = []
    for name in ("s1", "s2"):
        pth = os.path.join(tmpdir_path, name)
        t = LakeTable.create(spark, pth, REPO_FILES_SCHEMA,
                             key_columns=["repo", "path"], n_buckets=4)
        t.append(base.withColumn("_lsn", F.lit(0)))
        sinks.append(SinkSpec(name=name, path=pth))
    qpath = os.path.join(tmpdir_path, "q")
    results = replay_stream(
        spark, log, sinks, checkpoint=os.path.join(tmpdir_path, "ck"),
        quarantine=(qpath, 600),
    )
    from embulk_filter_copy_spark.cdc.apply import read_quarantine

    q = read_quarantine(spark, qpath)
    # one late row, quarantined once per sink (each sink applies its own
    # transformed batch), all rows intact
    assert q.count() == 2 and q.filter("repo = 'late/r'").count() == 2
    for name in ("s1", "s2"):
        t = LakeTable.load(spark, os.path.join(tmpdir_path, name))
        assert t.read().filter("repo = 'late/r'").count() == 0


def test_quarantine_write_is_idempotent_per_epoch(spark, tmpdir_path):
    """The crash window the old append could not survive: a rerun of the
    SAME (run, epoch, sink) quarantine write (crash after the write, before
    the epoch commit) must overwrite, not duplicate — and a DIFFERENT epoch
    must land beside it."""
    from embulk_filter_copy_spark.cdc.apply import read_quarantine, write_quarantine

    late = gen_change_events(spark, 10, 20, seed=23)
    qpath = os.path.join(tmpdir_path, "q")
    write_quarantine(late, qpath, "r1", 1, "sinkaaaa")
    write_quarantine(late, qpath, "r1", 1, "sinkaaaa")  # replayed epoch
    assert read_quarantine(spark, qpath).count() == late.count()
    write_quarantine(late, qpath, "r1", 2, "sinkaaaa")  # next epoch
    assert read_quarantine(spark, qpath).count() == 2 * late.count()


def test_quarantine_unchanged_across_injected_crash_resume(spark, tmpdir_path):
    """Streaming crash + restart with quarantine enabled: the redelivered
    epoch is manifest-skipped and the quarantine row count is unchanged."""
    from embulk_filter_copy_spark.cdc.apply import read_quarantine

    t, base = _bootstrap(spark, tmpdir_path, n_base=40, seed=29)
    ev = gen_change_events(spark, 40, 150, seed=29)
    one_late = spark.createDataFrame(
        [(99999, None, "I", "late/r", "p", "c", "py", "late", None)], DDL
    ).withColumn("ts", F.timestamp_seconds(F.lit(1_767_225_600 - 7200)))
    log = os.path.join(tmpdir_path, "log")
    ev.unionByName(one_late).coalesce(1).write.parquet(log)
    qpath = os.path.join(tmpdir_path, "q")
    ck = os.path.join(tmpdir_path, "ck")
    replay_stream(spark, log, os.path.join(tmpdir_path, "tbl"), checkpoint=ck,
                  quarantine=(qpath, 600), fail_after_epoch=0)
    n_q = read_quarantine(spark, qpath).count()
    assert n_q >= 1
    res = replay_stream(spark, log, os.path.join(tmpdir_path, "tbl"),
                        checkpoint=ck, quarantine=(qpath, 600))
    assert read_quarantine(spark, qpath).count() == n_q
    assert all(r.get("skipped") or r["rows_applied"] == 0 for r in res)


def test_history_sink_mode_alongside_merge_sink(spark, tmpdir_path):
    """One stream feeding the current-state MERGE sink and an SCD2 history
    sink in the same fan-out tree: the merge sink lands the oracle's final
    state while the history sink keeps EVERY version (shared per-key dedup
    must NOT kick in — it would erase the history's intermediate rows)."""
    from embulk_filter_copy_spark.cdc.history import (
        create_history_table,
        read_history,
        scd2_history,
    )
    from embulk_filter_copy_spark.cdc.splitter import SinkSpec

    t, base = _bootstrap(spark, tmpdir_path, n_base=100, seed=77)
    ev = gen_change_events(spark, 100, 500, seed=77, dup_rate=0.1)
    log = os.path.join(tmpdir_path, "log")
    write_event_log(ev, log, n_chunks=3)

    hpath = os.path.join(tmpdir_path, "hist")
    htable = create_history_table(
        spark, hpath,
        [(f, ty) for f, ty in REPO_FILES_SCHEMA],
        key_cols=["repo", "path"], n_buckets=4,
    )
    sinks = [
        SinkSpec(name="state", path=os.path.join(tmpdir_path, "tbl")),
        SinkSpec(name="audit", path=hpath, mode="history"),
    ]
    results = replay_stream(
        spark, log, sinks,
        checkpoint=os.path.join(tmpdir_path, "ckpt"),
        max_files_per_trigger=1,
    )
    assert any(r.get("rows_appended") for r in results)
    # merge sink: final-state parity with the pandas oracle
    _parity(t, base, ev)
    # history sink: equal to the one-shot SCD2 operator over the SAME log
    # (transport duplicates collapse per (key, lsn) first — the operator's
    # documented precondition)
    data = ev.filter("op <> 'S'")
    uniq = data.groupBy("repo", "path", "lsn").agg(
        F.max_by(F.struct("commit", "lang", "content", "op"), "lsn").alias("w")
    ).select("repo", "path", "lsn", "w.*")
    want = scd2_history(uniq.select("repo", "path", "lsn", "commit", "lang", "content", "op"),
                        ["repo", "path"])
    got = read_history(htable)
    cols = ["repo", "path", "commit", "valid_from_lsn", "valid_to_lsn", "is_current"]
    assert sorted(map(tuple, got.select(*cols).collect())) == \
        sorted(map(tuple, want.select(*cols).collect()))
    # restart with a finished checkpoint: no new versions, no new commits
    v = htable.current_version()
    replay_stream(spark, log, sinks,
                  checkpoint=os.path.join(tmpdir_path, "ckpt"),
                  max_files_per_trigger=1)
    assert htable.current_version() == v
