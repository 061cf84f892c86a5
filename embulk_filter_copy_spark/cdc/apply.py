"""Batch applier: LWW dedup → schema-change sequencing → bucketed MERGE →
atomic commit manifest + per-partition lineage.

This is the engine's analogue of the reference's staged transaction
(BreakinBulkLoader.scala:116-142 runInput→runFilters→runExecutor→runOutput→
execute): each microbatch epoch runs
    dedup → [DDL | merge]* → epoch-done manifest
with every unit individually idempotent, so a crash anywhere inside an epoch
resumes without duplicating work — the distributed, durable version of the
reference's committed-task skip (ReuseInputExecutorPlugin.scala:61-64).

MERGE strategy (copy-on-write, Iceberg-style):
  * the deduped batch is bucketed by pmod(xxhash64(repo, path), n_buckets);
  * only buckets PRESENT in the batch are read back from the target
    (manifest-level file pruning — at 100 TB a small batch touches a tiny
    fraction of files);
  * a full-outer join per key decides each row: source wins iff
    ``s.lsn >= t._lsn`` (the LSN guard — defense-in-depth idempotence:
    re-applying an epoch rewrites identical rows);
  * deletes become tombstones (``_deleted=true``) so a late lower-LSN insert
    can never resurrect a deleted row across out-of-order batches;
  * the join is co-partitioned: both sides are hash-distributed by the same
    bucket function, and AQE splits residual skew.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from embulk_filter_copy_spark.cdc.dedup import dedup_events
from embulk_filter_copy_spark.lake.schema import spark_type
from embulk_filter_copy_spark.lake.table import LakeTable

EPOCH_DONE_SEQ = -1


def quarantine_dir(qpath: str, run_id: str, epoch: int, sink_id: str) -> str:
    """Deterministic per-(run, epoch, sink) partition directory under the
    shared quarantine root. ``qpart=`` naming makes the root readable as one
    partitioned parquet dataset (:func:`read_quarantine`)."""
    return os.path.join(qpath, f"qpart={run_id}-e{epoch}-{sink_id}")


def write_quarantine(
    late: DataFrame, qpath: str, run_id: str, epoch: int, sink_id: str
) -> None:
    """Write late rows to their own deterministic directory with OVERWRITE:

    * idempotent on epoch replay — a crash between the quarantine write and
      the epoch commit re-runs into the SAME directory instead of appending
      duplicates;
    * safe for concurrent writers in SEPARATE PROCESSES — each (sink, epoch)
      owns its directory, so no two Spark jobs ever share a ``_temporary/``
      staging dir. (The previous shared-append design serialized appends
      with an in-process lock, which a second driver process could not see.)
    """
    late.write.mode("overwrite").parquet(quarantine_dir(qpath, run_id, epoch, sink_id))


def read_quarantine(spark, qpath: str) -> DataFrame:
    """All quarantined rows across runs/epochs/sinks. ``recursiveFileLookup``
    reads the data files at ANY directory depth — the current ``qpart=``
    layout, a pre-upgrade flat-append layout, or a mix of both (partition
    discovery would raise 'conflicting directory structures' on the mix);
    it disables partition-column inference, so the synthetic ``qpart``
    column never materializes (the drop is a compatibility no-op).

    An empty or missing quarantine root (a healthy pipeline, or one whose
    compactions all folded away) returns an empty zero-column frame instead
    of failing schema inference — inspection and redrive on a clean stream
    must be a no-op, not a crash."""
    has_files = os.path.isdir(qpath) and any(
        f.endswith(".parquet") for _, _, files in os.walk(qpath) for f in files
    )
    if not has_files:
        from pyspark.sql import types as T

        return spark.createDataFrame([], T.StructType([]))
    return (
        spark.read.option("recursiveFileLookup", "true").parquet(qpath).drop("qpart")
    )


def compact_quarantine(
    spark, qpath: str, keep_recent: int = 2, protect_age: float | None = None
) -> dict:
    """Fold accumulated per-(run, epoch, sink) quarantine directories into
    one compacted directory — the small-file GC for the quarantine root.

    Every epoch writes its late rows into its own ``qpart=`` dir (that
    isolation is what makes the write idempotent and multi-process-safe),
    so at 10^5 epochs the root is a directory bomb: one dir + one tiny
    file per (run, epoch, sink). This folds all but the ``keep_recent``
    most-recent (run, epoch) GROUPS *per run* (those may still be replayed
    into by an in-flight or crash-resumed epoch) into a single
    ``qcompact=`` dir with one file per shuffle partition.

    The keep-recent unit is the (run_id, epoch) group, not the directory:
    one epoch fanning out to N sinks writes N qpart dirs with near-equal
    mtimes, and folding ANY of them while the epoch is in flight would let
    the resume re-create a dir the compaction already swallowed (its rows
    would then be read twice forever once the ``_SRC`` trim forgot it).
    Grouping per run is the durable in-flight signal available without the
    sink tables: a replay cannot advance past an uncommitted epoch, so only
    a run's most recent epoch(s) can ever be re-written. Dirs whose name
    predates the group format fall back to per-dir recency.

    Idempotent under crash-resume: the target name is a DIGEST of the
    TRANSITIVE original-source set — each ``qcompact=`` dir records the
    ``qpart=`` names it covers in a ``_SRC`` manifest (underscore-prefixed,
    so every Spark reader treats it as hidden), and folding a prior
    compacted dir unions its manifest instead of hashing its own name. A
    re-run after a crash between the atomic rename and the source deletes
    therefore recomputes the SAME target name (the leftover sources are a
    subset of what the new dir already covers), finds it present, skips
    the write, and only sweeps the leftovers — rows are never duplicated.
    (Hashing the literal dir listing — the naive digest — breaks exactly
    there: the crashed run's own output joins the listing and yields a
    fresh digest that re-folds everything, doubling every row.) Until the
    re-run sweeps them, a reader sees the subsumed sources twice; the
    compaction heals, it does not widen, that pre-existing crash window.
    ``read_quarantine`` reads pre-compaction, post-compaction and mixed
    layouts identically (recursive file lookup).
    """
    import hashlib
    import shutil

    def covered(entry: str) -> set[str]:
        # a compacted dir's identity is the qpart set it folded; legacy
        # dirs without a manifest fall back to their own name
        src_file = os.path.join(qpath, entry, "_SRC")
        if os.path.exists(src_file):
            with open(src_file) as fh:
                return set(fh.read().split())
        return {entry}

    import re

    def group(entry: str):
        # (run_id, epoch) of the dir, or the dir itself for legacy names
        m = re.match(r"qpart=(.+)-e(-?\d+)-[^-]+$", entry)
        return (m.group(1), int(m.group(2))) if m else (entry, None)

    qparts = sorted(
        e for e in os.listdir(qpath)
        if e.startswith("qpart=") and os.path.isdir(os.path.join(qpath, e))
    )
    if keep_recent > 0:
        groups: dict = {}
        for e in qparts:
            groups.setdefault(group(e), []).append(e)
        g_mtime = {
            g: max(os.path.getmtime(os.path.join(qpath, e)) for e in es)
            for g, es in groups.items()
        }
        protected: set = set()
        by_run: dict = {}
        for g in groups:
            by_run.setdefault(g[0], []).append(g)
        for gs in by_run.values():
            gs.sort(key=lambda g: g_mtime[g])
            protected.update(gs[-keep_recent:])
        if protect_age is not None:
            # operator knob for long-finished runs: a protected group older
            # than this (seconds since last write) is folded anyway —
            # without it, every finished run parks keep_recent dirs in the
            # root forever. Choose it >> the longest plausible crash-resume
            # lag: a resume later than that re-creates a folded qpart dir,
            # whose rows the next fold would double permanently (hence the
            # conservative default of None = protect indefinitely).
            now = time.time()
            protected = {g for g in protected if now - g_mtime[g] < protect_age}
        qparts = [e for e in qparts if group(e) not in protected]
    # prior compacted dirs fold in too, so repeated compactions keep the
    # root at ONE compacted dir instead of one per compaction run
    old = [
        e for e in os.listdir(qpath)
        if e.startswith("qcompact=") and os.path.isdir(os.path.join(qpath, e))
    ]
    entries = sorted(qparts + old)
    if not qparts:  # nothing new to fold — don't rewrite the compacted dir
        return {"dirs_compacted": 0, "rows": 0, "out": None}
    cov_map = {e: covered(e) for e in old}
    transitive: set[str] = set(qparts)
    for s in cov_map.values():
        transitive |= s
    # an entry whose NAME appears in another compacted dir's manifest is a
    # crash leftover whose rows that dir already holds — it must be swept
    # but NEVER re-read, or its rows double the moment NEW qparts arrive
    # and shift the digest (the naive fix of hashing transitively but
    # reading everything re-introduced exactly that)
    covered_elsewhere: set[str] = set()
    for e, s in cov_map.items():
        covered_elsewhere |= s - {e}
    digest = hashlib.sha1("\n".join(sorted(transitive)).encode()).hexdigest()[:12]
    out = os.path.join(qpath, f"qcompact={digest}")
    rows = 0
    if not os.path.exists(out):
        src = [
            os.path.join(qpath, e) for e in entries if e not in covered_elsewhere
        ]
        df = (
            spark.read.option("recursiveFileLookup", "true")
            .option("mergeSchema", "true")
            .parquet(*src)
        )
        tmp = os.path.join(qpath, f".tmp-qcompact-{digest}")
        shutil.rmtree(tmp, ignore_errors=True)
        df.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_SRC"), "w") as fh:
            fh.write("\n".join(sorted(transitive)))
        os.rename(tmp, out)
        rows = spark.read.parquet(out).count()
    swept = 0
    for e in entries:
        if os.path.join(qpath, e) != out:
            shutil.rmtree(os.path.join(qpath, e), ignore_errors=True)
            swept += 1
    # sweep complete: trim the manifest to the dir's own identity plus any
    # covered name STILL PRESENT in the root (a failed sweep, or an
    # in-flight epoch re-creating its dir between fold and trim) —
    # retaining those keeps their re-created rows excluded from future
    # folds (covered_elsewhere) instead of double-counting them. Names
    # confirmed absent drop, so _SRC doesn't accumulate one line per qpart
    # EVER folded (10^5-epoch roots would rewrite and re-hash a multi-MB
    # manifest per run). A crash before the trim leaves the fat manifest,
    # which is only ever over-inclusive, never wrong.
    still_present = transitive & set(os.listdir(qpath))
    trim = os.path.join(qpath, ".tmp-src")
    with open(trim, "w") as fh:
        fh.write("\n".join(sorted({os.path.basename(out)} | still_present)))
    os.replace(trim, os.path.join(out, "_SRC"))
    return {"dirs_compacted": swept, "rows": rows, "out": out}


def _sink_id(table: LakeTable) -> str:
    import hashlib

    return hashlib.sha1(table.path.encode()).hexdigest()[:8]


def _ts_epoch(col: str = "ts") -> F.Column:
    """Event time as epoch seconds, computed JVM-side. The double cast goes
    through TIMESTAMP because TIMESTAMP_NTZ (what plain parquet event logs
    read back as) cannot cast to double directly; the session timezone is
    pinned to UTC (session.py), so the NTZ→TZ interpretation is stable."""
    return F.col(col).cast("timestamp").cast("double")


def _batch_stats(table: LakeTable, batch: DataFrame, lsn_col: str) -> tuple[dict, list[dict]]:
    """One job: per-partition lineage + global stats + affected buckets."""
    rows = (
        batch.withColumn("_pid", F.spark_partition_id())
        .withColumn("_bucket", table.bucket_expr())
        .groupBy("_pid")
        .agg(
            F.min(lsn_col).alias("lsn_min"),
            F.max(lsn_col).alias("lsn_max"),
            F.count(F.lit(1)).alias("rows"),
            F.collect_set("_bucket").alias("buckets"),
            # epoch seconds computed IN the aggregation: collecting a
            # timestamp yields a naive datetime in the session tz whose
            # .timestamp() the OS tz would reinterpret — skewing the
            # quarantine high-water mark by the tz delta
            F.max(_ts_epoch()).alias("ts_max"),
        )
        .collect()
    )
    if not rows:
        return {"rows": 0, "lsn_min": None, "lsn_max": None, "buckets": [], "ts_max": None}, []
    buckets = sorted({b for r in rows for b in r["buckets"]})
    stats = {
        "rows": sum(r["rows"] for r in rows),
        "lsn_min": min(r["lsn_min"] for r in rows),
        "lsn_max": max(r["lsn_max"] for r in rows),
        "buckets": buckets,
        "ts_max": max((r["ts_max"] for r in rows if r["ts_max"] is not None), default=None),
    }
    lineage = [
        {
            "partition_id": r["_pid"],
            "lsn_min": r["lsn_min"],
            "lsn_max": r["lsn_max"],
            "rows": r["rows"],
        }
        for r in rows
    ]
    return stats, lineage


def build_merge(
    table: LakeTable,
    deduped: DataFrame,
    buckets: list[int],
    lsn_col: str = "lsn",
    op_col: str = "op",
) -> DataFrame:
    """The copy-on-write MERGE plan (unexecuted): bucket-pruned target scan
    full-outer-joined with the per-key-unique batch, source winning iff
    ``lsn >= _lsn``. Exposed separately so tests can assert the physical
    plan (equi-join, no nested-loop) without writing."""
    keys = table.key_columns
    t = table.read(include_meta=True, buckets=buckets).alias("t")
    s = deduped.alias("s")
    cond = [t[k].eqNullSafe(s[k]) for k in keys]
    j = t.join(s, cond, "full_outer")

    reserved = {lsn_col, op_col, "ts", "schema_change", "_img_lsn", "_del_lsn"}
    src_cols = {
        c for c in deduped.columns
        if c not in reserved and not c.startswith("_pl_")
    }

    if "_img_lsn" in deduped.columns and "_del_lsn" in deduped.columns:
        return _merge_with_patch_info(
            table, deduped, j, t, s, keys, src_cols, lsn_col
        )

    src_wins = s[lsn_col].isNotNull() & (
        t["_lsn"].isNull() | (s[lsn_col] >= t["_lsn"])
    )
    # a patch-only source row (op='P' survives `dedup.fold_patches` when the
    # batch held no full image for the key) resolves per COLUMN against the
    # target: non-null patch columns override, nulls keep the target value —
    # and a patch can neither create a key nor resurrect a deleted one
    is_patch = s[op_col] == F.lit("P")

    out_cols = []
    for f in table.schema.fields:
        if f.name in keys:
            out_cols.append(F.coalesce(s[f.name], t[f.name]).alias(f.name))
        elif f.name in src_cols:
            out_cols.append(
                F.when(src_wins & is_patch, F.coalesce(s[f.name], t[f.name]))
                .when(src_wins, s[f.name])
                .otherwise(t[f.name])
                .alias(f.name)
            )
        else:
            # column unknown to the CDC envelope (added via schema evolution):
            # full-row-image update semantics → NULL when the source wins;
            # a patch leaves it untouched
            out_cols.append(
                F.when(src_wins & ~is_patch, F.lit(None).cast(spark_type(f.type)))
                .otherwise(t[f.name])
                .alias(f.name)
            )
    out_cols.append(F.when(src_wins, s[lsn_col]).otherwise(t["_lsn"]).alias("_lsn"))
    out_cols.append(
        F.when(src_wins & is_patch, F.coalesce(t["_deleted"], F.lit(True)))
        .when(src_wins, s[op_col] == F.lit("D"))
        .otherwise(F.coalesce(t["_deleted"], F.lit(False)))
        .alias("_deleted")
    )
    return j.select(*out_cols)


def _merge_with_patch_info(table, deduped, j, t, s, keys, src_cols, lsn_col):
    """Patch-mode merge with PER-PIECE LSN guards (the fold ran with
    ``emit_merge_info=True``). The folded row carries each piece's LSN —
    latest full image ``_img_lsn``, latest delete ``_del_lsn``, latest patch
    per column ``_pl_<col>`` — and each piece resolves against the target
    row's ``_lsn`` independently. This closes the cross-epoch stale-duplicate
    hole: a duplicate patch/full-image/delete re-delivered in ANY later epoch
    compares ≤ the target's LSN and loses per piece, while fresh pieces in
    the same batch still apply. Semantics per key, cut = target ``_lsn``:

      * img newer than (delete, cut)  → the folded image is the row
        (patches after the image already folded in);
      * delete newer than (img, cut)  → tombstone at the delete's LSN;
      * both stale (≤ cut)            → base is the TARGET; each patch with
        ``_pl_<c> > cut`` applies to a live target per column, and ``_lsn``
        advances only by APPLIED patch LSNs (a skipped patch on a tombstone
        must not block a later revive);
      * patch on an absent key        → tombstone (cannot create), at the
        patch LSN so lower-LSN stragglers cannot materialize it either.
    """
    fl, dl, cut = s["_img_lsn"], s["_del_lsn"], t["_lsn"]

    def _gt(a, b):  # a > b, null b = -inf, null a = never
        return a.isNotNull() & (b.isNull() | (a > b))

    live_new = _gt(fl, dl) & _gt(fl, cut)
    tomb_new = dl.isNotNull() & ~_gt(fl, dl) & _gt(dl, cut)
    target_live = cut.isNotNull() & ~F.coalesce(t["_deleted"], F.lit(False))

    def _patch_applies(c: str):
        pl_name = f"_pl_{c}"
        if pl_name not in deduped.columns:
            return F.lit(False)
        pl = s[pl_name]
        return pl.isNotNull() & F.when(live_new, pl > fl).otherwise(
            ~tomb_new & target_live & (pl > cut)
        )

    applied_pls = [
        F.when(_patch_applies(c), s[f"_pl_{c}"])
        for c in src_cols
        if f"_pl_{c}" in deduped.columns
    ]
    applied_any = None
    for c in src_cols:
        pa = _patch_applies(c)
        applied_any = pa if applied_any is None else (applied_any | pa)
    if applied_any is None:
        applied_any = F.lit(False)

    out_cols = []
    for f in table.schema.fields:
        if f.name in keys:
            out_cols.append(F.coalesce(s[f.name], t[f.name]).alias(f.name))
        elif f.name in src_cols:
            out_cols.append(
                F.when(live_new | tomb_new, s[f.name])
                .when(_patch_applies(f.name), s[f.name])
                .otherwise(t[f.name])
                .alias(f.name)
            )
        else:
            # schema-evolved column unknown to the envelope: a fresh full
            # image NULLs it (full-row-image semantics); patches/tombstones
            # leave it to the target
            out_cols.append(
                F.when(live_new, F.lit(None).cast(spark_type(f.type)))
                .otherwise(t[f.name])
                .alias(f.name)
            )
    lsn_out = F.when(live_new | tomb_new, s[lsn_col])
    if applied_pls:
        lsn_out = lsn_out.when(applied_any, F.greatest(*applied_pls))
    out_cols.append(
        lsn_out.when(cut.isNull(), s[lsn_col]).otherwise(cut).alias("_lsn")
    )
    out_cols.append(
        F.when(live_new, F.lit(False))
        .when(tomb_new, F.lit(True))
        .when(applied_any, F.lit(False))
        .when(cut.isNull(), F.lit(True))
        .otherwise(F.coalesce(t["_deleted"], F.lit(False)))
        .alias("_deleted")
    )
    return j.select(*out_cols)


def merge_into(
    table: LakeTable,
    deduped: DataFrame,
    commit: dict,
    buckets: list[int],
    lsn_col: str = "lsn",
    op_col: str = "op",
) -> dict:
    """Apply a per-key-unique batch of I/U/D row images to the table.

    ``deduped`` must hold at most one row per key (post-LWW). Update
    semantics are full-row-image: table columns absent from the event
    envelope become NULL when the source wins (matches the oracle replayer).
    """
    merged = build_merge(table, deduped, buckets, lsn_col=lsn_col, op_col=op_col)
    return table.replace_buckets(buckets, merged, commit=commit)


def append_delta_batch(
    table: LakeTable,
    deduped: DataFrame,
    commit: dict,
    lsn_col: str = "lsn",
    op_col: str = "op",
) -> dict:
    """Merge-on-read apply: shape the per-key-unique batch into delta rows
    (upserts carry the row image; deletes become tombstones) and append —
    no target read, no join, O(batch) work per epoch."""
    keys = table.key_columns
    reserved = {lsn_col, op_col, "ts", "schema_change"}
    src_cols = {c for c in deduped.columns if c not in reserved}
    is_del = F.col(op_col) == F.lit("D")
    out_cols = []
    for f in table.schema.fields:
        if f.name in keys:
            out_cols.append(F.col(f.name))
        elif f.name in src_cols:
            out_cols.append(F.when(is_del, F.lit(None)).otherwise(F.col(f.name)).alias(f.name))
        else:
            out_cols.append(F.lit(None).cast(spark_type(f.type)).alias(f.name))
    out_cols.append(F.col(lsn_col).alias("_lsn"))
    out_cols.append(is_del.alias("_deleted"))
    return table.append_delta(deduped.select(*out_cols), commit=commit)


def _write_lineage(table: LakeTable, run_id: str, epoch: int, seq: int, lineage: list[dict], extra: dict) -> None:
    d = os.path.join(table.path, "_lineage")
    os.makedirs(d, exist_ok=True)
    payload = {"run_id": run_id, "epoch": epoch, "seq": seq, "partitions": lineage, **extra}
    # deterministic name → idempotent overwrite on epoch replay
    tmp = os.path.join(d, f".tmp-{run_id}-{epoch}-{seq}.json")
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.rename(tmp, os.path.join(d, f"run={run_id}-epoch={epoch}-seq={seq}.json"))


def read_lineage(table: LakeTable) -> list[dict]:
    d = os.path.join(table.path, "_lineage")
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".json") and not name.startswith("."):
            with open(os.path.join(d, name)) as f:
                out.append(json.load(f))
    return out


def apply_batch(
    table: LakeTable,
    batch: DataFrame,
    run_id: str,
    epoch: int,
    dedup: str = "plain",
    n_salts: int = 16,
    lsn_col: str = "lsn",
    op_col: str = "op",
    quarantine: tuple[str, int] | None = None,
    merge_mode: str = "cow",
    exact_applied: bool = True,
) -> dict:
    """Apply one microbatch epoch to `table`, exactly once.

    ``exact_applied``: count post-dedup applied rows via ``observe()``
    (free — collected during the merge's own write job). MUST be False when
    called from inside a streaming ``foreachBatch``: the JVM-side
    ``Observation.get`` never receives its listener event there and
    deadlocks the microbatch thread. Without it, MOR still reports the exact
    delta-row count (from the written file manifest); COW reports the source
    row count.

    ``merge_mode``: 'cow' (copy-on-write — read+join+rewrite affected
    buckets; read-optimized) or 'mor' (merge-on-read — append delta files
    only; write-optimized, readers resolve LWW, compaction folds back).

    ``dedup='skip'``: caller guarantees the batch is already per-key unique
    (the fan-out splitter dedups ONCE and shares the result across sinks
    whose transforms are projection-only — dedup commutes with projections,
    saving N-1 LWW shuffles for N sinks).

    Sequencing: S (schema-change) events split the batch at their LSNs;
    each DDL is applied BEFORE the data events that follow it in LSN order
    (SURVEY.md §7.4 — the subtlest correctness requirement). Every sub-unit
    carries its own (run_id, epoch, seq) manifest entry; the epoch is gated
    by a final ``seq=-1`` marker.

    ``quarantine=(path, delta_seconds)``: events with ts older than
    max(batch ts_max, table high-water mark) - delta are written to a
    per-(run, epoch, sink) directory under the quarantine path
    (:func:`write_quarantine` — idempotent on replay, cross-process safe)
    and excluded from the merge, counted in the returned stats.
    """
    if dedup == "patch" and merge_mode != "cow":
        raise ValueError(
            "dedup='patch' requires merge_mode='cow': a partial-image patch "
            "resolves per column against the current target row at merge "
            "time, and MOR delta appends never read the target"
        )
    if table.has_commit(run_id, epoch, EPOCH_DONE_SEQ):
        return {"skipped": True, "run_id": run_id, "epoch": epoch}

    t0 = time.time()
    # ---- fused pre-pass: ONE job over the raw batch yields per-partition
    # lineage (source LSN range + rows), affected buckets, the late-data
    # threshold input, and any schema-change rows — instead of one job each.
    is_data = F.col(op_col) != "S"
    agg_cols = [
        F.min(F.when(is_data, F.col(lsn_col))).alias("lsn_min"),
        F.max(F.when(is_data, F.col(lsn_col))).alias("lsn_max"),
        F.sum(F.when(is_data, F.lit(1)).otherwise(F.lit(0))).alias("rows"),
        F.collect_set(F.when(is_data, F.col("_bucket"))).alias("buckets"),
        # epoch seconds, not a naive datetime (see _batch_stats)
        F.max(F.when(is_data, _ts_epoch())).alias("ts_max"),
    ]
    has_schema_col = "schema_change" in batch.columns
    if has_schema_col:
        agg_cols.append(
            F.collect_list(
                F.when(~is_data, F.struct(F.col(lsn_col).alias("l"), F.col("schema_change").alias("p")))
            ).alias("s_rows")
        )
    prows = (
        batch.withColumn("_pid", F.spark_partition_id())
        .withColumn("_bucket", table.bucket_expr())
        .groupBy("_pid")
        .agg(*agg_cols)
        .collect()
    )
    schema_events = sorted(
        (s["l"], json.loads(s["p"]))
        for r in prows
        for s in (r["s_rows"] if has_schema_col else [])
    )
    data = batch.filter(is_data)

    if not schema_events and quarantine is None:
        # ---- fast path (the steady-state shape): no schema boundary, no
        # late-data quarantine → a single dedup→merge unit whose applied-row
        # count is observed DURING the merge write (CollectMetrics), so the
        # whole epoch costs two jobs: stats + merge.
        raw_rows = sum(r["rows"] for r in prows)
        if raw_rows == 0:
            return {
                "skipped": False, "run_id": run_id, "epoch": epoch,
                "rows_applied": 0, "buckets": [], "quarantined": 0,
                "duration_sec": time.time() - t0,
            }
        buckets = sorted({b for r in prows for b in r["buckets"]})
        lsn_lo = min(r["lsn_min"] for r in prows if r["lsn_min"] is not None)
        lsn_hi = max(r["lsn_max"] for r in prows if r["lsn_max"] is not None)
        ts_hi = max((r["ts_max"] for r in prows if r["ts_max"] is not None), default=None)
        keys = tuple(table.key_columns)
        deduped = dedup_events(data, dedup, keys=keys, lsn_col=lsn_col, n_salts=n_salts)
        # exact post-dedup applied count, by path:
        #   * dedup='skip'  — the batch is already per-key unique: raw_rows
        #     IS the applied count (free; the shared fan-out dedup case)
        #   * exact_applied — Observation collected during the merge's own
        #     write job (free; the batch path)
        #   * streaming     — Observation.get deadlocks inside foreachBatch,
        #     so count distinct keys against the foreachBatch-persisted
        #     cache (one key-only shuffle job; content never moves)
        obs = None
        if dedup == "skip":
            applied_pre = raw_rows
        elif exact_applied:
            obs = Observation()
            deduped = deduped.observe(obs, F.count(F.lit(1)).alias("applied"))
            applied_pre = None
        else:
            applied_pre = data.select(*keys).distinct().count()
        commit = {
            "run_id": run_id,
            "epoch": epoch,
            "seq": EPOCH_DONE_SEQ,
            "lsn_min": lsn_lo,
            "lsn_max": lsn_hi,
            "ts_max": ts_hi,
            # exact post-dedup applied count when known at commit-build time
            # (observe-path exactness lands in the lineage file instead);
            # rows_source is always the pre-dedup coverage
            "rows_applied": applied_pre if applied_pre is not None else raw_rows,
            "rows_source": raw_rows,
        }
        if merge_mode == "mor":
            ret = append_delta_batch(table, deduped, commit, lsn_col=lsn_col, op_col=op_col)
        else:
            ret = merge_into(table, deduped, commit, buckets=buckets, lsn_col=lsn_col, op_col=op_col)
        if obs is not None:
            applied = int(obs.get["applied"])
        elif applied_pre is not None:
            applied = applied_pre
        else:
            applied = int(ret["rows"])  # mor: delta rows written == applied
        dur = max(time.time() - t0, 1e-9)
        lineage = [
            {"partition_id": r["_pid"], "lsn_min": r["lsn_min"],
             "lsn_max": r["lsn_max"], "rows": r["rows"]}
            for r in prows if r["rows"]
        ]
        _write_lineage(
            table, run_id, epoch, EPOCH_DONE_SEQ, lineage,
            {"rows": applied, "duration_sec": dur, "events_per_sec": applied / dur},
        )
        return {
            "skipped": False,
            "run_id": run_id,
            "epoch": epoch,
            "rows_applied": applied,
            "buckets": buckets,
            "quarantined": 0,
            "duration_sec": time.time() - t0,
        }

    quarantined = 0
    if quarantine is not None:
        qpath, delta = quarantine
        ts_max = max((r["ts_max"] for r in prows if r["ts_max"] is not None), default=None)
        # stream-level high-water mark: the threshold advances with the MAX
        # event time ever committed to this table (carried in the commit
        # manifests), not just this batch's max — a batch consisting
        # entirely of late events is fully quarantined instead of slipping
        # through because it defines its own "now"
        batch_ts = ts_max  # already epoch seconds (aggregated as double)
        hwm = table.high_ts()
        ref = max((v for v in (batch_ts, hwm) if v is not None), default=None)
        if ref is not None:
            threshold = ref - delta
            late = data.filter(_ts_epoch() < F.lit(threshold)).persist()
            try:
                quarantined = late.count()
                if quarantined:
                    write_quarantine(late, qpath, run_id, epoch, _sink_id(table))
                    # NULL event time is 'unknown', not 'late': both the <
                    # and >= predicates are NULL for it, so a bare >= filter
                    # would silently drop the row from BOTH branches. Keep
                    # null-ts rows on the data side — LSN ordering (the real
                    # merge key) still governs them
                    data = data.filter(
                        (_ts_epoch() >= F.lit(threshold)) | _ts_epoch().isNull()
                    )
            finally:
                late.unpersist()

    # build the unit list: (seq, kind, payload)
    boundaries = [l for l, _ in schema_events]
    ranges = []  # (lo_exclusive, hi_inclusive) lsn ranges between schema events
    lo = None
    for b in boundaries:
        ranges.append((lo, b))
        lo = b
    ranges.append((lo, None))

    units: list[tuple[str, object]] = []
    for i, (rlo, rhi) in enumerate(ranges):
        units.append(("merge", (rlo, rhi)))
        if i < len(schema_events):
            units.append(("ddl", schema_events[i]))

    single_merge = len(units) == 1
    total_rows = 0
    all_buckets: set[int] = set()
    lsn_lo, lsn_hi = None, None

    for seq, (kind, payload) in enumerate(units):
        if kind == "ddl":
            s_lsn, change = payload
            table.update_schema(change, schema_lsn=s_lsn)
            continue
        rlo, rhi = payload
        sub = data
        if rlo is not None:
            sub = sub.filter(F.col(lsn_col) > rlo)
        if rhi is not None:
            sub = sub.filter(F.col(lsn_col) < rhi)
        eff_seq = EPOCH_DONE_SEQ if single_merge else seq
        if table.has_commit(run_id, epoch, eff_seq):
            continue
        keys = tuple(table.key_columns)
        deduped = dedup_events(sub, dedup, keys=keys, lsn_col=lsn_col, n_salts=n_salts)
        deduped = deduped.persist()
        try:
            stats, lineage = _batch_stats(table, deduped, lsn_col)
            if stats["rows"] == 0:
                continue
            commit = {
                "run_id": run_id,
                "epoch": epoch,
                "seq": eff_seq,
                "lsn_min": stats["lsn_min"],
                "lsn_max": stats["lsn_max"],
                # stats are computed over the deduped batch → exact applied
                "rows_applied": stats["rows"],
                "ts_max": stats["ts_max"],
            }
            if merge_mode == "mor":
                append_delta_batch(table, deduped, commit, lsn_col=lsn_col, op_col=op_col)
            else:
                merge_into(table, deduped, commit, buckets=stats["buckets"], lsn_col=lsn_col, op_col=op_col)
            dur = max(time.time() - t0, 1e-9)
            _write_lineage(
                table, run_id, epoch, eff_seq, lineage,
                {"rows": stats["rows"], "duration_sec": dur, "events_per_sec": stats["rows"] / dur},
            )
            total_rows += stats["rows"]
            all_buckets |= set(stats["buckets"])
            lsn_lo = stats["lsn_min"] if lsn_lo is None else min(lsn_lo, stats["lsn_min"])
            lsn_hi = stats["lsn_max"] if lsn_hi is None else max(lsn_hi, stats["lsn_max"])
        finally:
            deduped.unpersist()

    # the epoch-done marker must exist even when every unit contributed 0
    # rows (e.g. a fully-quarantined all-late batch, now possible with the
    # HWM threshold): without it, an at-least-once redelivery of the epoch
    # would re-append the same late rows to the quarantine path. For a
    # non-empty single merge the merge's own commit already carried seq=-1.
    if not table.has_commit(run_id, epoch, EPOCH_DONE_SEQ):
        table.add_commit(
            {
                "run_id": run_id,
                "epoch": epoch,
                "seq": EPOCH_DONE_SEQ,
                "lsn_min": lsn_lo,
                "lsn_max": lsn_hi,
                "rows_applied": total_rows,
            }
        )
    return {
        "skipped": False,
        "run_id": run_id,
        "epoch": epoch,
        "rows_applied": total_rows,
        "buckets": sorted(all_buckets),
        "quarantined": quarantined,
        "duration_sec": time.time() - t0,
    }
