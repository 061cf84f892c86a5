"""LakeTable: snapshot-isolated, hash-bucketed, copy-on-write parquet table.

Layout on disk::

    <root>/
      _meta/
        v00000001.json      # immutable snapshot (files, schema versions, commits)
        v00000002.json
        CURRENT             # text file holding the current version number
      data/
        c00000002/_bucket=3/part-*.parquet

Commit protocol (the exactly-once core, see lake/__init__ docstring):
  1. build the next snapshot dict in memory,
  2. create ``v{n+1}.json`` with O_CREAT|O_EXCL — a concurrent committer
     racing to the same version loses and gets :class:`CommitConflict`,
  3. atomically rename a temp file onto ``CURRENT``.

Metadata columns stored in data files alongside the logical schema:
  * ``_lsn``      — last-applied change LSN for the row (the MERGE guard),
  * ``_deleted``  — tombstone flag; logical reads filter it out. Tombstones
    (rather than physical deletes) make out-of-order cross-batch replays
    safe: a late INSERT with a lower LSN cannot resurrect a row deleted at a
    higher LSN. Compaction may purge tombstones older than the watermark.
"""

from __future__ import annotations

import glob
import json
import os
import tempfile
import time
import uuid
from concurrent.futures import ThreadPoolExecutor

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_filter_copy_spark.lake.schema import (
    SchemaEvolutionError,
    TableSchema,
    spark_type,
)

FORMAT_VERSION = 1

# metadata columns carried in every data file, invisible to logical reads
META_FIELDS: list[tuple[str, str]] = [("_lsn", "long"), ("_deleted", "boolean")]
META_NAMES = [n for n, _ in META_FIELDS]


class CommitConflict(RuntimeError):
    """A concurrent writer committed the same version first; retry on latest."""


class LakeTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        self._meta_dir = os.path.join(self.path, "_meta")
        self._snap_cache: dict | None = None
        self._snap_cache_version: int | None = None

    # ------------------------------------------------------------------
    # creation / loading
    # ------------------------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: TableSchema | list[tuple[str, str]],
        key_columns: list[str],
        n_buckets: int = 16,
        bucket_columns: list[str] | None = None,
    ) -> LakeTable:
        """``bucket_columns`` (default: the key columns) decouples physical
        co-location from row identity, Iceberg-partition-spec style: e.g. a
        version-history table keyed ``(repo, path, valid_from_lsn)`` but
        bucketed by ``(repo, path)`` keeps every version of a key in ONE
        bucket, so point-lookups and per-key history rewrites prune to a
        single bucket. Must be a subset of ``key_columns`` — otherwise two
        rows with equal keys could land in different buckets and the
        bucket-pruned MERGE would silently miss its target row."""
        if not isinstance(schema, TableSchema):
            schema = TableSchema.from_pairs(schema)
        for k in key_columns:
            schema.field(k)  # validate keys exist
        if bucket_columns is not None:
            missing = [c for c in bucket_columns if c not in key_columns]
            if missing:
                raise ValueError(
                    f"bucket_columns must be a subset of key_columns; extra: {missing}"
                )
            if not bucket_columns:
                raise ValueError("bucket_columns must be non-empty when given")
        t = cls(spark, path)
        os.makedirs(t._meta_dir, exist_ok=False)
        os.makedirs(os.path.join(t.path, "data"), exist_ok=True)
        snap = {
            "format_version": FORMAT_VERSION,
            "version": 1,
            "parent": None,
            "key_columns": list(key_columns),
            "bucket_columns": list(bucket_columns) if bucket_columns else list(key_columns),
            "n_buckets": int(n_buckets),
            "schema_version": 1,
            "schemas": {"1": schema.to_json()},
            "schema_lsn": -1,
            "files": [],
            "commits": [],
        }
        t._write_snapshot(snap)
        return t

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> LakeTable:
        t = cls(spark, path)
        t.snapshot()  # raises if missing
        return t

    @classmethod
    def exists(cls, path: str) -> bool:
        return os.path.exists(os.path.join(path, "_meta", "CURRENT"))

    # ------------------------------------------------------------------
    # snapshot I/O
    # ------------------------------------------------------------------
    def current_version(self) -> int:
        with open(os.path.join(self._meta_dir, "CURRENT")) as f:
            return int(f.read().strip())

    def snapshot(self) -> dict:
        v = self.current_version()
        if self._snap_cache_version != v:
            with open(os.path.join(self._meta_dir, f"v{v:08d}.json")) as f:
                self._snap_cache = json.load(f)
            self._snap_cache_version = v
        return self._snap_cache

    def snapshot_at(self, version: int) -> dict:
        """Any historical snapshot — they are immutable (time travel)."""
        if version == self._snap_cache_version:
            return self._snap_cache
        with open(os.path.join(self._meta_dir, f"v{version:08d}.json")) as f:
            return json.load(f)

    def _write_snapshot(self, snap: dict) -> None:
        v = snap["version"]
        snap_path = os.path.join(self._meta_dir, f"v{v:08d}.json")
        try:
            fd = os.open(snap_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as e:
            raise CommitConflict(f"version {v} already committed at {self.path}") from e
        with os.fdopen(fd, "w") as f:
            json.dump(snap, f)
        tmp = os.path.join(self._meta_dir, f".CURRENT.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(str(v))
        os.rename(tmp, os.path.join(self._meta_dir, "CURRENT"))
        self._snap_cache = snap
        self._snap_cache_version = v

    def _next_snapshot(self) -> dict:
        snap = json.loads(json.dumps(self.snapshot()))  # deep copy
        snap["parent"] = snap["version"]
        snap["version"] += 1
        return snap

    # ------------------------------------------------------------------
    # schema accessors
    # ------------------------------------------------------------------
    @property
    def schema(self) -> TableSchema:
        snap = self.snapshot()
        return TableSchema.from_json(snap["schemas"][str(snap["schema_version"])])

    def schema_at(self, version: int) -> TableSchema:
        return TableSchema.from_json(self.snapshot()["schemas"][str(version)])

    @property
    def key_columns(self) -> list[str]:
        return list(self.snapshot()["key_columns"])

    @property
    def bucket_columns(self) -> list[str]:
        # tables created before the option existed bucket by the full key
        return list(self.snapshot().get("bucket_columns") or self.snapshot()["key_columns"])

    @property
    def n_buckets(self) -> int:
        return self.snapshot()["n_buckets"]

    @property
    def schema_lsn(self) -> int:
        return self.snapshot()["schema_lsn"]

    def bucket_expr(
        self,
        n_buckets: int | None = None,
        bucket_columns: list[str] | None = None,
    ) -> F.Column:
        """Hash-bucket of the bucket columns (default: the key columns);
        the physical partitioning unit. Both overrides serve the rebucket
        path, which must hash by the NEW spec before the snapshot records
        it."""
        return F.pmod(
            F.xxhash64(*[F.col(k) for k in (bucket_columns or self.bucket_columns)]),
            F.lit(n_buckets if n_buckets is not None else self.n_buckets),
        )

    # ------------------------------------------------------------------
    # reads
    # ------------------------------------------------------------------
    def files(self, buckets: list[int] | None = None) -> list[dict]:
        fs = self.snapshot()["files"]
        if buckets is not None:
            bset = set(buckets)
            fs = [f for f in fs if f["bucket"] in bset]
        return fs

    def _empty_df(self, include_meta: bool, schema: TableSchema | None = None) -> DataFrame:
        struct = (schema or self.schema).to_struct()
        if include_meta:
            for n, t in META_FIELDS:
                struct = struct.add(T.StructField(n, spark_type(t), True))
        return self.spark.createDataFrame([], struct)

    def read(
        self,
        include_meta: bool = False,
        buckets: list[int] | None = None,
        version: int | None = None,
        stat_filter: tuple | None = None,
    ) -> DataFrame:
        """Snapshot scan with manifest-level bucket pruning.

        ``version`` time-travels: the scan uses that immutable snapshot's
        file list AND schema (older commits are never rewritten, so any
        historical state is reproducible — the audit/debug primitive a CDC
        sink needs).

        Files written under older schema versions are projected to the
        snapshot's schema by field id (rename = alias, widen = cast, added
        column = null). If the snapshot contains merge-on-read delta files,
        the scan resolves last-writer-wins per key over base+delta rows
        (max ``_lsn``, delta preferred on ties). Logical reads hide
        metadata columns and tombstones.
        """
        snap = self.snapshot() if version is None else self.snapshot_at(version)
        files = snap["files"]
        if buckets is not None:
            bset = set(buckets)
            files = [f for f in files if f["bucket"] in bset]
        cur = TableSchema.from_json(snap["schemas"][str(snap["schema_version"])])
        key_columns = snap["key_columns"]
        if stat_filter is not None:
            # manifest-level range pruning over the per-file col_stats a
            # sorted compaction recorded (``stat_filter=(col, lo, hi)``,
            # either bound may be None). Exactness rules:
            #  * files without stats for the column are kept (safe);
            #  * buckets holding DELTA files are exempt entirely — the LWW
            #    winner may sit in a delta outside the range, and pruning
            #    its base row's competitor could resurrect stale state;
            #  * the row-level predicate is ALWAYS applied after the scan,
            #    so results are exact whether or not any file was pruned.
            # Stats are recorded under the FILE's column name at write time;
            # map the current name back per schema version by field id.
            sf_col, sf_lo, sf_hi = stat_filter
            cur_field = cur.field(sf_col)
            name_by_sv: dict[int, str | None] = {}
            delta_buckets = {f["bucket"] for f in files if f.get("kind") == "delta"}

            def _keep(f):
                if f["bucket"] in delta_buckets:
                    return True
                sv = f["schema_version"]
                if sv not in name_by_sv:
                    old = TableSchema.from_json(snap["schemas"][str(sv)]).field_by_id(
                        cur_field.id
                    )
                    name_by_sv[sv] = old.name if old is not None else None
                cs = (f.get("col_stats") or {}).get(name_by_sv[sv])
                if cs is None:
                    return True
                fmin, fmax = cs
                if sf_lo is not None and fmax < sf_lo:
                    return False
                if sf_hi is not None and fmin > sf_hi:
                    return False
                return True

            files = [f for f in files if _keep(f)]
        has_deltas = any(f.get("kind") == "delta" for f in files)
        if not files:
            df = self._empty_df(include_meta=True, schema=cur)
        else:
            by_group: dict[tuple[int, bool], list[str]] = {}
            for f in files:
                key = (f["schema_version"], f.get("kind") == "delta")
                by_group.setdefault(key, []).append(os.path.join(self.path, f["path"]))
            parts = []
            for (sv, is_delta), paths in sorted(by_group.items()):
                old = TableSchema.from_json(snap["schemas"][str(sv)])
                file_struct = old.to_struct()
                for n, t in META_FIELDS:
                    file_struct = file_struct.add(T.StructField(n, spark_type(t), True))
                raw = self.spark.read.schema(file_struct).parquet(*paths)
                cols = []
                for cf in cur.fields:
                    of = old.field_by_id(cf.id)
                    if of is None:
                        cols.append(F.lit(None).cast(spark_type(cf.type)).alias(cf.name))
                    else:
                        cols.append(F.col(of.name).cast(spark_type(cf.type)).alias(cf.name))
                cols += [F.col(n) for n in META_NAMES]
                cols.append(F.lit(is_delta).alias("_is_delta"))
                parts.append(raw.select(*cols))
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
            if has_deltas:
                # merge-on-read resolution: one winner per key by (lsn, delta)
                keys = key_columns
                payload = [c for c in df.columns if c not in keys]
                order = F.struct(
                    F.coalesce(F.col("_lsn"), F.lit(-1)), F.col("_is_delta")
                )
                df = (
                    df.groupBy(*keys)
                    .agg(F.max_by(F.struct(*payload), order).alias("_w"))
                    .select(*keys, *[F.col(f"_w.{c}").alias(c) for c in payload])
                )
            df = df.drop("_is_delta")
        if stat_filter is not None:
            sf_col, sf_lo, sf_hi = stat_filter
            pred = F.lit(True)
            if sf_lo is not None:
                pred = pred & (F.col(sf_col) >= F.lit(sf_lo))
            if sf_hi is not None:
                pred = pred & (F.col(sf_col) <= F.lit(sf_hi))
            df = df.filter(pred)
        if not include_meta:
            df = df.filter(~F.coalesce(F.col("_deleted"), F.lit(False))).drop(*META_NAMES)
        return df

    def lookup(self, key_values: dict, version: int | None = None) -> DataFrame:
        """Point lookup: manifest-prunes to the ONE hash bucket the key's
        bucket columns select, then filters inside it — O(bucket) work no
        matter the table size, the read-side payoff of hash-bucketed
        layout. ``key_values`` must cover at least the bucket columns;
        extra key columns tighten the filter. Equality-only (the bucket
        function is a hash)."""
        snap = self.snapshot() if version is None else self.snapshot_at(version)
        bcols = snap.get("bucket_columns") or snap["key_columns"]
        missing = [c for c in bcols if c not in key_values]
        if missing:
            raise ValueError(
                f"lookup needs every bucket column; missing: {missing}"
            )
        one = self.spark.range(1).select(
            F.pmod(
                F.xxhash64(*[F.lit(key_values[c]) for c in bcols]),
                F.lit(snap["n_buckets"]),
            ).alias("b")
        )
        bucket = int(one.first()["b"])
        df = self.read(buckets=[bucket], version=version)
        for c, v in key_values.items():
            df = df.filter(F.col(c) == F.lit(v))
        return df

    def high_lsn(self, version: int | None = None) -> int:
        """Highest change LSN covered by a snapshot's commit manifests
        (a default bootstrap stamps ``_lsn=0``; ``--snapshot-lsn L`` stamps
        L and its bootstrap commit records the bounds so the watermark
        starts at the snapshot position; maintenance commits carry no
        LSN)."""
        snap = self.snapshot() if version is None else self.snapshot_at(version)
        return max(
            (c["lsn_max"] for c in snap["commits"] if c.get("lsn_max") is not None),
            default=0,
        )

    def high_ts(self, version: int | None = None) -> float | None:
        """Highest event time (epoch seconds) covered by a snapshot's commit
        manifests — the stream-level late-data high-water mark the
        quarantine threshold advances against."""
        snap = self.snapshot() if version is None else self.snapshot_at(version)
        return max(
            (c["ts_max"] for c in snap["commits"] if c.get("ts_max") is not None),
            default=None,
        )

    def read_changes(self, since_version: int, version: int | None = None) -> DataFrame:
        """Incremental change scan: the net per-key changes committed AFTER
        ``since_version`` — the table acting as a CDC *source* (the lake
        analogue of an Iceberg incremental snapshot scan, SURVEY.md §2.1),
        so one engine's sink can feed another engine's replay.

        Returns the engine's event shape: one row per changed key with
        ``op`` ('U' upsert row image / 'D' delete) and ``lsn``. Exactness
        does not depend on file layout: only files added since the old
        snapshot are scanned (manifest diff — copy-on-write bucket rewrites
        and compactions re-add old rows, but those carry ``_lsn`` at or
        below the old snapshot's high-water mark and are filtered), then
        LWW-reduced per key.

        Contract: source LSNs must be monotone across commits (the WAL
        property) — a later commit applying an LSN below an earlier
        commit's high-water mark would be filtered as already-seen.

        The emitted rows carry the FULL engine event envelope so the feed
        replays directly (``apply_batch`` / ``replay_stream``): ``ts`` is a
        synthetic event time derived from the LSN (``timestamp_micros(lsn)``
        — monotone, so watermarked stream dedup behaves; the table does not
        store wall-clock change times), and ``schema_change`` is always
        NULL — schema evolution propagates via snapshot schemas, not the
        row feed.
        """
        # pin ONE version for the manifest diff, the scan AND the output
        # projection — a concurrent commit (data or schema) between reads
        # must not silently drop rows or reference columns the pinned scan
        # lacks. Callers that compose multiple reads (``changelog``) pass
        # ``version`` so every read shares one pin.
        cur_version = self.current_version() if version is None else int(version)
        cur_snap = self.snapshot_at(cur_version)
        old = self.snapshot_at(since_version)
        old_paths = {f["path"] for f in old["files"]}
        wm_prune = self.high_lsn(since_version)
        # manifest-level data skipping: a file added since the old snapshot
        # whose footer-derived lsn_max is at or below the old watermark can
        # only contain re-added rows (copy-on-write rewrites, compactions) —
        # skip it entirely instead of scanning and filtering. Files with
        # unknown stats stay in (safe), the row-level _lsn filter below is
        # still the correctness gate either way.
        added = [
            f
            for f in cur_snap["files"]
            if f["path"] not in old_paths
            and (f.get("lsn_max") is None or f["lsn_max"] > wm_prune)
        ]
        # a rollback between the snapshots REWOUND state the consumer has
        # already seen — net-change semantics cannot represent un-happening,
        # so raise (the latest crossing rollback's marker is always present:
        # markers are only removed by a rollback to an even earlier version,
        # which leaves its own, later marker). Checked BEFORE the purge
        # guard below, whose commit-suffix slice assumes the commit list is
        # append-only — exactly what a rollback's truncation breaks.
        rb = [
            c
            for c in cur_snap["commits"]
            if c.get("kind") == "rollback"
            and c.get("at_version", 0) > since_version
        ]
        if rb:
            raise ValueError(
                f"read_changes(since_version={since_version}): the table was "
                f"rolled back to version {rb[-1]['rollback_to']} at version "
                f"{rb[-1]['at_version']}; a net change feed cannot represent "
                "rewound state. Re-sync from the rolled-back version."
            )
        # a tombstone-purging compaction between the snapshots has DROPPED
        # delete markers this feed would otherwise emit as 'D' events —
        # surfacing silently-lossy feeds as an error beats returning one
        # (commits are append-only across snapshots, so the new ones are
        # exactly the suffix past the old count)
        purged = [
            c
            for c in cur_snap["commits"][len(old["commits"]):]
            if c.get("purged_tombstones")
        ]
        if purged:
            raise ValueError(
                f"read_changes(since_version={since_version}): a tombstone-"
                "purging compaction committed after that version; delete "
                "events in the gap are unrecoverable. Run purging compaction "
                "only after every change-feed consumer has passed the "
                "tombstone LSNs."
            )
        # columns from the PINNED snapshot everywhere (including the empty
        # branch — self.schema would re-read CURRENT and could race a
        # concurrent schema-evolving commit)
        pinned_schema = TableSchema.from_json(
            cur_snap["schemas"][str(cur_snap["schema_version"])]
        )
        wm = wm_prune
        if not added:
            base = self._empty_df(include_meta=True, schema=pinned_schema)
        else:
            # reuse the snapshot scanner on just the added files: cheapest
            # correct path is a full read restricted to the added files'
            # buckets, then the LSN filter; buckets not present in `added`
            # cannot contain post-watermark rows
            bset = sorted({f["bucket"] for f in added})
            base = self.read(include_meta=True, buckets=bset, version=cur_version)
        changed = base.filter(F.col("_lsn") > F.lit(wm))
        op = F.when(F.coalesce(F.col("_deleted"), F.lit(False)), F.lit("D")).otherwise(F.lit("U"))
        cols = [f.name for f in pinned_schema.fields]
        return changed.select(
            F.col("_lsn").alias("lsn"),
            F.timestamp_micros(F.col("_lsn")).alias("ts"),
            op.alias("op"),
            *[F.col(c) for c in cols],
            F.lit(None).cast("string").alias("schema_change"),
        )

    def changelog(self, since_version: int, version: int | None = None) -> DataFrame:
        """Pre/post-image changelog between a past snapshot and now — the
        Iceberg ``create_changelog_view`` analogue, built entirely from the
        net change feed plus a bucket-pruned before-image scan.

        One row per net-changed key: the key columns, ``op`` ('I' insert /
        'U' update / 'D' delete — classified against the key's visibility
        at ``since_version``), the change ``lsn``, and ``before_<col>`` /
        ``after_<col>`` images of every non-key column. Inserts carry NULL
        before-images, deletes NULL after-images; keys that were created
        AND deleted inside the window never became visible and are omitted.

        Scale shape: the after side is ``read_changes`` (manifest-diff +
        LSN pruned), the before side reads ONLY the buckets the diff
        touched at the old version, and the two meet in one equi-join on
        the key columns — cost ∝ changed data, never table size. Both
        sides are projected to the PINNED end snapshot's schema by field
        id, so renames and widenings between the two versions don't fork
        column names.

        ``version`` pins the END of the window (default: current) — the
        changelog between any two historical snapshots, for audit replay.
        """
        cur_version = self.current_version() if version is None else int(version)
        cur_snap = self.snapshot_at(cur_version)
        changes = self.read_changes(since_version, version=cur_version)
        old_snap = self.snapshot_at(since_version)
        # same manifest diff read_changes prunes with: buckets untouched
        # since the old snapshot cannot hold a changed key's before-image
        wm = self.high_lsn(since_version)
        old_paths = {f["path"] for f in old_snap["files"]}
        bset = sorted(
            {
                f["bucket"]
                for f in cur_snap["files"]
                if f["path"] not in old_paths
                and (f.get("lsn_max") is None or f["lsn_max"] > wm)
            }
        )
        before = self.read(buckets=bset, version=since_version)
        cur_schema = TableSchema.from_json(
            cur_snap["schemas"][str(cur_snap["schema_version"])]
        )
        old_schema = TableSchema.from_json(
            old_snap["schemas"][str(old_snap["schema_version"])]
        )
        proj = []
        for cf in cur_schema.fields:
            of = old_schema.field_by_id(cf.id)
            if of is None:
                proj.append(F.lit(None).cast(spark_type(cf.type)).alias(cf.name))
            else:
                proj.append(F.col(of.name).cast(spark_type(cf.type)).alias(cf.name))
        before = before.select(*proj)
        keys = list(cur_snap["key_columns"])
        payload = [f for f in cur_schema.fields if f.name not in keys]
        b = before.select(
            *keys,
            *[F.col(f.name).alias(f"before_{f.name}") for f in payload],
            F.lit(True).alias("_had_before"),
        )
        a = changes.select(
            *keys,
            F.col("lsn"),
            F.col("op"),
            *[F.col(f.name).alias(f"after_{f.name}") for f in payload],
        )
        j = a.join(b, on=keys, how="left")
        had = F.coalesce(F.col("_had_before"), F.lit(False))
        # a delete of a never-visible key is not an observable change
        j = j.filter(~((F.col("op") == "D") & ~had))
        return j.select(
            *keys,
            F.when(F.col("op") == "D", F.lit("D"))
            .when(had, F.lit("U"))
            .otherwise(F.lit("I"))
            .alias("op"),
            F.col("lsn"),
            *[F.col(f"before_{f.name}") for f in payload],
            *[
                F.when(
                    F.col("op") == "D",
                    F.lit(None).cast(spark_type(f.type)),
                )
                .otherwise(F.col(f"after_{f.name}"))
                .alias(f"after_{f.name}")
                for f in payload
            ],
        )

    # ------------------------------------------------------------------
    # writes
    # ------------------------------------------------------------------
    def _prepare_write(self, df: DataFrame) -> DataFrame:
        """Order/complete columns to the current physical layout (+meta)."""
        cur = self.schema
        cols = []
        for f in cur.fields:
            if f.name in df.columns:
                cols.append(F.col(f.name).cast(spark_type(f.type)).alias(f.name))
            else:
                cols.append(F.lit(None).cast(spark_type(f.type)).alias(f.name))
        for n, t in META_FIELDS:
            if n in df.columns:
                cols.append(F.col(n).cast(spark_type(t)).alias(n))
            else:
                dflt = F.lit(False) if n == "_deleted" else F.lit(None)
                cols.append(dflt.cast(spark_type(t)).alias(n))
        return df.select(*cols)

    def _write_data_files(
        self, df: DataFrame, commit_dir: str, kind: str = "base",
        n_buckets: int | None = None, bucket_columns: list[str] | None = None,
        sort_by: list[str] | None = None, range_files: int = 1,
        stat_columns: list[str] | None = None,
    ) -> list[dict]:
        """Write df into data/<commit_dir>/_bucket=*/ and return file entries.
        ``n_buckets`` / ``bucket_columns`` override the snapshot's bucket
        spec (the rescale/rebucket path).

        ``sort_by`` clusters each bucket's rows on those columns; with
        ``range_files > 1`` the bucket additionally RANGE-SPLITS into that
        many files with disjoint sort-key ranges (ntile within the bucket)
        — the Iceberg sort-order analogue. Combined with the per-file
        min/max stats recorded below, range predicates then prune at the
        manifest level (``read(stat_filter=...)``) before any scan."""
        out_dir = os.path.join(self.path, "data", commit_dir)
        staged = self._prepare_write(df).withColumn(
            "_bucket", self.bucket_expr(n_buckets, bucket_columns)
        )
        # one shuffle keyed by bucket so each bucket's rows land contiguously;
        # at cluster scale this is the co-partitioning the MERGE join reuses.
        # Width > cores: with exactly `cores` partitions the 64 bucket values
        # hash-collide unevenly (binomial) and the worst task strides the
        # whole write stage; 4x cores keeps ≤2 buckets per task
        n_buckets = int(n_buckets if n_buckets is not None else self.snapshot()["n_buckets"])
        width = min(n_buckets, 4 * self.spark.sparkContext.defaultParallelism)
        if sort_by:
            order = [F.col(c) for c in sort_by]
            if range_files > 1:
                # range partitioning on (_bucket, sort keys): every task
                # partition holds a CONTIGUOUS (bucket, key) span, so each
                # bucket's files get disjoint sort-key ranges by
                # construction (a hash shuffle on an ntile would merge
                # non-adjacent tiles into one file and overlap the ranges)
                parts = min(n_buckets * int(range_files), 4096)
                staged = staged.repartitionByRange(
                    parts, F.col("_bucket"), *order
                ).sortWithinPartitions("_bucket", *order)
            else:
                staged = staged.repartition(width, F.col("_bucket")) \
                               .sortWithinPartitions("_bucket", *order)
        else:
            staged = staged.repartition(width, F.col("_bucket"))
        staged.write.mode("errorifexists").partitionBy("_bucket").parquet(out_dir)
        sv = self.snapshot()["schema_version"]
        paths = sorted(glob.glob(os.path.join(out_dir, "_bucket=*", "*.parquet")))
        # stats recorded for the sort columns (disjoint ranges — the primary
        # pruning key) plus any extra stat_columns the caller asks for
        # (overlapping per file, still prunable when values correlate)
        stat_cols = list(dict.fromkeys([*(sort_by or []), *(stat_columns or [])]))

        def _plain(v):
            # manifest entries are JSON: keep only portable scalar stats
            if isinstance(v, bool) or v is None:
                return None
            if isinstance(v, (int, float, str)):
                return v
            try:
                import numpy as _np

                if isinstance(v, _np.generic):
                    return v.item()
            except Exception:
                pass
            return None

        def footer_stats(p: str):
            """(rows, lsn_min, lsn_max, {col: [min, max]}) from the parquet
            footer — zero extra jobs: row-group column statistics already
            carry min/max, giving the manifest Iceberg-style per-file value
            ranges (the data-skipping primitive ``read_changes`` and
            ``stat_filter`` prune with)."""
            md = pq.ParquetFile(p).metadata
            name_to_idx = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }

            def col_range(name):
                idx = name_to_idx.get(name)
                if idx is None:
                    return None, None
                lo = hi = None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if st is None or not st.has_min_max:
                        return None, None
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                return lo, hi

            lsn_lo, lsn_hi = col_range("_lsn")
            col_stats = {}
            for c in stat_cols:
                lo, hi = col_range(c)
                lo, hi = _plain(lo), _plain(hi)
                if lo is not None and hi is not None:
                    col_stats[c] = [lo, hi]
            return md.num_rows, lsn_lo, lsn_hi, col_stats

        # footer reads are per-file driver I/O — overlap them (64+ buckets
        # per commit would otherwise serialize into ~1s of epoch latency)
        with ThreadPoolExecutor(max_workers=min(16, max(len(paths), 1))) as ex:
            stats = list(ex.map(footer_stats, paths))
        entries = []
        for p, (rows, lsn_lo, lsn_hi, col_stats) in zip(paths, stats):
            bucket = int(os.path.basename(os.path.dirname(p)).split("=", 1)[1])
            if rows == 0:
                continue
            entry = {
                "path": os.path.relpath(p, self.path),
                "bucket": bucket,
                "rows": rows,
                "schema_version": sv,
                "lsn_min": lsn_lo,
                "lsn_max": lsn_hi,
            }
            if col_stats:
                entry["col_stats"] = col_stats
            if kind != "base":
                entry["kind"] = kind
            entries.append(entry)
        return entries

    def append(self, df: DataFrame, commit: dict | None = None) -> dict:
        snap = self._next_snapshot()
        entries = self._write_data_files(df, f"c{snap['version']:08d}-{uuid.uuid4().hex[:8]}")
        snap["files"] = snap["files"] + entries
        if commit:
            commit = self._fill_lsn_bounds(commit, entries)
            snap["commits"] = snap["commits"] + [dict(commit, committed_at=time.time())]
        self._write_snapshot(snap)
        return {"files_added": len(entries), "rows": sum(e["rows"] for e in entries),
                "entries": entries}

    @staticmethod
    def _fill_lsn_bounds(commit: dict, entries: list[dict]) -> dict:
        """Default a commit's lsn_min/lsn_max from the written files' footer
        stats (already collected — no extra job): append-path producers that
        carry ``_lsn`` (e.g. the SCD2 version store) then advance
        ``high_lsn()``, which ``read_changes`` relies on to prune
        compaction-re-added rows. Callers that precompute bounds (the merge
        path) are left untouched."""
        if "lsn_max" in commit:
            return commit
        los = [e["lsn_min"] for e in entries if e.get("lsn_min") is not None]
        his = [e["lsn_max"] for e in entries if e.get("lsn_max") is not None]
        if not his:
            return commit
        return dict(commit, lsn_min=min(los) if los else None, lsn_max=max(his))

    def append_delta(self, df: DataFrame, commit: dict | None = None) -> dict:
        """Merge-on-read write path: append a per-key-unique delta batch
        (rows carry ``_lsn``; deletes as ``_deleted=true`` tombstone rows)
        WITHOUT reading or rewriting the base — O(batch) work. Readers
        resolve LWW at scan time; ``compact()`` folds deltas back into base
        files. This is the Iceberg-v2 MOR trade: maximum ingest throughput,
        read cost deferred to scan/compaction."""
        snap = self._next_snapshot()
        entries = self._write_data_files(
            df, f"d{snap['version']:08d}-{uuid.uuid4().hex[:8]}", kind="delta"
        )
        snap["files"] = snap["files"] + entries
        if commit:
            commit = self._fill_lsn_bounds(commit, entries)
            snap["commits"] = snap["commits"] + [dict(commit, committed_at=time.time())]
        self._write_snapshot(snap)
        return {"files_added": len(entries), "rows": sum(e["rows"] for e in entries)}

    def delta_file_count(self, buckets: list[int] | None = None) -> int:
        return sum(1 for f in self.files(buckets) if f.get("kind") == "delta")

    def replace_buckets(
        self, buckets: list[int], df: DataFrame, commit: dict | None = None,
        sort_by: list[str] | None = None, range_files: int = 1,
        stat_columns: list[str] | None = None,
    ) -> dict:
        """Copy-on-write swap: new files for `buckets`, other buckets untouched."""
        bset = set(int(b) for b in buckets)
        snap = self._next_snapshot()
        entries = self._write_data_files(
            df, f"c{snap['version']:08d}-{uuid.uuid4().hex[:8]}",
            sort_by=sort_by, range_files=range_files, stat_columns=stat_columns,
        )
        bad = [e for e in entries if e["bucket"] not in bset]
        if bad:
            raise ValueError(f"write produced rows outside affected buckets: {bad[:3]}")
        kept = [f for f in snap["files"] if f["bucket"] not in bset]
        snap["files"] = kept + entries
        if commit:
            snap["commits"] = snap["commits"] + [dict(commit, committed_at=time.time())]
        self._write_snapshot(snap)
        return {
            "files_added": len(entries),
            "rows": sum(e["rows"] for e in entries),
            "buckets_rewritten": sorted(bset),
        }

    # ------------------------------------------------------------------
    # schema evolution (transactional DDL)
    # ------------------------------------------------------------------
    def update_schema(self, change: dict, schema_lsn: int, commit: dict | None = None) -> bool:
        """Apply a CDC schema-change payload as a new schema version.

        Returns False (no-op) when ``schema_lsn`` was already applied —
        the DDL analogue of the commit-manifest skip, which makes epoch
        replay after a crash safe (SURVEY.md §7.4 M4 sequencing).
        """
        if schema_lsn <= self.schema_lsn:
            return False
        if change.get("action") == "drop":
            col = change.get("column")
            protected = set(self.key_columns) | set(self.bucket_columns)
            if col in protected:
                raise SchemaEvolutionError(
                    f"cannot drop {col!r}: it is a key/bucket column — row "
                    "identity and physical placement depend on it"
                )
        snap = self._next_snapshot()
        cur = TableSchema.from_json(snap["schemas"][str(snap["schema_version"])])
        new = cur.apply_change(change)
        snap["schema_version"] += 1
        snap["schemas"][str(snap["schema_version"])] = new.to_json()
        snap["schema_lsn"] = int(schema_lsn)
        if commit:
            snap["commits"] = snap["commits"] + [dict(commit, committed_at=time.time())]
        self._write_snapshot(snap)
        return True

    # ------------------------------------------------------------------
    # commit manifests (exactly-once)
    # ------------------------------------------------------------------
    def commits(self) -> list[dict]:
        return list(self.snapshot()["commits"])

    def add_commit(self, commit: dict) -> None:
        """Metadata-only commit (e.g. an epoch-done marker): no data change."""
        snap = self._next_snapshot()
        snap["commits"] = snap["commits"] + [dict(commit, committed_at=time.time())]
        self._write_snapshot(snap)

    def has_commit(self, run_id: str, epoch: int, seq: int = 0) -> bool:
        """Reference parity: committed tasks are skipped on resume
        (ReuseInputExecutorPlugin.scala:61-64, LoaderState.scala:111-120)."""
        for c in self.snapshot()["commits"]:
            if c.get("run_id") == run_id and c.get("epoch") == epoch and c.get("seq", 0) == seq:
                return True
        return False

    # ------------------------------------------------------------------
    # maintenance
    # ------------------------------------------------------------------
    def compact(
        self,
        buckets: list[int] | None = None,
        purge_tombstones: bool = False,
        max_files_per_bucket: int = 1,
        min_delta_files: int = 1,
        sort_by: list[str] | None = None,
        files_per_bucket_out: int = 1,
        stat_columns: list[str] | None = None,
    ) -> dict:
        """Rewrite fragmented buckets (small-file compaction) and optionally
        drop tombstones — safe once (a) every producer's watermark has
        passed the tombstone LSNs (a purged tombstone can no longer shield
        against a late lower-LSN insert) AND (b) every ``read_changes``
        consumer has passed them too (the purge erases the row a 'D' event
        would be derived from; ``read_changes`` detects a purging compaction
        in its gap and raises rather than silently dropping deletes). The
        Iceberg-maintenance analogue; at scale this runs as a background job
        per bucket range.

        ``min_delta_files`` defers delta folding until a bucket has
        accumulated that many delta files — at 10^5+ buckets an epoch
        leaves ONE small delta in most touched buckets, and folding after
        every epoch would rewrite each touched bucket's base for one
        delta's worth of rows; the read-side merge-on-read view stays
        correct at any delta depth, so deferral trades read amplification
        for write amplification on the operator's own terms. (The default 1
        keeps the historical fold-everything behavior; purge_tombstones
        still forces every bucket — a purge must not leave shielded
        tombstones behind in skipped buckets.)

        ``sort_by`` requests a SORT-ORDERED rewrite (Iceberg sort-order
        analogue): every in-scope bucket is rewritten (a clustering request
        overrides the fragmentation thresholds) with rows clustered on the
        sort columns; ``files_per_bucket_out > 1`` range-splits each bucket
        into files with disjoint sort-key ranges. The write records
        per-file min/max ``col_stats`` for the sort columns, which
        ``read(stat_filter=(col, lo, hi))`` then prunes at the manifest
        level — range scans over a CDC sink (time windows, commit ranges)
        stop paying for the whole bucket."""
        # the two knobs are orthogonal: max_files_per_bucket measures BASE
        # fragmentation, min_delta_files measures delta depth — counting a
        # delta against the base threshold would re-trigger the fold the
        # deferral knob just skipped
        base_counts: dict[int, int] = {}
        delta_counts: dict[int, int] = {}
        for f in self.files(buckets):
            kind = delta_counts if f.get("kind") == "delta" else base_counts
            kind[f["bucket"]] = kind.get(f["bucket"], 0) + 1
        targets = sorted(
            b
            for b in set(base_counts) | set(delta_counts)
            if base_counts.get(b, 0) > max_files_per_bucket
            or purge_tombstones
            or sort_by is not None
            or delta_counts.get(b, 0) >= max(min_delta_files, 1)
        )
        if not targets:
            return {"buckets_compacted": [], "files_before": 0}
        files_before = len(self.files(targets))
        df = self.read(include_meta=True, buckets=targets)
        if purge_tombstones:
            df = df.filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
        commit = {"run_id": "__compaction__", "epoch": self.current_version(), "seq": 0}
        if purge_tombstones:
            commit["purged_tombstones"] = True  # read_changes poison marker
        if sort_by:
            commit["sort_by"] = list(sort_by)
        res = self.replace_buckets(
            targets, df, commit=commit,
            sort_by=sort_by, range_files=files_per_bucket_out,
            stat_columns=stat_columns,
        )
        return {
            "buckets_compacted": targets,
            "files_before": files_before,
            "files_after": res["files_added"],
            "rows": res["rows"],
        }

    def rescale_buckets(
        self,
        new_n_buckets: int | None = None,
        new_bucket_columns: list[str] | None = None,
    ) -> dict:
        """Rewrite the whole table under a new bucket SPEC — count and/or
        columns (Iceberg partition-spec evolution). The count is the knob a
        growing table turns when its buckets get too coarse (a 100 TB table
        wants thousands of buckets; a fresh one wants dozens); the columns
        change when access patterns shift (e.g. a (repo, path)-keyed table
        rebucketted by (repo) alone so per-repo scans and history rewrites
        prune to one bucket). New bucket columns must remain a subset of
        the key columns — the bucket-pruned MERGE invariant.

        One shuffle of the full data keyed by the NEW bucket function;
        merge-on-read deltas are folded in (the scan resolves LWW) and
        tombstones are preserved, so CDC semantics are unchanged. Atomic:
        readers see either the old spec or the new one; concurrent writers
        lose the snapshot race and retry (CommitConflict). At cluster scale
        this is the same background job shape as a full compaction."""
        if new_n_buckets is None and new_bucket_columns is None:
            raise ValueError("give new_n_buckets, new_bucket_columns, or both")
        new_n_buckets = int(new_n_buckets if new_n_buckets is not None else self.n_buckets)
        if new_n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1, got {new_n_buckets}")
        if new_bucket_columns is not None:
            keys = self.key_columns
            bad = [c for c in new_bucket_columns if c not in keys]
            if bad:
                raise ValueError(
                    f"bucket columns must be a subset of key columns; extra: {bad}"
                )
            if not new_bucket_columns:
                raise ValueError("new_bucket_columns must be non-empty")
        df = self.read(include_meta=True)
        snap = self._next_snapshot()
        entries = self._write_data_files(
            df,
            f"r{snap['version']:08d}-{uuid.uuid4().hex[:8]}",
            n_buckets=new_n_buckets,
            bucket_columns=new_bucket_columns,
        )
        snap["n_buckets"] = new_n_buckets
        if new_bucket_columns is not None:
            snap["bucket_columns"] = list(new_bucket_columns)
        snap["files"] = entries  # full replacement — every row was rewritten
        snap["commits"] = snap["commits"] + [
            {
                "run_id": "__rescale__",
                "epoch": snap["version"],
                "seq": 0,
                "n_buckets": new_n_buckets,
                "bucket_columns": snap.get("bucket_columns"),
                "committed_at": time.time(),
            }
        ]
        self._write_snapshot(snap)
        return {
            "n_buckets": new_n_buckets,
            "bucket_columns": list(snap.get("bucket_columns") or self.key_columns),
            "files": len(entries),
            "rows": sum(e["rows"] for e in entries),
        }

    def expire_snapshots(
        self,
        keep_last: int = 10,
        sweep_orphans: bool = False,
        orphan_grace_seconds: float = 3600.0,
    ) -> dict:
        """Iceberg-maintenance analogue of ``expire_snapshots`` + orphan
        file GC: drop snapshot metadata older than the newest ``keep_last``
        versions and delete data files referenced ONLY by expired snapshots
        (copy-on-write rewrites and compactions strand the files they
        replaced — without expiration the table's storage grows with write
        history, not data size).

        Crash-safety ordering: expired snapshot JSONs are removed FIRST,
        then their now-unreferenced data files — a crash in between leaves
        unreferenced files (cleaned by the next run's sweep), never a
        still-listed snapshot pointing at deleted files (which would break
        time travel to a listed version until a rerun).

        ``sweep_orphans`` additionally scans ``data/`` for files referenced
        by NO surviving snapshot — the leftovers of aborted commits
        (``_write_data_files`` runs before ``_write_snapshot``, so a
        CommitConflict loser's files are invisible to reference-diff GC) and
        of crashes inside this method. Only files older than
        ``orphan_grace_seconds`` (mtime) are swept, so an IN-FLIGHT writer's
        not-yet-committed files are never deleted — same grace-window
        contract as Iceberg's remove_orphan_files.

        Time travel (``read(version=...)``) and incremental reads
        (``read_changes(since_version=...)``) below the horizon raise
        FileNotFoundError afterwards — run expiration only once every
        consumer's resume point has passed the horizon, same contract as
        tombstone purging. Commit manifests are unaffected (each snapshot
        carries the full append-only commit list, so exactly-once resume
        never needs expired snapshots)."""
        if keep_last < 1:
            # keep_last=0 would place the horizon past CURRENT and delete
            # the live snapshot + every data file — refuse, don't truncate
            raise ValueError(f"keep_last must be >= 1, got {keep_last}")
        cur = self.current_version()
        horizon = cur - keep_last + 1  # keep [horizon .. cur]
        deleted = 0
        expired_versions: list[int] = []
        if horizon > 1:
            kept_refs: set[str] = set()
            for v in range(horizon, cur + 1):
                kept_refs |= {f["path"] for f in self.snapshot_at(v)["files"]}
            orphan_refs: set[str] = set()
            for v in range(1, horizon):
                snap_path = os.path.join(self._meta_dir, f"v{v:08d}.json")
                if not os.path.exists(snap_path):
                    continue  # already expired by an earlier run (idempotent)
                expired_versions.append(v)
                orphan_refs |= {
                    f["path"] for f in self.snapshot_at(v)["files"]
                } - kept_refs
            # metadata first (see docstring ordering contract)
            for v in expired_versions:
                os.remove(os.path.join(self._meta_dir, f"v{v:08d}.json"))
            for rel in sorted(orphan_refs):
                p = os.path.join(self.path, rel)
                if os.path.exists(p):
                    os.remove(p)
                    deleted += 1
        swept = 0
        if sweep_orphans:
            live_refs: set[str] = set()
            for name in os.listdir(self._meta_dir):
                if name.startswith("v") and name.endswith(".json"):
                    with open(os.path.join(self._meta_dir, name)) as f:
                        live_refs |= {x["path"] for x in json.load(f)["files"]}
            now = time.time()
            for p in glob.glob(
                os.path.join(self.path, "data", "*", "_bucket=*", "*.parquet")
            ):
                rel = os.path.relpath(p, self.path)
                if rel in live_refs:
                    continue
                try:
                    if now - os.path.getmtime(p) < orphan_grace_seconds:
                        continue  # possibly an in-flight commit's file
                    os.remove(p)
                    swept += 1
                except FileNotFoundError:
                    pass  # concurrent cleanup
        return {
            "snapshots_expired": len(expired_versions),
            "files_deleted": deleted,
            "orphans_swept": swept,
            "horizon": horizon,
        }

    def rollback(self, to_version: int) -> dict:
        """Non-destructive rollback (the Iceberg ``rollback_to_snapshot``
        analogue): commit a NEW snapshot whose data state — file list,
        schema pointer, schema map, bucket layout — equals the target
        version's, leaving every intermediate snapshot intact for time
        travel and audit. No data file is touched; files added after the
        target stay on disk (still referenced by the pre-rollback
        snapshots) until ``expire_snapshots`` ages them out.

        The commit-manifest list is RESTORED to the target's list plus one
        ``kind='rollback'`` marker. The manifests are both the exactly-once
        registry and the LSN high-water mark, so keeping post-target
        manifests would make a resumed replay SKIP the very epochs the
        rollback undid (``has_commit`` hits, ``high_lsn`` stays high —
        permanent data loss); truncating them re-opens those (run, epoch)
        slots and regresses the watermark, so the corrected WAL range
        re-applies through the normal idempotent path.

        Consequence for change-feed consumers, enforced in
        ``read_changes``: a feed whose ``since_version`` predates a
        rollback raises — net-change semantics cannot represent
        un-happening (rows the consumer already saw are not deletes, they
        never happened). Consumers re-sync from the rolled-back state, the
        same contract as tombstone purges and snapshot expiration.
        """
        cur = self.current_version()
        if not 1 <= to_version < cur:
            raise ValueError(
                f"rollback target must be an earlier version: "
                f"to_version={to_version}, current={cur}"
            )
        target = self.snapshot_at(to_version)  # raises if expired
        snap = self._next_snapshot()
        for k in ("files", "schema_version", "schemas", "schema_lsn",
                  "n_buckets", "key_columns"):
            snap[k] = target[k]
        snap["bucket_columns"] = (
            target.get("bucket_columns") or target["key_columns"]
        )
        snap["commits"] = list(target["commits"]) + [
            {
                "kind": "rollback",
                "rollback_to": int(to_version),
                "rolled_back_from": cur,
                "at_version": snap["version"],
                "committed_at": time.time(),
            }
        ]
        self._write_snapshot(snap)
        return {
            "rolled_back_to": int(to_version),
            "rolled_back_from": cur,
            "new_version": snap["version"],
            "high_lsn": self.high_lsn(),
        }

    # ------------------------------------------------------------------
    # stats
    # ------------------------------------------------------------------
    def row_count(self) -> int:
        """Physical row count from manifest stats (includes tombstones)."""
        return sum(f["rows"] for f in self.snapshot()["files"])
