"""CDC-semantics queries over the `events` stream table.

These exercise the engine's core semantics (LWW, dedup, salted two-phase
aggregation, sessionization, event-time windows, as-of ordering) through the
driver's correctness gate. `cdc_replay_events` is the flagship: it pushes the
events table through the REAL LakeTable merge path (bucketed copy-on-write,
manifests) and must land on the same final state as a window-function oracle.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from embulk_filter_copy_spark.queries.common import reps, sql_reps, t


# ---------------------------------------------------------------------------
def cdc_replay_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay `events` as a CDC upsert log keyed by user_id through the
    LakeTable merge path (4 epochs), then read the final table state."""
    from embulk_filter_copy_spark.cdc.replayer import replay_batch
    from embulk_filter_copy_spark.lake.table import LakeTable

    ev = (
        t(spark, sf_dir, "events")
        .withColumn("op", F.lit("U"))
        .withColumnRenamed("event_id", "lsn")
        .withColumn("schema_change", F.lit(None).cast("string"))
    )
    root = tempfile.mkdtemp(prefix="efc-replay-q-")
    table = LakeTable.create(
        spark,
        f"{root}/t",
        [("user_id", "long"), ("event_type", "string"), ("value", "double"), ("props", "string")],
        key_columns=["user_id"],
        n_buckets=16,
    )
    replay_batch(spark, ev, table, run_id="q-replay", n_epochs=4)
    return table.read().select(
        "user_id", "event_type", F.round("value", 6).alias("value"), "props"
    )


CDC_REPLAY_SQL = """
SELECT user_id, event_type, round(value, 6) AS value, props
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
def cdc_lww_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.max("event_id").alias("last_event_id"),
        F.max_by("event_type", "event_id").alias("last_event_type"),
        F.round(F.max_by("value", "event_id"), 6).alias("last_value"),
    )


CDC_LWW_SQL = """
SELECT user_id,
       max(event_id) AS last_event_id,
       arg_max(event_type, event_id) AS last_event_type,
       round(arg_max(value, event_id), 6) AS last_value
FROM events GROUP BY user_id
"""


# ---------------------------------------------------------------------------
def cdc_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.select("user_id", "event_id", "event_type")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


CDC_DEDUP_SQL = """
SELECT event_type, count(*) AS n
FROM (SELECT DISTINCT user_id, event_id, event_type FROM events)
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
def cdc_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase local-combine/global-merge with an explicit salt
    (north_rule skew pattern); must equal the plain GROUP BY oracle."""
    ev = t(spark, sf_dir, "events").withColumn(
        "_salt", F.pmod(F.xxhash64("event_id"), F.lit(16))
    )
    local = ev.groupBy("event_type", "_salt").agg(
        F.sum("value").alias("pv"), F.count(F.lit(1)).alias("pn")
    )
    return local.groupBy("event_type").agg(
        reps(F.sum("pv"), 2).alias("total_value"),
        F.sum("pn").alias("n"),
    )


CDC_SALTED_SQL = """
SELECT event_type, round(sum(value) + 1e-9, 2) AS total_value, CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
def cdc_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tsd = F.col("ts").cast("timestamp").cast("double")
    gap = tsd - F.lag(tsd).over(w)
    new_s = F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0))
    g = ev.withColumn("new_s", new_s)
    return g.groupBy("user_id").agg(
        F.sum("new_s").alias("n_sessions"), F.count(F.lit(1)).alias("n_events")
    )


CDC_SESSIONIZE_SQL = """
WITH g AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR (epoch(ts) - epoch(lag(ts) OVER w)) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM g GROUP BY user_id
"""


# ---------------------------------------------------------------------------
def cdc_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.withColumn("hour", F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss"))
        .groupBy("hour", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), reps(F.sum("value"), 2).alias("total_value"))
    )


CDC_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type, count(*) AS n, round(sum(value) + 1e-9, 2) AS total_value
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
def cdc_out_of_order_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disorder measure: events whose ts regresses vs the previous event_id —
    the bounded-disorder property the watermark relies on."""
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("event_id")
    ooo = F.when(F.col("ts") < F.lag("ts").over(w), F.lit(1)).otherwise(F.lit(0))
    return (
        ev.withColumn("ooo", ooo)
        .groupBy("event_type")
        .agg(F.sum("ooo").alias("n_out_of_order"), F.count(F.lit(1)).alias("n"))
    )


CDC_OOO_SQL = """
WITH g AS (
  SELECT event_type,
         CASE WHEN ts < lag(ts) OVER (PARTITION BY event_type ORDER BY event_id)
              THEN 1 ELSE 0 END AS ooo
  FROM events
)
SELECT event_type, CAST(sum(ooo) AS BIGINT) AS n_out_of_order, count(*) AS n
FROM g GROUP BY event_type
"""


# ---------------------------------------------------------------------------
def asof_join_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark lacks a native one): for every click, the most
    recent prior 'view' of the same user, via union + last(ignorenulls) over
    (ts, event_id) ordering — the scalable pattern (no per-row probing)."""
    ev = t(spark, sf_dir, "events")
    marked = ev.withColumn(
        "view_id", F.when(F.col("event_type") == "view", F.col("event_id"))
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    out = marked.withColumn("prior_view_id", F.last("view_id", ignorenulls=True).over(w))
    return out.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "prior_view_id"
    )


ASOF_SQL = """
SELECT c.event_id AS click_id, c.user_id,
       (SELECT v.event_id FROM events v
        WHERE v.user_id = c.user_id AND v.event_type = 'view'
          AND (v.ts < c.ts OR (v.ts = c.ts AND v.event_id < c.event_id))
        ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS prior_view_id
FROM events c WHERE c.event_type = 'click'
"""


# ---------------------------------------------------------------------------
def streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same hourly rollup computed THROUGH Structured Streaming
    (readStream → tumbling event-time window, availableNow) — proves the
    streaming path yields batch-identical results.

    Scale shape: UPDATE output mode with the emissions spilled to parquet
    from inside foreachBatch (executor-side append, never collected to the
    driver) and a distributed last-emission-per-group reduce — complete
    mode + a memory sink would re-emit the whole aggregate every batch and
    hold O(windows × event_types) rows on the driver (the
    streaming_stateful_repo_stats pattern, now shared by both queries)."""
    import tempfile

    schema = t(spark, sf_dir, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)  # the file source needs a directory, not a file
    )
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), reps(F.sum("value"), 2).alias("total_value"))
    )
    out_dir = tempfile.mkdtemp(prefix="efc-hourly-out-")
    q = (
        agg.writeStream.foreachBatch(
            # stamp the epoch so the reduce can pick each group's LAST
            # emission (update mode re-emits a group whenever a batch
            # changes it)
            lambda df, eid: df.withColumn("_eid", F.lit(int(eid)))
            .write.mode("append").parquet(out_dir)
        )
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="efc-hourly-ck-"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.read.parquet(out_dir)
    final = (
        emitted.groupBy("win", "event_type")
        .agg(F.max_by(F.struct("n", "total_value"), F.col("_eid")).alias("_w"))
        .select("win", "event_type", F.col("_w.n").alias("n"),
                F.col("_w.total_value").alias("total_value"))
    )
    return final.select(
        F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
        "n",
        "total_value",
    )


def streaming_stateful_repo_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-key
    running CDC stats accumulated in the checkpointed state store, drained
    with availableNow; the LAST emission per key must equal the batch
    aggregate — proving the Arrow-batched state updates lose nothing."""
    import tempfile

    from embulk_filter_copy_spark.streaming.stateful import repo_change_stats

    schema = t(spark, sf_dir, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select(
            F.col("user_id").cast("string").alias("repo"),
            F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")).alias("op"),
            F.col("event_id").alias("lsn"),
            F.col("ts").cast("timestamp").alias("ts"),
        )
    )
    # update-mode emissions land in a parquet spill dir (executor-side
    # append, NEVER collected to the driver — at scale the emission stream
    # is O(keys x epochs)); the last emission per key is then reduced
    # distributed with one max_by aggregation
    out_dir = tempfile.mkdtemp(prefix="efc-stateful-out-")
    q = (
        repo_change_stats(stream)
        .writeStream.foreachBatch(
            lambda df, eid: df.write.mode("append").parquet(out_dir)
        )
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="efc-stateful-q-"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.read.schema(repo_change_stats(stream).schema).parquet(out_dir)
    payload = [c for c in emitted.columns if c != "repo"]
    order = F.coalesce(F.col("lsn_max"), F.lit(-1))
    return (
        emitted.groupBy("repo")
        .agg(F.max_by(F.struct(*payload), order).alias("_w"))
        .select("repo", *[F.col(f"_w.{c}").alias(c) for c in payload])
    )


STATEFUL_STATS_SQL = """
SELECT CAST(user_id AS VARCHAR) AS repo,
       count(*) AS n_events,
       CAST(sum(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_upserts,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes,
       min(event_id) AS lsn_min,
       max(event_id) AS lsn_max,
       CAST(epoch_ms(max(ts)) AS BIGINT) AS last_ts_ms
FROM events GROUP BY user_id
"""


def join_range_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join: purchases within 1 hour after a click by the same
    user. Equi-key on user_id keeps it a plain shuffle/broadcast hash join
    with the time band as a residual predicate — at 100 TB this co-locates by
    user instead of exploding a pure theta-join."""
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "value",
    )
    j = clicks.join(buys, "user_id").filter(
        (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    return j.select(
        "user_id", "click_id", "purchase_id", reps(F.col("value"), 2).alias("purchase_value")
    )


JOIN_RANGE_SQL = """
WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
           FROM events WHERE event_type = 'click'),
     p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts, value
           FROM events WHERE event_type = 'purchase')
SELECT c.user_id, click_id, purchase_id, round(value + 1e-9, 2) AS purchase_value
FROM c JOIN p ON c.user_id = p.user_id
 AND purchase_ts > click_ts AND purchase_ts <= click_ts + INTERVAL 1 HOUR
"""


def agg_cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, hour-of-day): all four grouping sets in one
    pass (Catalyst expands + partial-aggregates map-side). Null grouping keys
    are coalesced to sentinels so totals are unambiguous cross-engine."""
    e = t(spark, sf_dir, "events").withColumn("hour_of_day", F.hour("ts"))
    c = e.cube("event_type", "hour_of_day").agg(
        F.count(F.lit(1)).alias("n"), reps(F.sum("value"), 2).alias("total_value")
    )
    return c.select(
        F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
        F.coalesce("hour_of_day", F.lit(-1)).cast("int").alias("hour_of_day"),
        "n",
        "total_value",
    )


AGG_CUBE_SQL = """
WITH g AS (
  SELECT event_type, hour(ts) AS hour_of_day, count(*) AS n,
         round(sum(value) + 1e-9, 2) AS total_value
  FROM events GROUP BY CUBE (event_type, hour(ts))
)
SELECT coalesce(event_type, '<all>') AS event_type,
       CAST(coalesce(hour_of_day, -1) AS INT) AS hour_of_day, n, total_value
FROM g
"""


def cdc_replay_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay an ``array<float>`` column through the LakeTable merge path —
    complex (non-primitive) sink columns are first-class: the table schema
    holds the embedding vector, upserts carry it through the bucketed merge,
    and deletes (every 5th key, issued at a later LSN) tombstone it. The
    reference's JSON column type carries arbitrary nested values
    (CopyColumnVisitor.scala:53-56); this is the engine's equivalent. The
    result projects order-stable scalars of the array (dim + folded sum) so
    the oracle hash is float-robust."""
    from embulk_filter_copy_spark.cdc.replayer import replay_batch
    from embulk_filter_copy_spark.lake.table import LakeTable

    emb = t(spark, sf_dir, "embeddings")
    env = lambda df, op, lsn: df.select(
        lsn.alias("lsn"),
        F.timestamp_micros(lsn).alias("ts"),
        F.lit(op).alias("op"),
        "vec_id", "label", "embedding",
        F.lit(None).cast("string").alias("schema_change"),
    )
    upserts = env(emb, "U", F.col("vec_id") + 1)
    deletes = env(emb.filter(F.col("vec_id") % 5 == 0), "D", F.col("vec_id") + 1_000_000)
    ev = upserts.unionByName(deletes)
    root = tempfile.mkdtemp(prefix="efc-replay-emb-")
    table = LakeTable.create(
        spark,
        f"{root}/t",
        [("vec_id", "long"), ("label", "int"), ("embedding", "array<float>")],
        key_columns=["vec_id"],
        n_buckets=8,
    )
    replay_batch(spark, ev, table, run_id="q-replay-emb", n_epochs=2)
    return table.read().select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        reps(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
            4,
        ).alias("vec_sum"),
    )


CDC_REPLAY_EMB_SQL = """
SELECT vec_id, label, CAST(len(embedding) AS INT) AS dim,
       round(list_sum(embedding::DOUBLE[]) + 1e-9, 4) AS vec_sum
FROM embeddings WHERE vec_id % 5 <> 0
"""


# ---------------------------------------------------------------------------
def _scd2_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic SCD2 change log both SCD2 queries share: every ~20th
    event (by LSN hash) is a delete, the rest upserts."""
    from embulk_filter_copy_spark.queries.common import spark_phash

    return (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.col("event_id").alias("lsn"),
            "event_type",
            F.round("value", 6).alias("value"),
        )
        .withColumn(
            "op",
            F.when(
                F.expr(
                    f"pmod({spark_phash('cast(lsn as string)', 'op:')}, 20) = 0"
                ),
                F.lit("D"),
            ).otherwise(F.lit("U")),
        )
    )


def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full SCD2 version history of the synthetic change log: the history
    carries one row per surviving version with its [valid_from, valid_to)
    LSN interval, deletes closing (but not emitting) versions."""
    from embulk_filter_copy_spark.cdc.history import scd2_history

    return scd2_history(
        _scd2_changes(spark, sf_dir), ["user_id"], lsn_col="lsn", op_col="op"
    ).select(
        "user_id", "event_type", "value",
        "valid_from_lsn", "valid_to_lsn", "is_current",
    )


def cdc_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as `cdc_scd2_history`, but maintained INCREMENTALLY: the
    change log is split into 3 LSN-ordered epochs, each appended to a
    version-store LakeTable (`apply_history_batch` — O(batch) append-only,
    manifest-gated exactly-once, NO read of the table per epoch), and
    `read_history` derives the intervals at read time. The checked property
    is incremental == one-shot == SQL oracle. Epoch 1 is applied twice to
    prove replay idempotence through the manifest gate."""
    import tempfile

    from embulk_filter_copy_spark.cdc.history import (
        apply_history_batch,
        create_history_table,
        read_history,
    )

    ev = _scd2_changes(spark, sf_dir)
    lo, hi = ev.agg(F.min("lsn"), F.max("lsn")).first()
    cuts = [lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3]
    root = tempfile.mkdtemp(prefix="efc-scd2-q-")
    table = create_history_table(
        spark,
        f"{root}/h",
        [("user_id", "long"), ("event_type", "string"), ("value", "double")],
        key_cols=["user_id"],
        n_buckets=16,
    )
    epochs = [
        ev.filter(F.col("lsn") <= cuts[0]),
        ev.filter((F.col("lsn") > cuts[0]) & (F.col("lsn") <= cuts[1])),
        ev.filter(F.col("lsn") > cuts[1]),
    ]
    for i, e in enumerate(epochs):
        apply_history_batch(table, e, run_id="q-scd2", epoch=i)
    assert apply_history_batch(table, epochs[0], run_id="q-scd2", epoch=0)["skipped"]
    return read_history(table).select(
        "user_id",
        "event_type",
        F.round("value", 6).alias("value"),
        "valid_from_lsn",
        "valid_to_lsn",
        "is_current",
    )


def _scd2_sql() -> str:
    from embulk_filter_copy_spark.queries.common import duck_phash

    op = (
        f"CASE WHEN ({duck_phash('lsn::VARCHAR', 'op:')} % 20) = 0 "
        "THEN 'D' ELSE 'U' END"
    )
    return f"""
WITH ch AS (
  SELECT user_id, event_id AS lsn, event_type, round(value, 6) AS value,
         {op} AS op
  FROM events
),
h AS (
  SELECT *, lead(lsn) OVER (PARTITION BY user_id ORDER BY lsn) AS valid_to_lsn
  FROM ch
)
SELECT user_id, event_type, value, lsn AS valid_from_lsn, valid_to_lsn,
       (valid_to_lsn IS NULL) AS is_current
FROM h WHERE op <> 'D'
"""


# ---------------------------------------------------------------------------
def cdc_patch_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-image (patch) fold: derive a change log where event_id%7==0
    rows are deletes, event_id%5==0 rows are PATCHES carrying only `value`
    (event_type null = unchanged), the rest full images — then fold per
    user_id with `cdc.dedup.fold_patches` (per-COLUMN last-writer: the
    semantics plain LWW gets wrong on partial images). One shuffle, all
    aggregates partial/map-side. Oracle replays the fold with FILTERed
    arg_max over the same derived log."""
    from embulk_filter_copy_spark.cdc.dedup import fold_patches

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_id") % 7 == 0, F.lit("D"))
        .when(F.col("event_id") % 5 == 0, F.lit("P"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.when(
            (F.col("event_id") % 7 == 0) | (F.col("event_id") % 5 == 0),
            F.lit(None).cast("string"),
        )
        .otherwise(F.col("event_type"))
        .alias("event_type"),
        F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("value"),
    )
    out = fold_patches(ev, keys=("user_id",))
    return out.select(
        "user_id", "lsn", "op", "event_type",
        F.round("value", 6).alias("value"),
    )


def cdc_patch_replay_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-epoch duplicate patch replay through the REAL merge path (the
    round-5 per-piece LSN guard): derive a patch log from `events`
    (%7==0 -> delete, %5==0 -> value-only patch, else full image), split it
    into two LSN-ordered epochs, re-deliver every epoch-0 event with
    lsn%11==0 into epoch 1 as an out-of-horizon duplicate, and apply both
    epochs with ``apply_batch(dedup='patch')`` into a bucketed LakeTable.
    The stale duplicates (patches, full images, AND deletes) must lose per
    piece to the target's LSN while epoch 1's fresh events still apply.
    Oracle: strict sequential per-event replay in LSN order over the
    DISTINCT log (duplicates are exact copies)."""
    from embulk_filter_copy_spark.cdc.apply import apply_batch
    from embulk_filter_copy_spark.lake.table import LakeTable

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").alias("lsn"),
        "ts",
        F.when(F.col("event_id") % 7 == 0, F.lit("D"))
        .when(F.col("event_id") % 5 == 0, F.lit("P"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.when(
            (F.col("event_id") % 7 == 0) | (F.col("event_id") % 5 == 0),
            F.lit(None).cast("string"),
        )
        .otherwise(F.col("event_type"))
        .alias("event_type"),
        F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("value"),
    )
    lo, hi = ev.agg(F.min("lsn"), F.max("lsn")).collect()[0]
    mid = (lo + hi) // 2
    e0 = ev.filter(F.col("lsn") <= mid)
    dups = e0.filter(F.col("lsn") % 11 == 0)
    e1 = ev.filter(F.col("lsn") > mid).unionByName(dups)
    root = tempfile.mkdtemp(prefix="efc-patchdup-q-")
    table = LakeTable.create(
        spark,
        f"{root}/t",
        [("user_id", "long"), ("event_type", "string"), ("value", "double")],
        key_columns=["user_id"],
        n_buckets=16,
    )
    apply_batch(table, e0, run_id="q-pd", epoch=0, dedup="patch")
    apply_batch(table, e1, run_id="q-pd", epoch=1, dedup="patch")
    return table.read().select(
        "user_id", "event_type", F.round("value", 6).alias("value")
    )


CDC_PATCH_REPLAY_DUPS_SQL = """
WITH ev AS (
  SELECT user_id, event_id AS lsn,
         CASE WHEN event_id % 7 = 0 THEN 'D'
              WHEN event_id % 5 = 0 THEN 'P' ELSE 'U' END AS op,
         CASE WHEN event_id % 7 = 0 OR event_id % 5 = 0 THEN NULL
              ELSE event_type END AS event_type,
         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value
  FROM events
),
-- duplicates are exact copies of already-present rows: the sequential
-- oracle replays each event once, in global LSN order
g AS (
  SELECT user_id,
         max(lsn)                 FILTER (op = 'U') AS fl,
         max(lsn)                 FILTER (op = 'D') AS dl,
         arg_max(event_type, lsn) FILTER (op = 'U') AS f_etype,
         arg_max(value, lsn)      FILTER (op = 'U') AS f_value,
         arg_max(value, lsn)      FILTER (op = 'P' AND value IS NOT NULL) AS p_value,
         max(lsn)                 FILTER (op = 'P' AND value IS NOT NULL) AS pl_value
  FROM ev GROUP BY user_id
)
SELECT user_id, f_etype AS event_type,
       round(CASE WHEN pl_value IS NOT NULL AND pl_value > fl
                  THEN p_value ELSE f_value END, 6) AS value
FROM g
WHERE fl IS NOT NULL AND (dl IS NULL OR fl > dl)
"""


CDC_PATCH_FOLD_SQL = """
WITH ev AS (
  SELECT user_id, event_id AS lsn,
         CASE WHEN event_id % 7 = 0 THEN 'D'
              WHEN event_id % 5 = 0 THEN 'P' ELSE 'U' END AS op,
         CASE WHEN event_id % 7 = 0 OR event_id % 5 = 0 THEN NULL
              ELSE event_type END AS event_type,
         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value
  FROM events
),
g0 AS (
  SELECT user_id,
         max(lsn)           FILTER (op <> 'P') AS f_lsn,
         -- the full image rides a STRUCT: arg_max over a bare column would
         -- SKIP null values (a delete's null image) and resurrect an older
         -- non-null one
         arg_max({'op': op, 'etype': event_type, 'val': value}, lsn)
             FILTER (op <> 'P') AS f,
         arg_max(event_type, lsn) FILTER (op = 'P' AND event_type IS NOT NULL) AS p_etype,
         max(lsn)                 FILTER (op = 'P' AND event_type IS NOT NULL) AS pl_etype,
         arg_max(value, lsn)      FILTER (op = 'P' AND value IS NOT NULL) AS p_value,
         max(lsn)                 FILTER (op = 'P' AND value IS NOT NULL) AS pl_value
  FROM ev GROUP BY user_id
),
g AS (
  SELECT user_id, f_lsn, f.op AS f_op, f.etype AS f_etype, f.val AS f_value,
         p_etype, pl_etype, p_value, pl_value
  FROM g0
)
SELECT user_id,
       CASE WHEN f_op = 'D' THEN f_lsn
            ELSE coalesce(
              CASE WHEN pl_value IS NOT NULL AND (f_lsn IS NULL OR pl_value > f_lsn)
                        AND (pl_etype IS NULL OR pl_value >= pl_etype) THEN pl_value
                   WHEN pl_etype IS NOT NULL AND (f_lsn IS NULL OR pl_etype > f_lsn) THEN pl_etype
              END, f_lsn) END AS lsn,
       CASE WHEN f_op = 'D' THEN 'D'
            WHEN f_lsn IS NULL THEN 'P' ELSE f_op END AS op,
       CASE WHEN f_op = 'D' THEN f_etype
            WHEN f_lsn IS NULL THEN p_etype
            WHEN pl_etype IS NOT NULL AND pl_etype > f_lsn THEN p_etype
            ELSE f_etype END AS event_type,
       round(CASE WHEN f_op = 'D' THEN f_value
                  WHEN f_lsn IS NULL THEN p_value
                  WHEN pl_value IS NOT NULL AND pl_value > f_lsn THEN p_value
                  ELSE f_value END, 6) AS value
FROM g
"""


# ---------------------------------------------------------------------------
def cdc_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join of a fact sample against the SCD2 history: each
    fact (every 10th event) picks up the dimension version valid AT its own
    LSN — facts inside deleted gaps keep NULL attributes. Equi-join on the
    key with the interval residual; the oracle replays the interval logic
    verbatim."""
    from embulk_filter_copy_spark.cdc.history import scd2_history, temporal_join

    hist = scd2_history(
        _scd2_changes(spark, sf_dir), ["user_id"], lsn_col="lsn", op_col="op"
    ).select(
        "user_id",
        F.col("event_type").alias("dim_event_type"),
        F.col("value").alias("dim_value"),
        "valid_from_lsn", "valid_to_lsn",
    )
    facts = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 10 == 0)
        .select("user_id", F.col("event_id").alias("at_lsn"))
    )
    return temporal_join(facts, hist, ["user_id"], at_col="at_lsn")


def _temporal_join_sql() -> str:
    from embulk_filter_copy_spark.queries.common import duck_phash

    op = (
        f"CASE WHEN ({duck_phash('lsn::VARCHAR', 'op:')} % 20) = 0 "
        "THEN 'D' ELSE 'U' END"
    )
    return f"""
WITH ch AS (
  SELECT user_id, event_id AS lsn, event_type, round(value, 6) AS value,
         {op} AS op
  FROM events
),
h0 AS (
  SELECT *, lead(lsn) OVER (PARTITION BY user_id ORDER BY lsn) AS valid_to_lsn
  FROM ch
),
h AS (
  SELECT user_id, event_type AS dim_event_type, value AS dim_value,
         lsn AS valid_from_lsn, valid_to_lsn
  FROM h0 WHERE op <> 'D'
),
f AS (
  SELECT user_id, event_id AS at_lsn FROM events WHERE event_id % 10 = 0
)
SELECT f.user_id, f.at_lsn, h.dim_event_type, h.dim_value,
       h.valid_from_lsn, h.valid_to_lsn
FROM f LEFT JOIN h
  ON h.user_id = f.user_id
 AND h.valid_from_lsn <= f.at_lsn
 AND (h.valid_to_lsn IS NULL OR f.at_lsn < h.valid_to_lsn)
"""


# ---------------------------------------------------------------------------
def cdc_changelog_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre/post-image changelog through the REAL snapshot machinery (the
    Iceberg create_changelog_view analogue, `LakeTable.changelog`): replay
    the first half of the event log (op='D' where event_id%7==0, else
    upsert), pin that snapshot, replay the second half, then read the
    changelog between the two — one row per net-changed key with op I/U/D,
    the change lsn, and before_/after_ images. Oracle: state-at-cut vs
    final-LWW full comparison in SQL."""
    from embulk_filter_copy_spark.cdc.replayer import replay_batch
    from embulk_filter_copy_spark.lake.table import LakeTable

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").alias("lsn"),
        "ts",
        F.when(F.col("event_id") % 7 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "event_type",
        "value",
        "props",
        F.lit(None).cast("string").alias("schema_change"),
    )
    lo, hi = ev.agg(F.min("lsn"), F.max("lsn")).collect()[0]
    mid = (lo + hi) // 2
    root = tempfile.mkdtemp(prefix="efc-clog-q-")
    table = LakeTable.create(
        spark,
        f"{root}/t",
        [("user_id", "long"), ("event_type", "string"), ("value", "double"), ("props", "string")],
        key_columns=["user_id"],
        n_buckets=16,
    )
    replay_batch(spark, ev.filter(F.col("lsn") <= mid), table, run_id="q-clog-1", n_epochs=2)
    v_cut = table.current_version()
    replay_batch(spark, ev.filter(F.col("lsn") > mid), table, run_id="q-clog-2", n_epochs=2)
    log = table.changelog(v_cut)
    return log.select(
        "user_id",
        "op",
        "lsn",
        "before_event_type",
        "after_event_type",
        F.round("before_value", 6).alias("before_value"),
        F.round("after_value", 6).alias("after_value"),
        "before_props",
        "after_props",
    )


CDC_CHANGELOG_SQL = """
WITH ev AS (
  SELECT user_id, event_id AS lsn, event_type, value, props,
         CASE WHEN event_id % 7 = 0 THEN 'D' ELSE 'U' END AS op
  FROM events
),
cutv AS (
  SELECT CAST(floor((min(lsn) + max(lsn)) / 2.0) AS BIGINT) AS c FROM ev
),
before_img AS (   -- keys VISIBLE at the cut, with their image
  SELECT user_id, event_type, value, props FROM (
    SELECT user_id, event_type, value, props, op,
           row_number() OVER (PARTITION BY user_id ORDER BY lsn DESC) AS rn
    FROM ev WHERE lsn <= (SELECT c FROM cutv)
  ) WHERE rn = 1 AND op = 'U'
),
final AS (        -- LWW over the whole log
  SELECT user_id, lsn, op, event_type, value, props FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY lsn DESC) AS rn
    FROM ev
  ) WHERE rn = 1
),
chg AS (SELECT * FROM final WHERE lsn > (SELECT c FROM cutv))
SELECT c.user_id,
       CASE WHEN c.op = 'D' THEN 'D'
            WHEN b.user_id IS NOT NULL THEN 'U' ELSE 'I' END AS op,
       c.lsn,
       b.event_type AS before_event_type,
       CASE WHEN c.op = 'D' THEN NULL ELSE c.event_type END AS after_event_type,
       round(b.value, 6) AS before_value,
       CASE WHEN c.op = 'D' THEN NULL ELSE round(c.value, 6) END AS after_value,
       b.props AS before_props,
       CASE WHEN c.op = 'D' THEN NULL ELSE c.props END AS after_props
FROM chg c LEFT JOIN before_img b USING (user_id)
WHERE NOT (c.op = 'D' AND b.user_id IS NULL)
"""


# ---------------------------------------------------------------------------
def cdc_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-maintained aggregate view (`cdc.aggview`): replay the first
    half of the log (op='D' where event_id%7==0) into a LakeTable, FULL-build
    a per-event_type count/sum view, replay the second half, then refresh
    the view INCREMENTALLY from the table's changelog (insert/delete/update
    and group-moving-update delta algebra — no fact rescan). Oracle: plain
    GROUP BY over the LWW-final live rows — the incremental path must land
    on the recompute answer."""
    from embulk_filter_copy_spark.cdc.aggview import build_agg_view, read_agg_view, refresh_agg_view
    from embulk_filter_copy_spark.cdc.replayer import replay_batch
    from embulk_filter_copy_spark.lake.table import LakeTable

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").alias("lsn"),
        "ts",
        F.when(F.col("event_id") % 7 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        "event_type",
        "value",
        F.lit(None).cast("string").alias("schema_change"),
    )
    lo, hi = ev.agg(F.min("lsn"), F.max("lsn")).collect()[0]
    mid = (lo + hi) // 2
    root = tempfile.mkdtemp(prefix="efc-aggview-q-")
    table = LakeTable.create(
        spark,
        f"{root}/t",
        [("user_id", "long"), ("event_type", "string"), ("value", "double")],
        key_columns=["user_id"],
        n_buckets=16,
    )
    replay_batch(spark, ev.filter(F.col("lsn") <= mid), table, run_id="q-av-1", n_epochs=2)
    build_agg_view(spark, table, f"{root}/view", group_cols=["event_type"], sum_cols=["value"])
    replay_batch(spark, ev.filter(F.col("lsn") > mid), table, run_id="q-av-2", n_epochs=2)
    res = refresh_agg_view(spark, table, f"{root}/view")
    assert res["mode"] == "incremental", res  # the point of the query
    return read_agg_view(spark, f"{root}/view").select(
        "event_type",
        "n_rows",
        reps(F.col("sum_value"), 2).alias("sum_value"),
    )


CDC_INCREMENTAL_AGG_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id AS lsn, event_type, value,
         CASE WHEN event_id % 7 = 0 THEN 'D' ELSE 'U' END AS op
  FROM events
),
final AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY lsn DESC) AS rn
    FROM ev
  ) WHERE rn = 1
),
live AS (SELECT * FROM final WHERE op = 'U')
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       {sql_reps('sum(coalesce(value, 0.0))', 2)} AS sum_value
FROM live GROUP BY event_type
"""


# ---------------------------------------------------------------------------
def cdc_rollback_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poison-epoch recovery through `LakeTable.rollback`: replay the first
    half of the log, apply the second half with CORRUPTED payloads, roll
    the table back to the pre-poison snapshot (which re-opens the undone
    epoch's exactly-once slot and regresses the LSN watermark), re-apply
    the CORRECT second half under the same run/epoch, and read the final
    state. Oracle: plain LWW over the clean log — a correct rollback
    leaves no trace of the poison epoch."""
    from embulk_filter_copy_spark.cdc.replayer import replay_batch
    from embulk_filter_copy_spark.lake.table import LakeTable

    ev = (
        t(spark, sf_dir, "events")
        .withColumn("op", F.lit("U"))
        .withColumnRenamed("event_id", "lsn")
        .withColumn("schema_change", F.lit(None).cast("string"))
    )
    lo, hi = ev.agg(F.min("lsn"), F.max("lsn")).collect()[0]
    mid = (lo + hi) // 2
    e1 = ev.filter(F.col("lsn") <= mid)
    e2 = ev.filter(F.col("lsn") > mid)
    root = tempfile.mkdtemp(prefix="efc-rollback-q-")
    table = LakeTable.create(
        spark,
        f"{root}/t",
        [("user_id", "long"), ("event_type", "string"), ("value", "double"), ("props", "string")],
        key_columns=["user_id"],
        n_buckets=16,
    )
    replay_batch(spark, e1, table, run_id="q-rb-1", n_epochs=2)
    v_good = table.current_version()
    poison = e2.withColumn("event_type", F.lit("POISON")).withColumn(
        "value", F.col("value") * F.lit(-1000.0)
    )
    replay_batch(spark, poison, table, run_id="q-rb-2", n_epochs=1)
    table.rollback(v_good)
    replay_batch(spark, e2, table, run_id="q-rb-2", n_epochs=1)
    return table.read().select(
        "user_id", "event_type", F.round("value", 6).alias("value"), "props"
    )


# ---------------------------------------------------------------------------
def cdc_audit_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish recovery (`cdc/audit.py`): replay the first half
    of the log, attempt the second half with CORRUPTED payloads through the
    audited apply — the gate must reject it and un-happen the epoch — then
    re-apply the correct second half under the SAME (run, epoch) (the
    rollback re-opened the slot). Oracle: plain LWW over the clean log —
    the audited pipeline leaves no trace of the rejected epoch."""
    from embulk_filter_copy_spark.cdc.audit import AuditViolation, apply_batch_audited
    from embulk_filter_copy_spark.cdc.replayer import replay_batch
    from embulk_filter_copy_spark.lake.table import LakeTable

    ev = (
        t(spark, sf_dir, "events")
        .withColumn("op", F.lit("U"))
        .withColumnRenamed("event_id", "lsn")
        .withColumn("schema_change", F.lit(None).cast("string"))
    )
    lo, hi = ev.agg(F.min("lsn"), F.max("lsn")).collect()[0]
    mid = (lo + hi) // 2
    e1 = ev.filter(F.col("lsn") <= mid)
    e2 = ev.filter(F.col("lsn") > mid)
    root = tempfile.mkdtemp(prefix="efc-wap-q-")
    table = LakeTable.create(
        spark,
        f"{root}/t",
        [("user_id", "long"), ("event_type", "string"), ("value", "double"), ("props", "string")],
        key_columns=["user_id"],
        n_buckets=16,
    )
    audit = "SELECT * FROM epoch_changes WHERE op = 'U' AND event_type = 'POISON'"
    apply_batch_audited(spark, table, e1, "q-wap", 0, audit)
    poison = e2.withColumn("event_type", F.lit("POISON"))
    try:
        apply_batch_audited(spark, table, poison, "q-wap", 1, audit)
        raise RuntimeError("audit gate failed to reject the poisoned epoch")
    except AuditViolation:
        pass
    apply_batch_audited(spark, table, e2, "q-wap", 1, audit)
    return table.read().select(
        "user_id", "event_type", F.round("value", 6).alias("value"), "props"
    )


# ---------------------------------------------------------------------------
def cdc_shard_merge_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded-WAL ingestion (`cdc/shards.py`): split the event log into 3
    key-disjoint shards (user_id % 3), renumber each shard's LSNs densely
    from 1 — three independent WAL domains, raw-union-incomparable on
    purpose — then merge with the O(1) total-order restamp and replay in
    epochs through the real merge path. Oracle: plain LWW over the
    ORIGINAL unsharded log — the multiplexer must leave no trace."""
    from embulk_filter_copy_spark.cdc.replayer import replay_batch
    from embulk_filter_copy_spark.cdc.shards import merge_wal_shards
    from embulk_filter_copy_spark.lake.table import LakeTable

    ev = (
        t(spark, sf_dir, "events")
        .withColumn("op", F.lit("U"))
        .withColumnRenamed("event_id", "lsn")
        .withColumn("schema_change", F.lit(None).cast("string"))
    )
    shards = []
    for i in range(3):
        s = ev.filter(F.col("user_id") % 3 == i)
        s = s.withColumn(
            "lsn", F.row_number().over(W.orderBy("lsn")).cast("long")
        )
        shards.append(s)
    root = tempfile.mkdtemp(prefix="efc-shards-q-")
    table = LakeTable.create(
        spark,
        f"{root}/t",
        [("user_id", "long"), ("event_type", "string"), ("value", "double"), ("props", "string")],
        key_columns=["user_id"],
        n_buckets=16,
    )
    replay_batch(spark, merge_wal_shards(shards), table, run_id="q-shards", n_epochs=3)
    return table.read().select(
        "user_id", "event_type", F.round("value", 6).alias("value"), "props"
    )


# ---------------------------------------------------------------------------
def cdc_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-ordered compaction + manifest range pruning: replay the log
    into a LakeTable, rewrite it sorted by `value` with 4 disjoint-range
    files per bucket (per-file col_stats), then range-scan via
    `read(stat_filter=...)` — the scan plans only the files whose recorded
    range intersects, asserted inside the query. Oracle: LWW state
    filtered by the same predicate."""
    from embulk_filter_copy_spark.cdc.replayer import replay_batch
    from embulk_filter_copy_spark.lake.table import LakeTable

    ev = (
        t(spark, sf_dir, "events")
        .withColumn("op", F.lit("U"))
        .withColumnRenamed("event_id", "lsn")
        .withColumn("schema_change", F.lit(None).cast("string"))
    )
    root = tempfile.mkdtemp(prefix="efc-range-q-")
    table = LakeTable.create(
        spark,
        f"{root}/t",
        [("user_id", "long"), ("event_type", "string"), ("value", "double"), ("props", "string")],
        key_columns=["user_id"],
        n_buckets=8,
    )
    replay_batch(spark, ev, table, run_id="q-range", n_epochs=2)
    table.compact(sort_by=["value"], files_per_bucket_out=4)
    lo, hi = 100.0, 400.0
    pruned = [
        f for f in table.files()
        if "col_stats" in f
        and not (f["col_stats"]["value"][1] < lo or f["col_stats"]["value"][0] > hi)
    ]
    assert 0 < len(pruned) < len(table.files()), "range pruning had no effect"
    return table.read(stat_filter=("value", lo, hi)).select(
        "user_id", "event_type", F.round("value", 6).alias("value"), "props"
    )


CDC_RANGE_SCAN_SQL = """
SELECT user_id, event_type, round(value, 6) AS value, props
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND value >= 100.0 AND value <= 400.0
"""


# ---------------------------------------------------------------------------
def cdc_ddl_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactional DDL sequenced inside the replay: a mid-stream op='S'
    DROP of `props` (at the half-way LSN) followed by an ADD of `score`
    lands between the merges; events before the drop wrote props, events
    after it are projected off, and the final table carries the evolved
    schema (props gone, score NULL — fresh field id). Oracle: plain LWW
    over the surviving columns."""
    import json as _json

    from embulk_filter_copy_spark.cdc.replayer import replay_batch
    from embulk_filter_copy_spark.lake.table import LakeTable

    ev = (
        t(spark, sf_dir, "events")
        .withColumn("op", F.lit("U"))
        .withColumnRenamed("event_id", "lsn")
        .withColumn("schema_change", F.lit(None).cast("string"))
    )
    lo, hi = ev.agg(F.min("lsn"), F.max("lsn")).collect()[0]
    mid = (lo + hi) // 2
    ddl = spark.createDataFrame(
        [
            (mid, "S", _json.dumps({"action": "drop", "column": "props"})),
            (mid + 1, "S", _json.dumps({"action": "add", "column": "score", "type": "long"})),
        ],
        "lsn long, op string, schema_change string",
    )
    # DDL rows ride the same ordered log (lsn gives them their place);
    # missing payload columns are NULL, exactly like a real WAL's S rows
    log = ev.unionByName(ddl, allowMissingColumns=True).filter(
        ~F.col("lsn").isin(mid, mid + 1) | (F.col("op") == "S")
    )
    root = tempfile.mkdtemp(prefix="efc-ddl-q-")
    table = LakeTable.create(
        spark,
        f"{root}/t",
        [("user_id", "long"), ("event_type", "string"), ("value", "double"), ("props", "string")],
        key_columns=["user_id"],
        n_buckets=16,
    )
    replay_batch(spark, log, table, run_id="q-ddl", n_epochs=2)
    out = table.read()
    assert "props" not in out.columns and "score" in out.columns
    return out.select(
        "user_id", "event_type", F.round("value", 6).alias("value"), "score"
    )


CDC_DDL_REPLAY_SQL = """
WITH cutv AS (
  SELECT CAST(floor((min(event_id) + max(event_id)) / 2.0) AS BIGINT) AS c
  FROM events
)
SELECT user_id, event_type, round(value, 6) AS value,
       CAST(NULL AS BIGINT) AS score
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events WHERE event_id NOT IN (SELECT c FROM cutv)
                AND event_id NOT IN (SELECT c + 1 FROM cutv)
) WHERE rn = 1
"""


QUERIES = {
    "cdc_replay_events": (cdc_replay_events, CDC_REPLAY_SQL),
    "cdc_ddl_replay": (cdc_ddl_replay, CDC_DDL_REPLAY_SQL),
    "cdc_range_scan": (cdc_range_scan, CDC_RANGE_SCAN_SQL),
    "cdc_changelog_images": (cdc_changelog_images, CDC_CHANGELOG_SQL),
    "cdc_rollback_replay": (cdc_rollback_replay, CDC_REPLAY_SQL),
    "cdc_audit_gate": (cdc_audit_gate, CDC_REPLAY_SQL),
    "cdc_shard_merge_replay": (cdc_shard_merge_replay, CDC_REPLAY_SQL),
    "cdc_incremental_agg": (cdc_incremental_agg, CDC_INCREMENTAL_AGG_SQL),
    "cdc_patch_fold": (cdc_patch_fold, CDC_PATCH_FOLD_SQL),
    "cdc_patch_replay_dups": (cdc_patch_replay_dups, CDC_PATCH_REPLAY_DUPS_SQL),
    "cdc_temporal_join": (cdc_temporal_join, _temporal_join_sql()),
    "cdc_scd2_history": (cdc_scd2_history, _scd2_sql()),
    "cdc_scd2_incremental": (cdc_scd2_incremental, _scd2_sql()),
    "cdc_replay_embeddings": (cdc_replay_embeddings, CDC_REPLAY_EMB_SQL),
    "cdc_lww_latest": (cdc_lww_latest, CDC_LWW_SQL),
    "cdc_dedup_exact": (cdc_dedup_exact, CDC_DEDUP_SQL),
    "cdc_salted_agg": (cdc_salted_agg, CDC_SALTED_SQL),
    "cdc_sessionize": (cdc_sessionize, CDC_SESSIONIZE_SQL),
    "cdc_hourly_rollup": (cdc_hourly_rollup, CDC_HOURLY_SQL),
    "cdc_out_of_order_rate": (cdc_out_of_order_rate, CDC_OOO_SQL),
    "asof_join_clicks": (asof_join_clicks, ASOF_SQL),
    "join_range_click_purchase": (join_range_click_purchase, JOIN_RANGE_SQL),
    "agg_cube_events": (agg_cube_events, AGG_CUBE_SQL),
    "streaming_hourly_counts": (streaming_hourly_counts, CDC_HOURLY_SQL),
    "streaming_stateful_repo_stats": (streaming_stateful_repo_stats, STATEFUL_STATS_SQL),
}
