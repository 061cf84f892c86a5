"""Debezium-style CDC envelope source → engine event schema.

The reference delegates its inputs to pluggable Embulk input plugins
(BreakinBulkLoader.scala:104-114); the engine's equivalent pluggability is
"any DataFrame whose rows are change-event envelopes". This module parses
the most common real-world envelope — Debezium's JSON change record
(op c/r/u/d, before/after row images, source.lsn, ts_ms) — into the
engine's flat event schema ``(lsn, ts, op, <row image...>, schema_change)``
entirely with JVM-side expressions (``from_json`` + struct field access, no
Python in the row path), so the same parser works in batch reads, file
streams, and a Kafka ``value`` column.

Envelope mapping:
  * ``op``: c (create) / r (snapshot read) → I; u (update) → U; d (delete) → D
  * row image: ``after`` for I/U, ``before`` for D (only the keys matter —
    the applier turns deletes into tombstones)
  * ``lsn``: ``source.lsn`` (monotone WAL position — the LWW order)
  * ``ts``: ``ts_ms`` (epoch millis → timestamp)
  * ``schema_change``: passed through if the producer embeds engine-format
    DDL payloads under that field (Debezium proper emits DDL on a separate
    schema-change topic; feed those through here too, with op='S')
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_filter_copy_spark.lake.schema import spark_type


def envelope_struct(columns: list[tuple[str, object]]) -> T.StructType:
    """Spark schema of one Debezium change record over a row type.
    Column types may be engine type strings or Spark ``DataType``s."""
    row = T.StructType(
        [
            T.StructField(n, spark_type(t) if isinstance(t, str) else t, True)
            for n, t in columns
        ]
    )
    return T.StructType(
        [
            T.StructField("op", T.StringType(), True),
            T.StructField("before", row, True),
            T.StructField("after", row, True),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("lsn", T.LongType(), True),
                        T.StructField("ts_ms", T.LongType(), True),
                    ]
                ),
                True,
            ),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField(
                # Debezium MongoDB-connector partial updates: the changed
                # columns arrive as a JSON document under
                # updateDescription.updatedFields INSTEAD of a full `after`
                # image. Absent from relational envelopes -> null, no cost.
                "updateDescription",
                T.StructType(
                    [T.StructField("updatedFields", T.StringType(), True)]
                ),
                True,
            ),
            T.StructField(
                # MongoDB change-stream / Debezium Mongo document key: the
                # key fields as a JSON document. updatedFields carries only
                # CHANGED fields, so a patch that does not touch a key field
                # has no key there — the key must come from documentKey (or
                # the message key, which producers can copy into this field)
                "documentKey",
                T.StringType(),
                True,
            ),
            T.StructField("schema_change", T.StringType(), True),
        ]
    )


def _event_cols(
    env: Column,
    columns: list[tuple[str, str]],
    key_columns: tuple[str, ...] | None = None,
) -> list[Column]:
    # an update WITHOUT a full after-image but WITH updatedFields is a
    # partial-image patch (Debezium MongoDB oplog shape): op='P', image =
    # the patch document parsed over the row type — absent fields stay
    # NULL, which is exactly the "unchanged" contract
    # `cdc.dedup.fold_patches` resolves. updatedFields carries CHANGED
    # fields only, so a patch not touching a key field has NULL keys there;
    # key_columns coalesce from the envelope's documentKey (relational
    # envelopes always carry `after`, so neither branch fires for them)
    upd = env["updateDescription"]["updatedFields"]
    is_patch = (env["op"] == "u") & env["after"].isNull() & upd.isNotNull()
    op = (
        F.when(env["op"].isin("c", "r"), F.lit("I"))
        .when(env["op"] == "u", F.when(is_patch, F.lit("P")).otherwise(F.lit("U")))
        .when(env["op"] == "d", F.lit("D"))
        .when(env["op"] == "s", F.lit("S"))
        .otherwise(F.lit(None))
    )
    row = T.StructType(
        [
            T.StructField(n, spark_type(t) if isinstance(t, str) else t, True)
            for n, t in columns
        ]
    )
    image = (
        F.when(op == "D", env["before"])
        .when(op == "P", F.from_json(upd, row))
        .otherwise(env["after"])
    )
    ts_ms = F.coalesce(env["ts_ms"], env["source"]["ts_ms"])
    cols = [
        env["source"]["lsn"].alias("lsn"),
        F.timestamp_millis(ts_ms).alias("ts"),
        op.alias("op"),
    ]
    keyset = set(key_columns or ())
    dockey = F.from_json(env["documentKey"], row)
    cols += [
        F.when(op == "P", F.coalesce(image[n], dockey[n]))
        .otherwise(image[n])
        .alias(n)
        if n in keyset
        else image[n].alias(n)
        for n, _ in columns
    ]
    cols.append(env["schema_change"].alias("schema_change"))
    return cols


def parse_debezium(
    df: DataFrame,
    columns: list[tuple[str, str]],
    value_col: str = "value",
    payload_wrapper: bool = False,
    keep_raw: bool = False,
    key_columns: tuple[str, ...] | None = None,
) -> DataFrame:
    """Parse a column of Debezium JSON strings into engine events.

    Source-agnostic: ``df`` can be a file read, a rate stream, or a Kafka
    stream (``value_col="value"`` after ``CAST(value AS STRING)``).
    ``payload_wrapper=True`` unwraps the Connect converter's
    ``{"schema": ..., "payload": {...}}`` framing.

    ``key_columns``: the sink key columns. For partial-image patch events
    (op='P') the key coalesces from the envelope's ``documentKey`` (the
    patch document carries only CHANGED fields, so a patch not touching a
    key field has no key there), and a patch whose key is STILL null after
    the coalesce is flagged ``_bad`` — merging it would fold the update
    into a phantom null-key row, silently losing it; the DLQ keeps the raw
    line recoverable instead.
    """
    schema = envelope_struct(columns)
    if payload_wrapper:
        schema = T.StructType([T.StructField("payload", schema, True)])
    env = F.from_json(F.col(value_col), schema)
    if payload_wrapper:
        env = env["payload"]
    raw = df[value_col]
    out = df.withColumn("_env", env).select(
        *_event_cols(F.col("_env"), columns, key_columns=key_columns),
        raw.alias("_raw"),
    )
    # dead-letter flag: non-null input that either failed to parse OR parsed
    # to an unknown/missing op (anything outside c/r/u/d/s maps op to NULL
    # and would otherwise vanish through every downstream op filter without
    # being counted — both failure shapes route through the same _bad path)
    bad = F.col("_raw").isNotNull() & F.col("op").isNull()
    for k in key_columns or ():
        bad = bad | ((F.col("op") == "P") & F.col(k).isNull())
    out = out.withColumn("_bad", bad)
    return out if keep_raw else out.drop("_raw")


def read_debezium_jsonl(
    spark: SparkSession,
    path: str,
    columns: list[tuple[str, str]],
    streaming: bool = False,
    payload_wrapper: bool = False,
    drop_malformed: bool = True,
    dead_letter_path: str | None = None,
    keep_raw: bool = False,
    options: dict | None = None,
    key_columns: tuple[str, ...] | None = None,
) -> DataFrame:
    """Read newline-delimited Debezium JSON files (batch or file-stream)
    as engine events, ready for ``apply_batch`` / ``replay_stream``.

    Malformed lines (unparseable JSON OR unknown/missing op) carry
    ``_bad=true``; ``drop_malformed`` filters them (count them upstream via
    ``observe`` if a dead-letter metric is needed — keeping the filter
    declarative preserves pushdown of later predicates into the scan).

    ``dead_letter_path`` (batch reads only) captures the RAW offending
    lines plus the source file and a read timestamp as parquet before they
    are filtered — the replayable quarantine a production CDC ingest needs
    (the raw line is the only trustworthy artifact of an unparseable event;
    the parsed columns are garbage by definition). The capture goes into a
    deterministic per-input ``qpart=`` directory with OVERWRITE, so
    re-running the same batch ingest (a normal retry) rewrites the same
    dead letters instead of appending duplicates — the same idempotence
    contract as the streaming path's per-(run, epoch, sink) dirs, and
    ``compact-quarantine`` GCs both. Streaming reads raise: a side write
    inside a streaming plan needs its own sink/foreachBatch, and silently
    skipping the dead letter would be worse than refusing.

    ``keep_raw`` keeps the ``_bad`` flag and ``_raw`` line in the output —
    the streaming replayer uses this (with ``drop_malformed=False``) to
    ride both to its foreachBatch, where the per-epoch DLQ capture lives.
    """
    if dead_letter_path is not None and streaming:
        raise ValueError(
            "dead_letter_path is batch-only: wire a second sink (or "
            "foreachBatch) for streaming dead letters"
        )
    line = T.StructType([T.StructField("value", T.StringType(), True)])
    reader = (spark.readStream if streaming else spark.read).schema(line)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    raw = reader.text(path)
    ev = parse_debezium(
        raw, columns, value_col="value", payload_wrapper=payload_wrapper,
        keep_raw=keep_raw or dead_letter_path is not None,
        key_columns=key_columns,
    )
    if dead_letter_path is not None:
        import hashlib
        import os as _os

        from embulk_filter_copy_spark.cdc.apply import write_quarantine

        # probe first (healthy ingests must not accrete empty qpart dirs),
        # then one extra job over the same scan; Catalyst prunes both to
        # (value -> bad-flag filter), so the cost is a re-read of bad lines
        bad = ev.filter(F.col("_bad"))
        if bad.limit(1).count() > 0:
            write_quarantine(
                bad.select(
                    F.col("_raw").alias("value"),
                    F.input_file_name().alias("source_file"),
                    F.current_timestamp().alias("read_at"),
                ),
                dead_letter_path,
                run_id="batch",
                epoch=0,
                sink_id=hashlib.sha1(
                    _os.path.abspath(path).encode()
                ).hexdigest()[:8],
            )
        if not keep_raw:
            ev = ev.drop("_raw")
    if drop_malformed:
        ev = ev.filter(~F.col("_bad"))
    return ev if keep_raw else ev.drop("_bad")
