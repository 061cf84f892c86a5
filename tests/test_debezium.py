"""Debezium envelope source: JSON change records → engine events → applied
table state matches applying the equivalent native events."""

import json

import pytest
import os

from pyspark.sql import functions as F

from embulk_filter_copy_spark.cdc.apply import apply_batch
from embulk_filter_copy_spark.fixtures import REPO_FILES_SCHEMA
from embulk_filter_copy_spark.lake.table import LakeTable
from embulk_filter_copy_spark.sources.debezium import parse_debezium, read_debezium_jsonl


def _row(repo, path, commit="c0", lang="py", content="x"):
    return {"repo": repo, "path": path, "commit": commit, "lang": lang, "content": content}


def _records():
    return [
        {"op": "c", "before": None, "after": _row("r1", "a.py", content="v1"),
         "source": {"lsn": 1, "ts_ms": 1000}, "ts_ms": 1000, "schema_change": None},
        {"op": "r", "before": None, "after": _row("r1", "b.py", content="snap"),
         "source": {"lsn": 2, "ts_ms": 2000}, "ts_ms": None, "schema_change": None},
        {"op": "u", "before": _row("r1", "a.py", content="v1"),
         "after": _row("r1", "a.py", content="v2"),
         "source": {"lsn": 3, "ts_ms": 3000}, "ts_ms": 3000, "schema_change": None},
        {"op": "d", "before": _row("r1", "b.py"), "after": None,
         "source": {"lsn": 4, "ts_ms": 4000}, "ts_ms": 4000, "schema_change": None},
    ]


def _write_jsonl(tmp_path, records, wrap=False, junk=False):
    p = os.path.join(str(tmp_path), "wal")
    os.makedirs(p, exist_ok=True)
    lines = [json.dumps({"payload": r} if wrap else r) for r in records]
    if junk:
        lines.insert(1, "{not json at all")
    with open(os.path.join(p, "part-0.jsonl"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return p


def test_parse_ops_images_and_lsn(spark, tmp_path):
    p = _write_jsonl(tmp_path, _records())
    ev = read_debezium_jsonl(spark, p, REPO_FILES_SCHEMA).orderBy("lsn").collect()
    assert [r["op"] for r in ev] == ["I", "I", "U", "D"]
    assert [r["lsn"] for r in ev] == [1, 2, 3, 4]
    assert ev[2]["content"] == "v2"            # update carries after-image
    assert ev[3]["path"] == "b.py"             # delete carries before-image keys
    assert ev[1]["ts"] is not None             # ts falls back to source.ts_ms
    assert ev[0]["ts"].isoformat().startswith("1970-01-01T00:00:01")


def test_payload_wrapper_and_malformed_lines(spark, tmp_path):
    p = _write_jsonl(tmp_path, _records(), wrap=True, junk=True)
    ev = read_debezium_jsonl(spark, p, REPO_FILES_SCHEMA, payload_wrapper=True)
    assert ev.count() == 4                     # junk line dropped
    kept = read_debezium_jsonl(
        spark, p, REPO_FILES_SCHEMA, payload_wrapper=True, drop_malformed=False
    )
    assert kept.count() == 5
    assert kept.filter(F.col("_bad")).count() == 1


def test_debezium_apply_matches_native_events(spark, tmp_path):
    p = _write_jsonl(tmp_path, _records())
    ev = read_debezium_jsonl(spark, p, REPO_FILES_SCHEMA)

    t1 = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t1"), REPO_FILES_SCHEMA,
        key_columns=["repo", "path"], n_buckets=4,
    )
    apply_batch(t1, ev, run_id="dbz", epoch=0)

    # same events built natively
    native = spark.createDataFrame(
        [(r["source"]["lsn"],
          {"c": "I", "r": "I", "u": "U", "d": "D"}[r["op"]],
          (r["after"] or r["before"])["repo"],
          (r["after"] or r["before"])["path"],
          (r["after"] or r["before"])["commit"],
          (r["after"] or r["before"])["lang"],
          (r["after"] or r["before"])["content"])
         for r in _records()],
        "lsn long, op string, repo string, path string, commit string, lang string, content string",
    ).withColumn("ts", F.timestamp_millis(F.col("lsn") * 1000))
    t2 = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t2"), REPO_FILES_SCHEMA,
        key_columns=["repo", "path"], n_buckets=4,
    )
    apply_batch(t2, native, run_id="nat", epoch=0)

    a = sorted(tuple(r) for r in t1.read().collect())
    b = sorted(tuple(r) for r in t2.read().collect())
    assert a == b and len(a) == 1              # only a.py@v2 survives (b.py deleted)


def test_streaming_replay_from_debezium_wal(spark, tmp_path):
    """End-to-end: Debezium jsonl WAL → replay_stream → final table state."""
    from embulk_filter_copy_spark.cdc.replayer import replay_stream

    p = _write_jsonl(tmp_path, _records())
    sink = os.path.join(str(tmp_path), "sink")
    LakeTable.create(spark, sink, REPO_FILES_SCHEMA,
                     key_columns=["repo", "path"], n_buckets=4)
    res = replay_stream(
        spark, p, sink, checkpoint=os.path.join(str(tmp_path), "ckpt"),
        source_format="debezium-jsonl",
    )
    assert sum(r.get("rows_applied", 0) for r in res) > 0
    rows = LakeTable.load(spark, sink).read().collect()
    assert len(rows) == 1 and rows[0]["content"] == "v2"


def test_streaming_replay_derives_image_schema_from_sink(spark, tmp_path):
    """The Debezium path must NOT assume the demo column set: with a sink of
    a different shape, the row image is parsed using the sink's own schema."""
    from embulk_filter_copy_spark.cdc.replayer import replay_stream

    schema = [("id", "long"), ("name", "string"), ("score", "double")]
    recs = [
        {"op": "c", "before": None, "after": {"id": 1, "name": "a", "score": 0.5},
         "source": {"lsn": 1, "ts_ms": 1000}, "ts_ms": 1000, "schema_change": None},
        {"op": "u", "before": None, "after": {"id": 1, "name": "a2", "score": 0.7},
         "source": {"lsn": 2, "ts_ms": 2000}, "ts_ms": 2000, "schema_change": None},
        {"op": "c", "before": None, "after": {"id": 2, "name": "b", "score": 0.1},
         "source": {"lsn": 3, "ts_ms": 3000}, "ts_ms": 3000, "schema_change": None},
    ]
    p = _write_jsonl(tmp_path, recs)
    sink = os.path.join(str(tmp_path), "sink")
    LakeTable.create(spark, sink, schema, key_columns=["id"], n_buckets=2)
    replay_stream(
        spark, p, sink, checkpoint=os.path.join(str(tmp_path), "ckpt"),
        keys=("id",), source_format="debezium-jsonl",
    )
    rows = {r["id"]: (r["name"], r["score"]) for r in LakeTable.load(spark, sink).read().collect()}
    assert rows == {1: ("a2", 0.7), 2: ("b", 0.1)}


def test_streaming_read_shape(spark, tmp_path):
    p = _write_jsonl(tmp_path, _records())
    ev = read_debezium_jsonl(spark, p, REPO_FILES_SCHEMA, streaming=True)
    assert ev.isStreaming
    out = (
        ev.writeStream.format("memory").queryName("dbz_stream")
        .trigger(availableNow=True).start()
    )
    out.awaitTermination()
    assert spark.sql("select count(*) n from dbz_stream").collect()[0]["n"] == 4


def test_unknown_op_routes_to_dead_letter(spark, tmp_path):
    """Valid JSON with a missing/unrecognized op must be flagged _bad, not
    silently vanish through downstream op filters (round-1 advice finding)."""
    recs = _records() + [
        {"op": "x", "before": None, "after": _row("r9", "z.py"),
         "source": {"lsn": 9, "ts_ms": 9000}, "ts_ms": 9000, "schema_change": None},
        {},  # empty object: parses, no op
    ]
    p = _write_jsonl(tmp_path, recs, junk=True)
    kept = read_debezium_jsonl(spark, p, REPO_FILES_SCHEMA, drop_malformed=False)
    assert kept.filter(F.col("_bad")).count() == 3   # junk + unknown-op + empty
    assert read_debezium_jsonl(spark, p, REPO_FILES_SCHEMA).count() == 4


def test_kafka_shaped_stream_with_schema_change_topic(spark, tmp_path):
    """The Kafka-value route end-to-end: Connect-converter payload framing
    (payload_wrapper=True) + a schema-change-topic event (op='s') driven
    through replay_stream — the DDL must apply BEFORE later data events and
    the final rows must land in the evolved schema."""
    import json as _json

    from embulk_filter_copy_spark.cdc.replayer import replay_stream

    recs = [
        {"op": "c", "before": None, "after": _row("r1", "a.py", content="v1"),
         "source": {"lsn": 1, "ts_ms": 1000}, "ts_ms": 1000, "schema_change": None},
        # schema-change topic event: add a column mid-stream
        {"op": "s", "before": None, "after": None,
         "source": {"lsn": 2, "ts_ms": 2000}, "ts_ms": 2000,
         "schema_change": _json.dumps({"action": "add", "column": "stars", "type": "int"})},
        {"op": "u", "before": None, "after": _row("r1", "a.py", content="v2"),
         "source": {"lsn": 3, "ts_ms": 3000}, "ts_ms": 3000, "schema_change": None},
    ]
    p = _write_jsonl(tmp_path, recs, wrap=True)
    tbl_path = os.path.join(str(tmp_path), "tbl")
    t = LakeTable.create(spark, tbl_path, REPO_FILES_SCHEMA,
                         key_columns=["repo", "path"], n_buckets=2)
    replay_stream(
        spark, p, tbl_path, checkpoint=os.path.join(str(tmp_path), "ck"),
        source_format="debezium-jsonl", payload_wrapper=True,
    )
    got = t.read().collect()
    assert [f.name for f in t.schema.fields][-1] == "stars"
    assert len(got) == 1 and got[0]["content"] == "v2"
    assert got[0]["stars"] is None  # added column, no value yet
    assert t.schema_lsn == 2


def test_kafka_source_wiring_requires_connector(spark, tmpdir_path):
    """replay_stream(source_format='kafka') builds readStream.format('kafka')
    with CAST(value AS STRING) funneled into the same parse_debezium the
    file stream uses. The sandbox classpath has no spark-sql-kafka package,
    so constructing the reader must fail with the missing-data-source error
    — proving the branch is wired (NOT silently falling back to files).
    With the package present the identical call tails a live topic."""
    import os

    import pytest

    from embulk_filter_copy_spark.cdc.replayer import replay_stream
    from embulk_filter_copy_spark.lake.table import LakeTable

    sink = os.path.join(tmpdir_path, "ksink")
    LakeTable.create(spark, sink, [("repo", "string"), ("path", "string"), ("content", "string")],
                     key_columns=["repo", "path"], n_buckets=2)
    with pytest.raises(Exception, match="(?i)kafka"):
        replay_stream(
            spark, "cdc-topic", sink,
            checkpoint=os.path.join(tmpdir_path, "kck"),
            source_format="kafka",
            kafka_options={"kafka.bootstrap.servers": "localhost:9092",
                           "startingOffsets": "earliest"},
        )


def test_kafka_source_integration_against_broker():
    """Documents the real-broker invocation; needs infrastructure the
    sandbox lacks."""
    import pytest

    pytest.skip(
        "needs a Kafka broker + spark-sql-kafka on the classpath: "
        "spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.0 "
        "then replay_stream(spark, 'cdc-topic', sinks, checkpoint=..., "
        "source_format='kafka', kafka_options={'kafka.bootstrap.servers': ...}); "
        "the value column takes the identical parse_debezium path the "
        "file-stream e2e test (test_debezium_file_stream_*) verifies."
    )


def test_parse_mongo_patch_envelope(spark):
    """Debezium MongoDB partial update: no after image, changed fields in
    updateDescription.updatedFields -> op='P' with NULLs for untouched
    columns (the fold_patches 'unchanged' contract)."""
    import json

    from embulk_filter_copy_spark.sources.debezium import parse_debezium

    cols = [("repo", "string"), ("path", "string"),
            ("commit", "string"), ("content", "string")]
    lines = [
        # full-image relational update stays 'U'
        json.dumps({"op": "u",
                    "after": {"repo": "r1", "path": "p", "commit": "c2",
                              "content": "full"},
                    "source": {"lsn": 2, "ts_ms": 1000}}),
        # mongo-style patch: keys + one changed column
        json.dumps({"op": "u", "after": None,
                    "updateDescription": {"updatedFields": json.dumps(
                        {"repo": "r1", "path": "p", "content": "patched"})},
                    "source": {"lsn": 3, "ts_ms": 2000}}),
        # update with neither image stays 'U' (not silently patched)
        json.dumps({"op": "u", "source": {"lsn": 4, "ts_ms": 3000}}),
    ]
    df = spark.createDataFrame([(s,) for s in lines], "value string")
    out = {r["lsn"]: r for r in parse_debezium(df, cols).collect()}
    assert out[2]["op"] == "U" and out[2]["content"] == "full"
    assert out[3]["op"] == "P"
    assert out[3]["content"] == "patched" and out[3]["commit"] is None
    assert (out[3]["repo"], out[3]["path"]) == ("r1", "p")
    assert out[4]["op"] == "U" and not out[4]["_bad"]


def test_mongo_patch_stream_end_to_end(spark, tmp_path):
    """jsonl patch envelopes -> parse -> apply_batch(dedup='patch'): the
    full Mongo-CDC ingest path lands per-column folded state."""
    import json

    from embulk_filter_copy_spark.cdc.apply import apply_batch
    from embulk_filter_copy_spark.lake.table import LakeTable
    from embulk_filter_copy_spark.sources.debezium import read_debezium_jsonl

    cols = [("repo", "string"), ("path", "string"),
            ("commit", "string"), ("content", "string")]
    lines = [
        json.dumps({"op": "c",
                    "after": {"repo": "r1", "path": "p", "commit": "c1",
                              "content": "v1"},
                    "source": {"lsn": 1, "ts_ms": 1000}}),
        json.dumps({"op": "u", "after": None,
                    "updateDescription": {"updatedFields": json.dumps(
                        {"repo": "r1", "path": "p", "content": "v2"})},
                    "source": {"lsn": 2, "ts_ms": 2000}}),
    ]
    src = tmp_path / "dbz"
    src.mkdir()
    (src / "events.jsonl").write_text("\n".join(lines) + "\n")
    ev = read_debezium_jsonl(spark, str(src), cols)
    table = LakeTable.create(
        spark, str(tmp_path / "t"), cols, key_columns=["repo", "path"],
        n_buckets=4,
    )
    apply_batch(table, ev, run_id="m", epoch=0, dedup="patch")
    row = table.read().collect()[0]
    # patch applied over the created image: commit survives, content patched
    assert (row["commit"], row["content"]) == ("c1", "v2")


def test_dead_letter_path_captures_raw_lines(spark, tmp_path):
    import json

    from embulk_filter_copy_spark.sources.debezium import read_debezium_jsonl

    cols = [("repo", "string"), ("path", "string")]
    good = json.dumps({"op": "c", "after": {"repo": "r", "path": "p"},
                       "source": {"lsn": 1, "ts_ms": 1}})
    lines = [good, "{not json", json.dumps({"op": "zz"})]
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.jsonl").write_text("\n".join(lines) + "\n")
    dlq = str(tmp_path / "dlq")
    ev = read_debezium_jsonl(spark, str(src), cols, dead_letter_path=dlq)
    assert ev.count() == 1  # only the good line survives
    dead = spark.read.parquet(dlq)
    vals = {r["value"] for r in dead.collect()}
    assert vals == {"{not json", json.dumps({"op": "zz"})}
    assert all(r["source_file"].endswith("a.jsonl") for r in dead.collect())
    with pytest.raises(ValueError, match="batch-only"):
        read_debezium_jsonl(spark, str(src), cols, streaming=True,
                            dead_letter_path=dlq)


def test_streaming_dead_letter_capture(spark, tmp_path):
    """debezium-jsonl stream with a DLQ: malformed lines land as raw bytes
    under the quarantine-dir machinery, well-formed events apply, and a
    checkpoint re-run does not duplicate the captured lines."""
    from embulk_filter_copy_spark.cdc.apply import read_quarantine
    from embulk_filter_copy_spark.cdc.replayer import replay_stream
    from embulk_filter_copy_spark.lake.table import LakeTable

    cols = [("repo", "string"), ("path", "string"), ("content", "string")]
    good = json.dumps({"op": "c",
                       "after": {"repo": "r", "path": "p", "content": "v"},
                       "source": {"lsn": 1, "ts_ms": 1000}})
    bad1, bad2 = "{corrupt", json.dumps({"op": "??", "source": {"lsn": 9}})
    src = tmp_path / "wal"
    src.mkdir()
    (src / "a.jsonl").write_text("\n".join([good, bad1, bad2]) + "\n")
    table = LakeTable.create(
        spark, str(tmp_path / "t"), cols, key_columns=["repo", "path"],
        n_buckets=4,
    )
    dlq = str(tmp_path / "dlq")
    replay_stream(
        spark, str(src), str(tmp_path / "t"),
        checkpoint=str(tmp_path / "ck"),
        source_format="debezium-jsonl", dead_letter=dlq,
    )
    assert table.read().count() == 1
    captured = {r["value"] for r in read_quarantine(spark, dlq).collect()}
    assert captured == {bad1, bad2}
    # re-run the finished checkpoint: no new epochs -> DLQ unchanged
    replay_stream(
        spark, str(src), str(tmp_path / "t"),
        checkpoint=str(tmp_path / "ck"),
        source_format="debezium-jsonl", dead_letter=dlq,
    )
    assert read_quarantine(spark, dlq).count() == 2


def test_dead_letter_rejected_for_parquet_source(spark, tmp_path):
    from embulk_filter_copy_spark.cdc.replayer import replay_stream

    with pytest.raises(ValueError, match="envelope sources"):
        replay_stream(
            spark, str(tmp_path / "wal"), str(tmp_path / "t"),
            checkpoint=str(tmp_path / "ck"), dead_letter=str(tmp_path / "d"),
        )


def test_mongo_patch_key_from_document_key(spark):
    """A Mongo patch that does not touch key fields has no key in
    updatedFields (changed fields only) — the key must coalesce from the
    envelope's documentKey, else the update folds into a phantom null-key
    row and is silently lost (round-4 review finding)."""
    import json

    from embulk_filter_copy_spark.sources.debezium import parse_debezium

    cols = [("repo", "string"), ("path", "string"), ("content", "string")]
    lines = [
        # patch touching ONLY a non-key column; key rides in documentKey
        json.dumps({"op": "u", "after": None,
                    "documentKey": json.dumps({"repo": "r1", "path": "p"}),
                    "updateDescription": {"updatedFields": json.dumps(
                        {"content": "patched"})},
                    "source": {"lsn": 5, "ts_ms": 1000}}),
        # patch with key fields in the patch doc AND documentKey: the patch
        # doc wins (coalesce order), both agree anyway
        json.dumps({"op": "u", "after": None,
                    "documentKey": json.dumps({"repo": "r1", "path": "p"}),
                    "updateDescription": {"updatedFields": json.dumps(
                        {"repo": "r1", "path": "p", "content": "x"})},
                    "source": {"lsn": 6, "ts_ms": 1000}}),
    ]
    df = spark.createDataFrame([(s,) for s in lines], "value string")
    out = {r["lsn"]: r for r in parse_debezium(
        df, cols, key_columns=("repo", "path")).collect()}
    assert out[5]["op"] == "P" and not out[5]["_bad"]
    assert (out[5]["repo"], out[5]["path"]) == ("r1", "p")
    assert out[5]["content"] == "patched"
    assert (out[6]["repo"], out[6]["path"]) == ("r1", "p")


def test_mongo_patch_null_key_routes_to_dead_letter(spark):
    """A patch whose key is null even after the documentKey coalesce is
    flagged _bad — merging it would fold the update into a null-key
    tombstone and silently lose it; the DLQ keeps the raw line."""
    import json

    from embulk_filter_copy_spark.sources.debezium import parse_debezium

    cols = [("repo", "string"), ("path", "string"), ("content", "string")]
    line = json.dumps({"op": "u", "after": None,
                       "updateDescription": {"updatedFields": json.dumps(
                           {"content": "lost?"})},
                       "source": {"lsn": 7, "ts_ms": 1000}})
    df = spark.createDataFrame([(line,)], "value string")
    out = parse_debezium(df, cols, key_columns=("repo", "path")).collect()
    assert len(out) == 1 and out[0]["_bad"]
    # without key_columns the caller gets the old permissive behavior
    out2 = parse_debezium(df, cols).collect()
    assert not out2[0]["_bad"]


def test_batch_dead_letter_retry_is_idempotent(spark, tmp_path):
    """Re-running the same batch ingest (a normal retry) must not append
    duplicate dead-letter rows: the capture overwrites a deterministic
    per-input qpart directory (round-4 review finding)."""
    import json

    from embulk_filter_copy_spark.cdc.apply import read_quarantine
    from embulk_filter_copy_spark.sources.debezium import read_debezium_jsonl

    cols = [("repo", "string"), ("path", "string")]
    good = json.dumps({"op": "c", "after": {"repo": "r", "path": "p"},
                       "source": {"lsn": 1, "ts_ms": 1}})
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.jsonl").write_text("\n".join([good, "{corrupt"]) + "\n")
    dlq = str(tmp_path / "dlq")
    for _ in range(3):  # ingest + two retries
        ev = read_debezium_jsonl(spark, str(src), cols, dead_letter_path=dlq)
        assert ev.count() == 1
    dead = read_quarantine(spark, dlq).collect()
    assert len(dead) == 1 and dead[0]["value"] == "{corrupt"


def test_dlq_redrive_recovers_healed_lines(spark, tmp_path):
    """Poison a stream (payload-wrapped lines read without the wrapper ->
    every line dead-letters), redrive with the corrected option, and the
    sink equals the never-poisoned oracle. A second redrive is a no-op
    (per-directory epochs already committed) and a permanently-corrupt
    line stays dead."""
    from embulk_filter_copy_spark.cdc.replayer import (
        redrive_dead_letters,
        replay_stream,
    )
    from embulk_filter_copy_spark.lake.table import LakeTable

    cols = [("repo", "string"), ("path", "string"), ("content", "string")]
    wrapped = [
        json.dumps({"payload": {
            "op": "c",
            "after": {"repo": "r1", "path": "p", "content": "v1"},
            "source": {"lsn": 1, "ts_ms": 1000}}}),
        json.dumps({"payload": {
            "op": "u",
            "after": {"repo": "r1", "path": "p", "content": "v2"},
            "source": {"lsn": 2, "ts_ms": 2000}}}),
        "{never-parseable",
    ]
    src = tmp_path / "wal"
    src.mkdir()
    (src / "a.jsonl").write_text("\n".join(wrapped) + "\n")
    table = LakeTable.create(
        spark, str(tmp_path / "t"), cols, key_columns=["repo", "path"],
        n_buckets=4,
    )
    dlq = str(tmp_path / "dlq")
    # misconfigured consumer: wrapper framing not unwrapped -> all bad
    replay_stream(
        spark, str(src), str(tmp_path / "t"),
        checkpoint=str(tmp_path / "ck"),
        source_format="debezium-jsonl", dead_letter=dlq,
    )
    assert table.read().count() == 0

    res = redrive_dead_letters(
        spark, dlq, str(tmp_path / "t"), payload_wrapper=True
    )
    assert res["rows_applied"] == 1 and res["still_dead"] == 1
    rows = table.read().collect()
    assert len(rows) == 1 and rows[0]["content"] == "v2"

    # oracle: the same lines replayed healthy into a fresh table
    oracle = LakeTable.create(
        spark, str(tmp_path / "o"), cols, key_columns=["repo", "path"],
        n_buckets=4,
    )
    replay_stream(
        spark, str(src), str(tmp_path / "o"),
        checkpoint=str(tmp_path / "cko"),
        source_format="debezium-jsonl", payload_wrapper=True,
        dead_letter=str(tmp_path / "dlqo"),
    )
    assert sorted(map(tuple, oracle.read().collect())) == sorted(
        map(tuple, table.read().collect())
    )

    # idempotent re-run: committed directory skips, nothing re-applies
    res2 = redrive_dead_letters(
        spark, dlq, str(tmp_path / "t"), payload_wrapper=True
    )
    assert res2["dirs_skipped"] == 1 and res2["rows_applied"] == 0

    # CLI surface
    from embulk_filter_copy_spark import cli

    cli.main([
        "--master", "local[4]", "redrive", "--dead-letter", dlq,
        "--sink", str(tmp_path / "t"), "--payload-wrapper",
    ])


def test_dlq_redrive_after_compaction(spark, tmp_path):
    """compact-quarantine folds DLQ dirs into a qcompact= dir; redrive
    consumes the compacted layout the same way, and re-running after the
    fold re-applies rows whose merge is a no-op under the LSN guard (the
    dir digest changed, the rows didn't)."""
    from embulk_filter_copy_spark.cdc.apply import compact_quarantine
    from embulk_filter_copy_spark.cdc.replayer import redrive_dead_letters
    from embulk_filter_copy_spark.lake.table import LakeTable

    cols = [("repo", "string"), ("path", "string"), ("content", "string")]
    wrapped = [
        json.dumps({"payload": {
            "op": "c",
            "after": {"repo": "r1", "path": "p", "content": "v1"},
            "source": {"lsn": 1, "ts_ms": 1000}}}),
        json.dumps({"payload": {
            "op": "u",
            "after": {"repo": "r1", "path": "p", "content": "v2"},
            "source": {"lsn": 2, "ts_ms": 2000}}}),
    ]
    src = tmp_path / "wal"
    src.mkdir()
    # two WAL files -> two epochs -> two DLQ qpart dirs
    (src / "a.jsonl").write_text(wrapped[0] + "\n")
    (src / "b.jsonl").write_text(wrapped[1] + "\n")
    table = LakeTable.create(
        spark, str(tmp_path / "t"), cols, key_columns=["repo", "path"],
        n_buckets=4,
    )
    dlq = str(tmp_path / "dlq")
    from embulk_filter_copy_spark.cdc.replayer import replay_stream

    replay_stream(
        spark, str(src), str(tmp_path / "t"),
        checkpoint=str(tmp_path / "ck"),
        source_format="debezium-jsonl", dead_letter=dlq,
        max_files_per_trigger=1,
    )
    assert table.read().count() == 0
    compact_quarantine(spark, dlq, keep_recent=0)
    assert sum(n.startswith("qcompact=") for n in os.listdir(dlq)) == 1

    res = redrive_dead_letters(
        spark, dlq, str(tmp_path / "t"), payload_wrapper=True
    )
    assert res["rows_applied"] >= 1 and res["still_dead"] == 0
    rows = table.read().collect()
    assert len(rows) == 1 and rows[0]["content"] == "v2"

    # re-redrive after ANOTHER compaction run (digest unchanged -> skip)
    res2 = redrive_dead_letters(
        spark, dlq, str(tmp_path / "t"), payload_wrapper=True
    )
    assert res2["dirs_skipped"] == 1 and res2["rows_applied"] == 0
    assert table.read().collect()[0]["content"] == "v2"
