"""Deterministic, Spark-native fixture generators (FIXTURES.md F1/F2).

Everything is derived from ``spark.range`` + hash expressions — no Python in
the row path, no wall-clock, no unseeded randomness — so the SAME code
generates the 1k-row unit fixture and a 10^10-row bench input with constant
driver memory (SURVEY.md §7.4). Skew is a power-law transform of a uniform
hash (hot repos), mirroring the Zipf knob in FIXTURES.md F1.

Layout parity with the reference's canonical fixture: the base table is the
``input_hint`` shape exactly — (repo, path, commit, lang, content) — and the
event log adds the CDC envelope (lsn, ts, op, schema_change).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

REPO_FILES_SCHEMA: list[tuple[str, str]] = [
    ("repo", "string"),
    ("path", "string"),
    ("commit", "string"),
    ("lang", "string"),
    ("content", "string"),
]

EVENT_SCHEMA: list[tuple[str, str]] = [
    ("lsn", "long"),
    ("ts", "timestamp"),
    ("op", "string"),
    ("repo", "string"),
    ("path", "string"),
    ("commit", "string"),
    ("lang", "string"),
    ("content", "string"),
    ("schema_change", "string"),
]

BASE_EPOCH = 1_767_225_600  # 2026-01-01T00:00:00Z — fixed, never wall-clock

_LANGS = ["py", "scala", "java", "go", "rs", "md"]


def _u(seed: int, tag: str, col: Column) -> Column:
    """Deterministic uniform in [0,1) from (seed, tag, col)."""
    h = F.abs(F.xxhash64(F.lit(f"{seed}:{tag}"), col))
    return (h % F.lit(1_000_000)).cast("double") / F.lit(1_000_000.0)


def _key_cols(file_id: Column, seed: int, n_repos: int, skew: float) -> list[Column]:
    """(repo, path, lang) for a logical file id — shared by base & events so
    events reference real base keys without a join."""
    u = _u(seed, "repo", file_id)
    # power-law: skew>1 concentrates mass on low repo ids (hot repos)
    repo_j = F.floor(F.lit(n_repos) * F.pow(u, F.lit(skew))).cast("long")
    repo = F.concat(F.lit("org"), (repo_j % 13).cast("string"), F.lit("/repo"), repo_j.cast("string"))
    lang_idx = (F.abs(F.xxhash64(F.lit(f"{seed}:lang"), file_id)) % F.lit(len(_LANGS))).cast("int")
    lang = F.element_at(F.array(*[F.lit(x) for x in _LANGS]), lang_idx + 1)
    path = F.concat(
        F.lit("src/dir"), (file_id % 7).cast("string"),
        F.lit("/file"), file_id.cast("string"), F.lit("."), lang,
    )
    return [repo.alias("repo"), path.alias("path"), lang.alias("lang")]


def _content(file_id: Column, version: Column, seed: int) -> Column:
    """Deterministic pseudo-source text, 64–~2000 chars, ~1% NULL."""
    k = F.concat(F.lit(f"{seed}:content:"), file_id.cast("string"), F.lit(":"), version.cast("string"))
    n_lines = (F.abs(F.xxhash64(k, F.lit("len"))) % 30 + 1).cast("int")
    line = F.concat(F.lit("def f_"), F.md5(k), F.lit("(): return '"), F.sha2(k, 256), F.lit("'\n"))
    body = F.concat(
        F.lit("# file "), file_id.cast("string"), F.lit(" v"), version.cast("string"), F.lit("\n"),
        F.repeat(line, n_lines),
    )
    is_null = _u(seed, "content_null", F.xxhash64(k)) < F.lit(0.01)
    return F.when(is_null, F.lit(None).cast("string")).otherwise(body)


def _commit(file_id: Column, version: Column, seed: int) -> Column:
    return F.sha1(
        F.concat(F.lit(f"{seed}:"), file_id.cast("string"), F.lit(":"), version.cast("string"))
    )


def gen_repo_files(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    n_repos: int = 100,
    skew: float = 3.0,
    partitions: int | None = None,
) -> DataFrame:
    """F1 `repo_files` base snapshot; primary key (repo, path) unique by
    construction (path embeds the file id)."""
    rng = spark.range(0, n_rows, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    fid = F.col("id")
    v0 = F.lit(0).cast("long")
    return rng.select(
        *_key_cols(fid, seed, n_repos, skew),
        _commit(fid, v0, seed).alias("commit"),
        _content(fid, v0, seed).alias("content"),
    ).select("repo", "path", "commit", "lang", "content")


def gen_change_events(
    spark: SparkSession,
    n_base_rows: int,
    n_events: int,
    seed: int = 42,
    n_repos: int = 100,
    skew: float = 3.0,
    dup_rate: float = 0.02,
    disorder_seconds: int = 30,
    schema_changes: list[tuple[int, dict]] | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """F2 `change_events`: ordered CDC log with I/U/D (+ optional S rows).

    * LSNs are unique & strictly increasing (gaps where dup rows are added);
    * ts = BASE_EPOCH + lsn - jitter(≤ disorder_seconds) — bounded disorder;
    * U/D target existing base keys (skew-weighted); I creates new keys;
    * duplicate events (same lsn re-emitted, identical payload) at dup_rate;
    * `schema_changes` = [(lsn, payload_dict)] inserted as op='S' rows.
    """
    import json as _json

    rng = spark.range(0, n_events, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    lsn = (F.col("id") + 1).alias("lsn")
    lsn_c = F.col("id") + 1

    op_u = _u(seed, "op", lsn_c)
    op = (
        F.when(op_u < 0.25, F.lit("I"))
        .when(op_u < 0.85, F.lit("U"))
        .otherwise(F.lit("D"))
    )
    # target file id: U/D hit existing [0, n_base_rows); I creates new ids
    hit = F.floor(
        F.lit(n_base_rows) * F.pow(_u(seed, "hit", lsn_c), F.lit(skew))
    ).cast("long")
    new_id = F.lit(n_base_rows) + (F.abs(F.xxhash64(F.lit(f"{seed}:new"), lsn_c)) % F.lit(max(n_events, 1)))
    fid = F.when(op == "I", new_id).otherwise(hit)
    version = lsn_c  # content version = lsn (unique per event)

    jitter = (F.abs(F.xxhash64(F.lit(f"{seed}:jit"), lsn_c)) % F.lit(disorder_seconds + 1)).cast("long")
    ts = F.timestamp_seconds(F.lit(BASE_EPOCH) + lsn_c - jitter)

    keys = _key_cols(fid, seed, n_repos, skew)
    ev = rng.select(
        lsn,
        ts.alias("ts"),
        op.alias("op"),
        *keys,
        _commit(fid, version, seed).alias("commit"),
        _content(fid, version, seed).alias("content"),
        F.lit(None).cast("string").alias("schema_change"),
    )
    # deletes carry no new row image
    ev = ev.withColumn("commit", F.when(F.col("op") == "D", F.lit(None)).otherwise(F.col("commit")))
    ev = ev.withColumn("content", F.when(F.col("op") == "D", F.lit(None)).otherwise(F.col("content")))
    ev = ev.select([c for c, _ in EVENT_SCHEMA])

    if dup_rate > 0:
        dups = ev.filter(_u(seed, "dup", F.col("lsn")) < F.lit(dup_rate))
        ev = ev.unionByName(dups)

    if schema_changes:
        rows = []
        for s_lsn, payload in schema_changes:
            rows.append(
                (
                    int(s_lsn),
                    None,  # filled below
                    "S",
                    "_schema",
                    None,
                    None,
                    None,
                    None,
                    _json.dumps(payload, sort_keys=True),
                )
            )
        sdf = spark.createDataFrame(
            rows,
            "lsn long, ts timestamp, op string, repo string, path string,"
            " commit string, lang string, content string, schema_change string",
        ).withColumn("ts", F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("lsn")))
        # shift colliding data lsns up by 0.5? no: schema lsns use half-steps
        # avoided by convention — callers pass lsns not used by data events
        # (data lsns are 1..n_events; pass e.g. n via lsn*1000 offset or
        # fractional region). Simplest: caller uses lsns > n_events or the
        # generator guarantees uniqueness by filtering collisions here.
        ev = ev.filter(~F.col("lsn").isin([int(s) for s, _ in schema_changes])).unionByName(sdf)

    return ev
