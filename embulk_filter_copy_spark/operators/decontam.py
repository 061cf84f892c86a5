"""Benchmark decontamination and exact-substring duplication metrics.

Two operators a training-corpus pipeline runs before anything ships to a
trainer:

  * `ngram_overlap` — per-document overlap against a (small) benchmark /
    eval set: the fraction of the doc's distinct n-grams that appear in ANY
    benchmark document. The standard decontamination filter (drop or flag
    docs whose eval overlap exceeds a threshold). The benchmark shingle set
    is tiny next to the corpus (eval suites are MBs, the corpus is 100 TB),
    so it is broadcast — the corpus NEVER shuffles for this check; the scan
    → explode → broadcast-hash-join → partial-count pipeline is one stage.
  * `duplicated_spans` — per-document exact-substring duplication: the
    fraction of the doc's w-token window POSITIONS whose window also occurs
    in some other document. The cheap distributed stand-in for suffix-array
    substring dedup (Lee et al., "Deduplicating Training Data Makes
    Language Models Better"): a true suffix array is sequential, while
    window-hash counting is two shuffles of integer hashes. Repeated
    boilerplate (license headers, navigation chrome) shows up as a high
    duplicated fraction even when whole-doc similarity is low.

Both shuffle portable 60-bit hashes of shingles (`queries/common.py`
phash), never shingle text — at 100 TB the shuffle payload is 8 bytes per
gram either way, and the DuckDB oracle replays the identical hash. Hash
collisions (~n²/2^60) can only overcount a duplicated window, identically
in engine and oracle.

Reference parity: out of the reference's scope (it copies pages verbatim,
`src/main/.../CopyFilterPlugin.java` has no content analysis); these extend
the engine's selection stage (`operators/sampling.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from embulk_filter_copy_spark.operators.dedup import ngram_shingles
from embulk_filter_copy_spark.portable import spark_phash


def _hashed(sh: DataFrame) -> DataFrame:
    return sh.withColumn("h", F.expr(spark_phash("sh", "dc:"))).drop("sh")


def ngram_overlap(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-doc decontamination stats vs a benchmark set.

    Returns (id, n_grams, n_hit_grams, contamination) for EVERY input doc —
    zero-overlap AND empty/whitespace-only docs included (the caller
    thresholds; a missing row is not a clean doc, it's a bug; an empty doc
    has 0 grams and contamination 0.0). ``broadcast_bench=False`` falls
    back to a shuffle join for the rare case of a benchmark set too large
    to broadcast.

    ONE pass over the corpus: the broadcast left-join marks bench hits
    in-stream and a single aggregation counts grams and hits together —
    the corpus is never scanned twice, never shuffled on shingles."""
    d = _hashed(ngram_shingles(docs, n, id_col, text_col, distinct=True))
    b = (
        _hashed(ngram_shingles(bench, n, id_col, text_col, distinct=True))
        .select("h")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_bench:
        b = F.broadcast(b)
    stats = (
        d.join(b, "h", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_hit").alias("n_hit_grams"),
        )
    )
    return (
        docs.select(id_col)
        .join(stats, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_hit_grams", F.lit(0)).alias("n_hit_grams"),
            F.when(F.coalesce("n_grams", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(F.round(F.col("n_hit_grams") / F.col("n_grams"), 6))
            .alias("contamination"),
        )
    )


def duplicated_spans(
    df: DataFrame,
    w: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc exact-substring duplication stats over w-token windows.

    A window position counts as duplicated when its window text occurs in
    at least one OTHER document (cross-doc duplication — a phrase repeated
    within one doc only is repetition, which `text.repetition_stats`
    measures, not duplication). Docs with no windows (empty text) get a
    zero row, not a missing row.

    The scan→shingle→hash pipeline runs ONCE: positions are collapsed to
    per-(doc, window-hash) counts (one shuffle), materialized with
    ``localCheckpoint`` because three consumers branch from it (cross-doc
    hash set, duplicated-position sum, total-position sum) — without the
    checkpoint each branch would re-shingle the corpus. Everything after
    rides integer (hash, count) pairs."""
    pos = _hashed(ngram_shingles(df, w, id_col, text_col, distinct=False))
    pc = (
        pos.groupBy(id_col, "h")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    cross = (
        pc.groupBy("h")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    n_dup = (
        pc.join(cross, "h", "left_semi")
        .groupBy(id_col)
        .agg(F.sum("c").alias("n_dup_windows"))
    )
    n_all = pc.groupBy(id_col).agg(F.sum("c").alias("n_windows"))
    return (
        df.select(id_col)
        .join(n_all, id_col, "left")
        .join(n_dup, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            F.when(F.coalesce("n_windows", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.coalesce("n_dup_windows", F.lit(0)) / F.col("n_windows"), 6
                )
            )
            .alias("dup_fraction"),
        )
    )


def trim_duplicated_spans(
    df: DataFrame,
    w: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """REMOVE cross-document duplicated spans from each document (the
    removal step of suffix-array substring dedup — Lee et al. — in the
    window-hash approximation `duplicated_spans` measures): every token
    covered by at least one w-token window that also occurs in another
    document is dropped, and the survivors are re-joined in order.

    Distributed shape: the window-position pipeline of
    :func:`duplicated_spans` (shuffles only integer hashes) finds the
    duplicated START positions per doc; those collapse to one small
    per-doc array (`collect_list` — bounded by doc length, not corpus
    size), which flows back onto the doc row where pure ARRAY expressions
    rebuild the text. No token ever shuffles; the only per-doc state is the
    duplicated-start list.

    The position frame is ``localCheckpoint``-ed because TWO consumers
    branch from it (the cross-doc duplicated-hash set and the start
    semi-join) — without it each branch re-shingles the corpus, a second
    full scan at 100 TB (the same rule `duplicated_spans` applies to its
    3-way branch).

    The rebuild is linear in doc length: duplicated starts are first merged
    into DISJOINT coverage intervals (one `aggregate` fold over the sorted
    start list — the interval list is tiny, bounded by #duplicated spans),
    and each token index is tested against the merged intervals, so a
    100k-token mostly-covered doc costs O(n_tokens x #intervals), not the
    O(n_tokens x covered_positions) an exploded position-set membership
    test would (quadratic exactly on the boilerplate-heavy docs this
    operator targets).

    Returns (id, text_trimmed, n_tokens, n_tokens_removed). Docs with no
    duplicated spans pass through unchanged.
    """
    toks = f"split({text_col}, ' ')"
    grams = F.expr(
        f"transform(sequence(0, greatest(size({toks}) - {w}, 0)),"
        f" i -> concat_ws(' ', slice({toks}, i + 1, {w})))"
    )
    pos = (
        df.select(id_col, F.posexplode(grams).alias("i", "sh"))
        .filter(F.trim(F.col("sh")) != "")
        .withColumn("h", F.expr(spark_phash("sh", "dc:")))
        .drop("sh")
        .localCheckpoint()  # 2 consumers below — ONE shingle pass, not two
    )
    cross = (
        pos.groupBy("h")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    starts = (
        pos.join(cross, "h", "left_semi")
        .groupBy(id_col)
        .agg(F.collect_list("i").alias("_starts"))
    )
    joined = df.join(starts, id_col, "left")
    # merge sorted duplicated starts into disjoint [lo, hi] token intervals:
    # overlapping/adjacent windows coalesce, so the membership test below is
    # O(#intervals) per token instead of O(#covered positions)
    intervals = F.expr(
        f"aggregate(array_sort(coalesce(_starts, array())),"
        f" cast(array() as array<struct<lo:int,hi:int>>),"
        f" (acc, s) -> CASE"
        f"   WHEN size(acc) > 0 AND s <= element_at(acc, -1).hi + 1 THEN"
        f"     concat(slice(acc, 1, size(acc) - 1),"
        f"            array(named_struct('lo', element_at(acc, -1).lo,"
        f"                  'hi', greatest(element_at(acc, -1).hi, s + {w - 1}))))"
        f"   ELSE concat(acc, array(named_struct('lo', s, 'hi', s + {w - 1})))"
        f" END)"
    )
    out = joined.withColumn("_ivl", intervals).select(
        id_col,
        F.expr(
            f"concat_ws(' ', transform(filter("
            f"  transform({toks}, (t, idx) -> struct(idx as idx, t as t)),"
            f"  p -> NOT exists(_ivl, v -> p.idx >= v.lo AND p.idx <= v.hi)),"
            f" p -> p.t))"
        ).alias("text_trimmed"),
        F.size(F.expr(toks)).alias("n_tokens"),
        # disjoint intervals → removed count = sum of clipped interval widths
        F.expr(
            f"aggregate(_ivl, 0, (acc, v) ->"
            f" acc + greatest(0, least(v.hi, size({toks}) - 1) - v.lo + 1))"
        ).alias("n_tokens_removed"),
    )
    return out
