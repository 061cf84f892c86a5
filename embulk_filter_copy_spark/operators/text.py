"""Text analysis operators: language-ID heuristic, quality scoring, token
counting (whitespace + BPE-ish subword estimate), document fingerprinting.

Everything is built-in-expression-only (JVM-side, codegen'd) — at 100 TB the
text column never crosses into Python for these metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from embulk_filter_copy_spark.queries.common import spark_phash

# tiny per-language stopword marker sets (n-gram heuristic); deliberately
# deterministic and oracle-replayable
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "die", "und"],
    "fr": ["le", "la", "et"],
}


def _marker_hits(lang: str) -> F.Column:
    hits = None
    for wm in LANG_MARKERS[lang]:
        h = F.when(F.col("text").rlike(rf"(^| ){wm}( |$)"), F.lit(1)).otherwise(F.lit(0))
        hits = h if hits is None else hits + h
    return hits


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language guess from stopword-marker hits; 'und' when no
    marker fires. (On the synthetic corpus this mostly exercises the
    machinery, not linguistics.)"""
    out = df
    for lang in LANG_MARKERS:
        out = out.withColumn(f"_hits_{lang}", _marker_hits(lang))
    best = F.greatest(*[F.col(f"_hits_{lang}") for lang in LANG_MARKERS])
    pred = F.lit("und")
    # deterministic priority order on ties: en > es > de > fr (first wins)
    for lang in reversed(list(LANG_MARKERS)):
        pred = F.when((F.col(f"_hits_{lang}") == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return out.withColumn("pred_lang", pred).drop(
        *[f"_hits_{lang}" for lang in LANG_MARKERS]
    )


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens, distinct tokens, BPE-ish subword estimate
    (ceil(len(word)/4) per word ≈ a 4-chars-per-token budget)."""
    toks = F.split(F.col(text_col), " ")
    return df.select(
        "*",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.expr(
            f"aggregate(split({text_col}, ' '), 0L,"
            f" (acc, w) -> acc + cast(ceil(length(w) / 4.0) as long))"
        ).alias("n_subtokens"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality features + a composite score:
    length, type-token ratio, mean word length, whitespace ratio."""
    d = token_stats(df, text_col)
    n_chars = F.length(F.col(text_col))
    ttr = F.col("n_distinct_tokens") / F.col("n_tokens")
    mean_wl = (n_chars - (F.col("n_tokens") - 1)) / F.col("n_tokens")
    score = (
        F.when(n_chars >= 100, 0.25).otherwise(0.0)
        + F.when((ttr >= 0.2) & (ttr <= 0.9), 0.25).otherwise(0.0)
        + F.when((mean_wl >= 2) & (mean_wl <= 12), 0.25).otherwise(0.0)
        + F.when(F.col("n_tokens") >= 20, 0.25).otherwise(0.0)
    )
    return d.select(
        "*",
        F.round(ttr, 4).alias("ttr"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(score, 2).alias("quality"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Winnowing-lite document fingerprint: min portable-hash over word
    3-gram shingles (rolling-hash family); equal fingerprints = candidate
    clones."""
    toks = f"split({text_col}, ' ')"
    grams = (
        f"transform(sequence(0, greatest(size({toks}) - 3, 0)),"
        f" i -> concat_ws(' ', slice({toks}, i + 1, 3)))"
    )
    h = spark_phash("g", "fp:")
    return df.select(
        id_col,
        F.expr(
            f"array_min(transform({grams}, g -> {h}))"
        ).alias("fingerprint"),
    )
