"""Text analysis operators: language-ID heuristic, quality scoring, token
counting (whitespace + BPE-ish subword estimate), document fingerprinting.

Everything is built-in-expression-only (JVM-side, codegen'd) — at 100 TB the
text column never crosses into Python for these metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from embulk_filter_copy_spark.portable import spark_phash

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


# (name, pattern, replacement) — patterns restricted to syntax Java regex
# and RE2 (the DuckDB oracle) interpret identically: character classes,
# bounded repetition, \d, \b. Applied in list order; counts are taken on the
# ORIGINAL text so replacement order can't hide a category.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def scrub_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """Deterministic PII scrubbing: emails / IPv4s / dash-phone-numbers →
    typed placeholder tokens, plus per-category match counts. Pure
    `regexp_replace`/`regexp_count` built-ins — a narrow per-row map, no
    shuffle, codegen'd JVM regex; at 100 TB this runs at scan speed and the
    counts aggregate map-side. (A production scrubber swaps in its own
    pattern table; the operator shape — ordered replace chain + audit
    counts on the pre-image — is the part that matters.)"""
    out = df
    clean = F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        out = out.withColumn(f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat)))
        clean = F.regexp_replace(clean, pat, repl)
    return out.withColumn(out_col, clean)


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition features per document: the fraction of
    tokens taken by the single most-frequent unigram / bigram. High values
    flag degenerate, loop-generated, or boilerplate text.

    Distributed shape: explode n-grams → count per (doc, gram) → max/sum
    per doc — every aggregation partial-combines map-side, and the shuffle
    carries (doc, gram, count) rows, never document text. (The
    array-expression alternative — counting inside one row — is O(distinct
    × n) per document and caps at the 2 GB row limit for giant docs; the
    explode shape has neither problem.)"""
    toks = f"split({text_col}, ' ')"
    # sequence(0, -1) would yield [0, -1] (negative step inference), so the
    # bigram arm is guarded for 1-token docs
    grams = df.select(
        F.col(id_col),
        F.explode(
            F.expr(
                # unigrams ++ bigrams, tagged by arity
                f"concat(transform({toks}, t -> struct(1 as n, t as g)),"
                f" if(size({toks}) < 2, array(),"
                f"  transform(sequence(0, size({toks}) - 2),"
                f"   i -> struct(2 as n, concat({toks}[i], ' ', {toks}[i + 1]) as g))))"
            )
        ).alias("ng"),
    ).select(id_col, F.col("ng.n").alias("n"), F.col("ng.g").alias("g"))
    counted = grams.groupBy(id_col, "n", "g").agg(F.count("*").alias("c"))
    per_doc = counted.groupBy(id_col, "n").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("total_c")
    )
    # full-precision ratios: one division over exact integer counts is
    # bit-identical on any engine — rounding policy stays with callers
    frac = F.col("top_c") / F.col("total_c")
    return per_doc.groupBy(id_col).agg(
        F.max(F.when(F.col("n") == 1, frac)).alias("top_token_frac"),
        F.max(F.when(F.col("n") == 2, frac)).alias("top_bigram_frac"),
    )


STOP_WORDS = ("the", "a", "of", "and", "to", "in", "is", "that")


def quality_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_top_token_frac: float = 0.2,
    min_ttr: float = 0.2,
    min_stop_hits: int = 0,
    max_symbol_word_ratio: float = 1.0,
    max_bullet_line_frac: float = 1.0,
    max_ellipsis_line_frac: float = 1.0,
    min_alpha_word_frac: float = 0.0,
    max_short_word_frac: float = 1.0,
    stop_words: tuple[str, ...] = STOP_WORDS,
) -> DataFrame:
    """Gopher/C4-style per-document FILTER GATE: each heuristic is a named
    boolean column and ``keep`` is their conjunction — the explainable
    verdict table a pipeline joins to drop junk documents, as opposed to
    :func:`quality_score`'s blended score (a score ranks; a gate decides,
    and a rejected doc should say WHICH rule killed it for corpus-level
    rejection accounting).

    Rules (all thresholds are parameters; the Gopher-paper heuristics
    added in round 5 default PERMISSIVE so existing gates keep their
    semantics until a threshold is chosen):

      * ``rule_len``         — token-count bounds
      * ``rule_word_len``    — mean word length bounds
      * ``rule_repetition``  — top-unigram fraction cap
        (:func:`repetition_stats`'s explode shape — counts shuffle, text
        doesn't)
      * ``rule_diversity``   — type-token-ratio floor
      * ``rule_stopwords``   — ≥ N distinct stop words present (Gopher:
        ≥2 of a small closed set)
      * ``rule_symbol``      — (# + ellipsis) per word ≤ cap (Gopher 0.1)
      * ``rule_bullet``      — fraction of lines starting with a bullet
        ≤ cap (Gopher 0.9)
      * ``rule_ellipsis``    — fraction of lines ending in an ellipsis
        ≤ cap (Gopher 0.3)
      * ``rule_alpha``       — fraction of words containing a letter
        ≥ floor (Gopher 0.8)
      * ``rule_short_words`` — fraction of ≤2-char tokens ≤ cap (stub /
        fragment density)

    Rule booleans compute on exact integer counts (one IEEE division per
    ratio), so any engine agrees bit-for-bit; the reported ratio columns
    are rounded for display only. Everything is built-in expressions —
    the text column never crosses into Python and never shuffles (only
    the repetition stage shuffles, and it shuffles hashed counts)."""
    stats = token_stats(df.select(id_col, text_col), text_col)
    rep = repetition_stats(df.select(id_col, text_col), id_col, text_col)
    n_chars = F.length(F.col(text_col))
    n_tok = F.col("n_tokens")
    mean_wl = (n_chars - (n_tok - 1)) / n_tok
    ttr = F.col("n_distinct_tokens") / n_tok

    toks = f"split({text_col}, ' ')"
    lines = f"split({text_col}, '\\n')"
    stop_arr = ", ".join(f"'{w}'" for w in stop_words)
    stop_hits = F.expr(
        f"size(array_intersect(array_distinct({toks}), array({stop_arr})))"
    )
    # non-overlapping occurrence counts via length deltas — exact integers
    hash_cnt = n_chars - F.length(F.regexp_replace(F.col(text_col), "#", ""))
    ell3_cnt = (
        n_chars - F.length(F.regexp_replace(F.col(text_col), r"\.\.\.", ""))
    ) / F.lit(3)
    uell_cnt = n_chars - F.length(
        F.regexp_replace(F.col(text_col), "…", "")
    )
    symbol_ratio = (hash_cnt + ell3_cnt + uell_cnt) / n_tok
    n_lines = F.expr(f"size({lines})")
    bullet_frac = F.expr(
        f"size(filter({lines}, l -> l LIKE '-%' OR l LIKE '*%'"
        f" OR l LIKE '•%'))"
    ) / n_lines
    ellipsis_frac = F.expr(
        f"size(filter({lines}, l -> l LIKE '%...' OR l LIKE '%…'))"
    ) / n_lines
    alpha_frac = F.expr(
        f"size(filter({toks}, w -> w rlike '[A-Za-z]'))"
    ) / n_tok
    short_frac = F.expr(f"size(filter({toks}, w -> length(w) <= 2))") / n_tok

    j = stats.join(rep, id_col)
    rules = {
        "rule_len": n_tok.between(min_tokens, max_tokens),
        "rule_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "rule_repetition": F.col("top_token_frac") <= max_top_token_frac,
        "rule_diversity": ttr >= min_ttr,
        "rule_stopwords": stop_hits >= min_stop_hits,
        "rule_symbol": symbol_ratio <= max_symbol_word_ratio,
        "rule_bullet": bullet_frac <= max_bullet_line_frac,
        "rule_ellipsis": ellipsis_frac <= max_ellipsis_line_frac,
        "rule_alpha": alpha_frac >= min_alpha_word_frac,
        "rule_short_words": short_frac <= max_short_word_frac,
    }
    keep = None
    for r in rules.values():
        keep = r if keep is None else (keep & r)
    return j.select(
        id_col,
        F.col("n_tokens"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(ttr, 4).alias("ttr"),
        F.round("top_token_frac", 4).alias("top_token_frac"),
        stop_hits.cast("int").alias("stop_hits"),
        F.round(symbol_ratio, 4).alias("symbol_ratio"),
        F.round(short_frac, 4).alias("short_word_frac"),
        *[r.alias(name) for name, r in rules.items()],
        keep.alias("keep"),
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


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """CCNet-style corpus-statistics quality score: the mean unigram
    log-probability of each document under the corpus's OWN unigram model
    (add-one smoothed). Documents whose tokens are rare relative to the
    corpus (garbled text, wrong-language fragments, binary spill) score
    low; fluent in-distribution text scores high. The standard cheap stand-
    in for a KenLM perplexity filter when no external LM is available.

    Distributed shape: token counts aggregate map-side (shuffle carries
    (token, count), never text); the vocabulary table is BROADCAST back
    onto the token stream (a 10^7-type vocab is ~100 MB — broadcastable;
    beyond that pass ``vocab`` pre-aggregated from a sample). When fitting
    in-line the token stream is checkpointed so ONE corpus scan feeds both
    the vocab build and the scoring join; with a frozen ``vocab`` the
    single consumer needs no materialization.

    Returns (id, n_tokens, mean_logprob) with natural-log probabilities
    (unrounded — callers comparing across engines round with the shared
    eps grid); docs with no tokens get mean_logprob NULL (no evidence,
    not "bad").

    ``vocab``: optional precomputed (tok, cnt) frame — the fit/transform
    split a pipeline uses to score a shard under the FULL corpus model or
    to freeze the model across incremental runs.
    """
    tok_pos = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    if vocab is None:
        # in-line fit: the token stream feeds BOTH the vocab build and the
        # scoring join — checkpoint it so the corpus is scanned+tokenized
        # ONCE (without this, Catalyst re-derives each consumer from the
        # scan: two full corpus passes, the round-3 acknowledged debt)
        tok_pos = tok_pos.localCheckpoint(eager=False)
        vocab = tok_pos.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    # add-one smoothing over the observed vocabulary: p(t) = (c_t + 1) / (N + V)
    totals = vocab.agg(
        F.sum("cnt").alias("n_total"), F.count(F.lit(1)).alias("v_size")
    )
    lp = (
        vocab.crossJoin(F.broadcast(totals))
        .select(
            "tok",
            F.log(
                (F.col("cnt") + 1) / (F.col("n_total") + F.col("v_size"))
            ).alias("_lp"),
        )
    )
    # tokens outside the vocabulary (only possible with a frozen ``vocab``)
    # take the smoothed unknown mass log(1 / (N + V)) instead of silently
    # dropping out of the average
    scored = (
        tok_pos.join(F.broadcast(lp), "tok", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            F.coalesce(
                "_lp", -F.log(F.col("n_total") + F.col("v_size"))
            ).alias("_lp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg("_lp").alias("mean_logprob"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.col("mean_logprob"),
        )
    )
