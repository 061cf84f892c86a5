"""Deterministic corpus-selection operators: hash sampling, stratified
sampling, and token-budget sequence packing.

A training-data pipeline rarely trains on the whole lake: it samples
(uniformly or per-source quotas) and then packs documents into fixed
token-budget training sequences. All three operators here are DETERMINISTIC
functions of the data — re-running a 100 TB selection job must reproduce the
same byte-identical corpus (the same property the CDC side gets from LSN
replay), so none of them uses `rand()`:

  * `sample_by_hash` — Bernoulli over a portable 60-bit md5 hash of the key:
    a pure per-row filter (no shuffle, no state), pushed to the scan, and
    any engine (the DuckDB oracle included) reproduces the exact row set.
  * `stratified_sample` — per-group top-n in hash order: one shuffle keyed
    on the group column; hash order makes the per-group pick uniform AND
    stable. For pathologically hot groups, pre-thin with `sample_by_hash`
    at ~2-4x the target rate first so the window sees a bounded group.
  * `pack_sequences` — blocked packing: pack id = floor(exclusive running
    token sum / budget) within each group, i.e. the distributed
    approximation of greedy first-fit (a pack may overflow its budget by at
    most one document; no pack is underfull except the last per group).
    Exact greedy packing is inherently sequential — on a cluster this
    per-group window (one shuffle on the group key) is the shape that
    scales, and the overflow bound is the accepted cost.

The reference has no sampling surface (its pipeline copies everything —
`BreakinBulkLoader.scala` fans pages out unfiltered); these generalize its
per-branch `filter` hook into the selection stage an LLM corpus needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from embulk_filter_copy_spark.portable import spark_phash

# Bernoulli granularity: fraction is quantized to 1e-6 (documented — the
# oracle must use the same modulus)
HASH_MOD = 1_000_000


def sample_by_hash(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "sample:",
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows: row survives iff
    ``phash(salt || key) mod 1e6 < fraction * 1e6``. Pure narrow filter —
    no shuffle, no driver state, trivially parallel at any scale; distinct
    ``salt`` values give independent samples (e.g. train/held-out splits
    from one pass)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    thr = int(round(fraction * HASH_MOD))
    return df.filter(
        F.expr(f"pmod({spark_phash(key_col, salt)}, {HASH_MOD})") < F.lit(thr)
    )


def stratified_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    key_col: str,
    salt: str = "strat:",
) -> DataFrame:
    """Deterministic n-per-group sample: rank rows inside each group by
    (hash of key, key) and keep the first ``n_per_group``. Hash order makes
    the pick uniform over the group; the key tiebreak makes it total, so
    the result is replayable. One shuffle (on ``group_col``); groups are
    processed independently, so skew is bounded by the hottest group — see
    the module docstring for the pre-thinning pattern."""
    if n_per_group < 0:
        raise ValueError(f"n_per_group must be >= 0, got {n_per_group}")
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.expr(spark_phash(key_col, salt)), F.col(key_col))
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_group)
        .drop("_rn")
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Assign each document a training-sequence ``pack_id`` so consecutive
    docs (by ``id_col`` within ``group_col``) fill ~``budget`` tokens per
    pack: ``pack_id = floor(exclusive_cumsum(n_tok) / budget)``.

    Blocked packing, not exact first-fit: a pack can overflow by at most
    its last document (bounded waste), in exchange for being ONE window
    over a single group-keyed shuffle — exact greedy packing needs a
    sequential scan per group, which at 10^10 docs is the wrong trade.
    If ``tokens_col`` is None, whitespace token counts are computed on the
    fly (JVM-side split, matching `text.token_stats`)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if tokens_col is None:
        df = df.withColumn("n_tok", F.size(F.split(F.col(text_col), " ")))
        tokens_col = "n_tok"
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    excl = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return df.withColumn(
        "pack_id", F.floor(excl / F.lit(budget)).cast("long")
    )


def assign_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "shard:",
) -> DataFrame:
    """Deterministic training-order shard assignment: every row gets a
    ``shard`` in [0, n_shards) and a dense 0-based ``pos`` within its
    shard, both pure functions of the key. ``shard = phash(key) mod n``;
    ``pos`` orders the shard by (hash, key) — i.e. a globally-shuffled
    training order that any re-run (or any other engine) reproduces
    byte-identically, replacing the usual `rand()`-ordered global sort.

    One shuffle, keyed on ``shard``. The per-shard ``row_number`` sorts
    each shard inside ONE task, so ``n_shards`` is the parallelism knob:
    pick shards sized to the downstream training-file target (e.g. 10^4-10^5
    shards for 100 TB → a few GB per task), never a handful. Hot-key skew
    cannot occur — the hash spreads keys uniformly by construction."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    h = F.expr(spark_phash(key_col, salt))
    w = Window.partitionBy("shard").orderBy(F.col("_h"), F.col(key_col))
    return (
        df.withColumn("_h", h)
        .withColumn("shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(w) - F.lit(1))
        .drop("_h")
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "mix:",
) -> DataFrame:
    """Domain-mixture resampling: keep a per-group deterministic Bernoulli
    fraction (`sample_by_hash` semantics, one threshold per group). The
    weight table is joined as a BROADCAST dimension — never a per-group
    literal CASE chain, so a mixture over 10^5 domains compiles and plans
    identically to one over 3 (the same literal-inlining ceiling the IVF
    assigner hit is avoided by construction). Groups absent from
    ``weights`` fall back to ``default_fraction`` (0.0 = drop unknown
    domains, the safe corpus-selection default).

    Thresholds are quantized to the shared 1e-6 grid in PYTHON (not in an
    engine expression), so the oracle and the engine cannot round
    differently."""
    for g, frac in weights.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"weight for {g!r} must be in [0, 1], got {frac}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1], got {default_fraction}")
    spark = df.sparkSession
    rows = [(g, int(round(f * HASH_MOD))) for g, f in sorted(weights.items())]
    # the weight dim's group column inherits the DATA's type (string keys
    # against an int column — or vice versa — would otherwise crash or
    # silently join through casts)
    from pyspark.sql import types as T

    gtype = df.schema[group_col].dataType
    wschema = T.StructType(
        [
            T.StructField(group_col, gtype, True),
            T.StructField("_thr", T.LongType(), False),
        ]
    )
    wdf = spark.createDataFrame(rows, schema=wschema)
    default_thr = int(round(default_fraction * HASH_MOD))
    u = F.expr(f"pmod({spark_phash(key_col, salt)}, {HASH_MOD})")
    return (
        df.join(F.broadcast(wdf), group_col, "left")
        .withColumn("_thr", F.coalesce("_thr", F.lit(default_thr)))
        .filter(u < F.col("_thr"))
        .select(*df.columns)
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-token-window chunks with overlap — the
    step between trusted corpus and trainer-shaped sequences (the sibling
    of `pack_sequences`, which packs SHORT docs up; this cuts LONG docs
    down).

    Pure narrow JVM work (split → sequence → explode → slice): no shuffle,
    no Python — chunking 100 TB is scan-speed. Chunk starts are
    0, step, 2*step, … with ``step = chunk_tokens - overlap``; the last
    window is emitted short rather than dropped (dropping the tail would
    silently lose up to ``chunk_tokens - 1`` tokens per doc), and a doc
    shorter than one chunk yields exactly one chunk. Deterministic: chunk
    boundaries are pure functions of the text.

    Returns (id, chunk_idx, chunk_n_tokens, chunk_text).
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap} vs {chunk_tokens}"
        )
    step = chunk_tokens - overlap
    toks = f"split({text_col}, ' ')"
    # start positions: every s in {0, step, 2*step, ...} with
    # s <= n - overlap - 1 (plus s=0 always) — the last start still
    # contributes >= overlap+1 unseen tokens, so no chunk is a suffix of
    # its predecessor
    starts = F.expr(
        f"sequence(0, greatest(size({toks}) - {overlap} - 1, 0), {step})"
    )
    out = df.select(
        id_col,
        text_col,
        F.size(F.expr(toks)).alias("_n"),
        F.posexplode(starts).alias("chunk_idx", "_s"),
    )
    return out.select(
        id_col,
        "chunk_idx",
        F.least(F.lit(chunk_tokens), F.col("_n") - F.col("_s")).alias(
            "chunk_n_tokens"
        ),
        F.expr(
            f"concat_ws(' ', slice(split({text_col}, ' '), _s + 1, {chunk_tokens}))"
        ).alias("chunk_text"),
    )


def split_leakage_safe(
    df: DataFrame,
    pairs: DataFrame,
    ratios: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split:",
    algorithm: str = "label",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: route every member of a
    near-duplicate COMPONENT to the same split, so no near-copy of a
    training document can land in the held-out sets (the benchmark-
    contamination failure mode a per-document hash split has by
    construction — two 99%-identical docs hash independently).

    ``pairs`` is any near-dup candidate edge list (``a``/``b`` columns —
    MinHash LSH, SimHash bands, embedding-cosine blocks…). Components come
    from the existing CC operators (``algorithm='label'`` propagation, or
    ``'star'`` for long-chain graphs); the split is then a pure function
    of the COMPONENT id on the shared portable-hash grid: ratios are
    quantized to the 1e-6 grid in Python and laid out as contiguous
    half-open intervals in dict-insertion order, so any engine reproduces
    the exact assignment. Cost beyond the CC rounds: zero extra shuffles —
    the split column is a narrow map over the component label.

    Returns (key, comp, split)."""
    from embulk_filter_copy_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    if not ratios:
        raise ValueError("ratios must be a non-empty {split_name: fraction}")
    for name, frac in ratios.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"ratio for {name!r} must be in [0, 1], got {frac}")
    total = sum(ratios.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"ratios must sum to 1.0, got {total}")
    cc = connected_components_star if algorithm == "star" else connected_components
    comp = cc(pairs, df.select(key_col), node_col=key_col)

    u = F.expr(f"pmod({spark_phash('comp', salt)}, {HASH_MOD})")
    names = list(ratios)
    cuts, acc = [], 0
    for name in names:
        acc += int(round(ratios[name] * HASH_MOD))
        cuts.append(acc)
    cuts[-1] = HASH_MOD  # rounding never orphans the top of the grid
    expr = F.when(u < F.lit(cuts[0]), F.lit(names[0]))
    for name, hi in zip(names[1:], cuts[1:]):
        expr = expr.when(u < F.lit(hi), F.lit(name))
    return comp.select(key_col, "comp", expr.alias("split"))


def cap_tokens_per_group(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
    salt: str = "cap:",
) -> DataFrame:
    """Per-domain token-budget cap: keep documents from each group in
    deterministic hash order until the group's running token total reaches
    ``budget`` — the quota stage that stops one huge domain (CommonCrawl)
    from drowning the mixture regardless of its row count.

    Same distributed shape as :func:`pack_sequences`: ONE shuffle keyed on
    the group, one window, exclusive running sum — a row survives iff the
    tokens BEFORE it are under budget, so the cap overflows by at most one
    document per group (bounded waste; the strict variant would emit
    partially-taken documents, which a training pipeline can't use). Hash
    order makes the kept set uniform over the group and replayable — the
    hottest group bounds skew, and the pre-thinning pattern from the
    module docstring applies identically.

    Returns the surviving rows plus ``grp_tokens_before`` (the exclusive
    running sum — 100 TB operators expose their audit trail)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if tokens_col is None:
        df = df.withColumn("n_tok", F.size(F.split(F.col(text_col), " ")))
        tokens_col = "n_tok"
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.expr(spark_phash(key_col, salt)), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    excl = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return (
        df.withColumn("grp_tokens_before", excl)
        .filter(F.col("grp_tokens_before") < F.lit(budget))
    )
