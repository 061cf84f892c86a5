"""Similarity search over embedding columns (array<float>).

* :func:`ann_bruteforce_topk` — exact cosine top-k: broadcast the (small)
  query set against the corpus; the corpus side never shuffles. This is the
  correctness baseline.
* :func:`ann_lsh_topk` — the scale path: random-hyperplane LSH buckets
  (hyperplanes = a deterministic sample of corpus vectors, so the oracle can
  replay them), candidates restricted to the query's bucket; top-k within
  candidates. At 100 TB the bucket join replaces the full scan: corpus is
  hash-partitioned by bucket id, queries broadcast per bucket.

All vector math is JVM-side (`zip_with` + `aggregate` fold) — no Python in
the inner loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def dot_expr(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        f" 0D, (acc, v) -> acc + v)"
    )


def _dot_cols(a: F.Column, b: F.Column) -> F.Column:
    """Column-object variant of :func:`dot_expr` (for literal vectors)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: str) -> F.Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: str, b: str) -> F.Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def _cos_cols(a: F.Column, b: F.Column) -> F.Column:
    """Column-object cosine — the same zip_with/aggregate sequential fold as
    :func:`cosine_expr`, so literal-path, join-path and the DuckDB oracle
    all compute bit-identical doubles."""
    return _dot_cols(a, b) / (
        F.sqrt(_dot_cols(a, a)) * F.sqrt(_dot_cols(b, b))
    )


def ann_bruteforce_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: broadcast(queries) × corpus, window top-k.
    Cosine is rounded to 4dp BEFORE ranking so ranking is reproducible
    across engines; ties break by neighbor id."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine_expr("cv", "qv"), 4))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def ivf_centroids(
    emb: DataFrame, n_cells: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """The first ``n_cells`` corpus vectors in id order, re-indexed to dense
    cell ids 0..n_cells-1 via ``row_number`` (a deterministic,
    oracle-replayable stand-in for a k-means pass). The explicit re-index
    means ids need NOT be 0-based or contiguous — filtering on the raw id
    would silently yield empty cells for any other corpus."""
    w = W.orderBy(id_col)
    return (
        emb.orderBy(id_col).limit(n_cells)
        .select(
            (F.row_number().over(w) - 1).alias("cent_id"),
            F.col(vec_col).alias("cent_v"),
        )
    )


# above this many cells the literal path's O(n_cells) expression tree is a
# codegen hazard (64KB JVM method limit, constant-pool blowup) — auto
# switches to the broadcast-join path
INLINE_CELLS_MAX = 64


def _resolve_assign_method(method: str, n_cells: int, id_col: str | None) -> str:
    if method == "auto":
        method = "join" if n_cells > INLINE_CELLS_MAX else "literal"
    if method not in ("literal", "join"):
        raise ValueError(f"unknown cell-assignment method {method!r}")
    if method == "join" and id_col is None:
        raise ValueError(
            "join-path cell assignment needs id_col (a unique row id to "
            "re-attach the argmax result)"
        )
    return method


def _collect_cents(cents: DataFrame, n_cells: int) -> list:
    """Collect the centroid table ONCE (callers share the rows across the
    corpus and query assigners instead of re-running the centroid job)."""
    return sorted(cents.collect(), key=lambda r: r["cent_id"])[:n_cells]


def _literal_cosines(rows: list, vc: str) -> list[F.Column]:
    cos = []
    for r in rows:
        ct = F.array(*[F.lit(float(x)) for x in r["cent_v"]])
        cos.append(F.round(_cos_cols(F.col(vc), ct), 6))
    return cos


def _assign_cells_join(
    df: DataFrame, cents: DataFrame, vc: str, id_col: str, nprobe: int = 1
) -> DataFrame:
    """Broadcast-join cell assignment — the scale path: expression size is
    O(1) in n_cells (centroids flow as broadcast DATA, not literal
    expressions, so 10^5-10^6 cells compile fine). Cost vs the literal
    path: one map-side-combined argmax aggregation on the row id plus one
    left join back to re-attach payload columns. Cosines are rounded to
    6dp before the argmax and ties break to the lowest cell id — the
    EXACT tie-break of the literal path, so both paths (and the DuckDB
    oracle) assign identical cells."""
    c = F.broadcast(cents.select("cent_id", "cent_v"))
    scored = df.select(F.col(id_col).alias("_aid"), F.col(vc).alias("_av")).crossJoin(
        c
    ).select(
        "_aid",
        F.struct(
            (-F.round(_cos_cols(F.col("_av"), F.col("cent_v")), 6)).alias("neg"),
            F.col("cent_id").cast("int").alias("cell"),
        ).alias("_sc"),
    )
    # a NULL cosine (NULL vector, or dimension mismatch vs the centroids —
    # zip_with pads with NULL elements) must not reach the argmax: a struct
    # with neg=NULL sorts FIRST under min(), so the row would silently win
    # cell 0. Dropping it instead leaves the row with no best-cell match and
    # the trailing coalesce assigns -1 — the literal path's behavior
    scored = scored.filter(F.col("_sc.neg").isNotNull())
    if nprobe == 1:
        # struct min = (max cosine, lowest cell on ties); partial-aggregated
        # map-side, so the shuffle carries one tiny struct per row
        best = (
            scored.groupBy("_aid")
            .agg(F.min("_sc").alias("_sc"))
            .select("_aid", F.col("_sc.cell").alias("cell"))
        )
    else:
        best = (
            scored.groupBy("_aid")
            .agg(
                F.slice(F.array_sort(F.collect_list("_sc")), 1, nprobe).alias("_ps")
            )
            .select("_aid", F.explode("_ps").alias("_sc"))
            .select("_aid", F.col("_sc.cell").alias("cell"))
        )
    out = df.join(best, df[id_col] == best["_aid"], "left").drop("_aid")
    # empty centroid table → no assignment rows → cell -1 (literal-path parity)
    return out.withColumn("cell", F.coalesce(F.col("cell"), F.lit(-1)).cast("int"))


def assign_cells(
    df: DataFrame,
    cents: DataFrame,
    n_cells: int,
    vc: str,
    id_col: str | None = None,
    method: str = "auto",
    cents_rows: list | None = None,
) -> DataFrame:
    """Assign every row to its max-cosine centroid cell (ties → lowest cell
    id), rounded to 6dp before the argmax so the assignment is reproducible
    across engines.

    Two physical strategies, identical semantics:
      * ``literal`` — centroids collected once and inlined as literal
        vectors: zero joins, zero shuffles; the right plan while the
        quantizer is coarse (expression size is O(n_cells), so this caps
        at :data:`INLINE_CELLS_MAX`). A corpus SMALLER than ``n_cells``
        simply yields fewer cells.
      * ``join`` — broadcast-join + struct-min argmax (needs ``id_col``):
        O(1) expression size, the 100 TB path where n_cells reaches
        10^5-10^6 and a literal expression would break JVM codegen.
    ``auto`` picks by ``n_cells``. ``cents_rows`` lets a caller that
    already collected the centroid table share the rows (one collect for
    corpus + query assignment)."""
    method = _resolve_assign_method(method, n_cells, id_col)
    if method == "join":
        return _assign_cells_join(df, cents, vc, id_col, nprobe=1)
    rows = cents_rows if cents_rows is not None else _collect_cents(cents, n_cells)
    if not rows:
        return df.withColumn("cell", F.lit(-1).cast("int"))
    cos = _literal_cosines(rows, vc)
    best = F.greatest(*cos) if len(cos) > 1 else cos[0]
    cell = F.lit(-1)
    for i in reversed(range(len(cos))):  # outermost when = cell 0 → lowest wins ties
        cell = F.when(cos[i] == best, F.lit(rows[i]["cent_id"])).otherwise(cell)
    return df.withColumn("cell", cell.cast("int"))


def assign_cells_topk(
    df: DataFrame,
    cents: DataFrame,
    n_cells: int,
    vc: str,
    nprobe: int,
    id_col: str | None = None,
    method: str = "auto",
    cents_rows: list | None = None,
) -> DataFrame:
    """Multi-probe cell assignment: one output row per (input row, probed
    cell), probing the ``nprobe`` max-cosine cells. Tie-break matches
    :func:`assign_cells` (lowest cell id first), so ``nprobe=1`` reproduces
    the single-cell assignment exactly. Same literal/join strategy split as
    :func:`assign_cells`."""
    method = _resolve_assign_method(method, n_cells, id_col)
    if method == "join":
        return _assign_cells_join(df, cents, vc, id_col, nprobe=nprobe)
    rows = cents_rows if cents_rows is not None else _collect_cents(cents, n_cells)
    if not rows:
        return df.withColumn("cell", F.lit(-1).cast("int"))
    cos = _literal_cosines(rows, vc)
    # sort (neg cosine, cell id) ascending = cosine desc, lowest cell on tie
    pairs = F.array(
        *[
            F.struct((-cos[i]).alias("neg"), F.lit(rows[i]["cent_id"]).alias("cell"))
            for i in range(len(cos))
        ]
    )
    probed = F.transform(
        F.slice(F.array_sort(pairs), 1, min(nprobe, len(cos))),
        lambda s: s["cell"],
    )
    return df.withColumn("cell", F.explode(probed)).withColumn(
        "cell", F.col("cell").cast("int")
    )


def kmeans_centroids(
    emb: DataFrame,
    n_cells: int,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministically-seeded Lloyd refinement of the IVF coarse
    quantizer under cosine similarity (spherical k-means without the
    explicit re-normalize — cosine is scale-invariant, so the plain
    per-cell mean is a valid update). Init = :func:`ivf_centroids`
    (positional seed, replayable); each iteration runs

      1. broadcast-join cell assignment (:func:`_assign_cells_join` —
         never the literal path: k-means is exactly the regime where
         n_cells grows), then
      2. the mean update as ONE posexplode → (cell, pos) avg →
         re-assembled array — all shuffles keyed on (cell, pos), partial
         aggregation map-side.

    Each round's centroids are ``localCheckpoint``-ed (iterative lineage
    truncation, same rule as connected_components). Cells that lose all
    members drop out — callers see <= n_cells centroids (standard Lloyd
    degeneracy handling). At 10^10 vectors: fit on a deterministic sample
    (pass the sampled frame here), assign the full corpus afterwards; the
    seed init generalizes to k-means|| on a real cluster."""
    if n_iters < 0:
        raise ValueError(f"n_iters must be >= 0, got {n_iters}")
    cents = ivf_centroids(emb, n_cells, id_col=id_col, vec_col=vec_col)
    if n_iters:
        cents = cents.localCheckpoint()
    base = emb.select(F.col(id_col).alias("_kid"), F.col(vec_col).alias("_kv"))
    for _ in range(n_iters):
        assigned = _assign_cells_join(base, cents, "_kv", "_kid", nprobe=1)
        cents = (
            assigned.select("cell", F.posexplode("_kv").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cent_v")
            )
            .select(F.col("cell").cast("int").alias("cent_id"), "cent_v")
            .localCheckpoint()
        )
    return cents


def ann_ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    n_cells: int = 4,
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "auto",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN (coarse quantizer + inverted lists): deterministic
    centroids (:func:`ivf_centroids`, or pass ``centroids`` — e.g. a
    :func:`kmeans_centroids` fit), every vector assigned to its max-cosine
    cell (:func:`assign_cells`), candidates restricted to the query's
    ``nprobe`` best cells — the standard recall/cost lever (each probed
    cell adds one inverted list's worth of candidates). ``method`` picks
    the cell-assignment strategy (literal inline vs broadcast join — see
    :func:`assign_cells`; both yield identical cells). At scale the corpus
    is hash-partitioned by ``cell`` so each inverted list is co-located
    and the probe is a broadcast-per-cell join instead of a full scan."""
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(emb, n_cells, id_col=id_col, vec_col=vec_col)
    )
    resolved = _resolve_assign_method(method, n_cells, "_probe")
    c_df = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    q_df = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    if resolved == "literal":
        # collect the (small) centroid table ONCE, share across both assigners
        rows = _collect_cents(cents, n_cells)
        c = assign_cells(c_df, cents, n_cells, "cv", method="literal", cents_rows=rows)
        q = assign_cells_topk(
            q_df, cents, n_cells, "qv", nprobe, method="literal", cents_rows=rows
        )
    else:
        # materialize the centroid plan once; both broadcast joins reuse it
        cents = cents.localCheckpoint()
        c = assign_cells(c_df, cents, n_cells, "cv", id_col="neighbor_id", method="join")
        q = assign_cells_topk(
            q_df, cents, n_cells, "qv", nprobe, id_col="query_id", method="join"
        )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine_expr("cv", "qv"), 4))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cell", "rank", "neighbor_id", "cos")
    )


def ann_ivf_kmeans_topk(
    emb: DataFrame,
    queries: DataFrame,
    n_cells: int = 8,
    k: int = 5,
    nprobe: int = 2,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN over a REAL quantizer: deterministically-seeded k-means
    centroids (:func:`kmeans_centroids`) + the broadcast-join assignment —
    the full 100 TB configuration (no literal expressions anywhere, cells
    fit the data instead of being the first n vectors)."""
    cents = kmeans_centroids(emb, n_cells, n_iters=n_iters, id_col=id_col, vec_col=vec_col)
    return ann_ivf_topk(
        emb, queries, n_cells=n_cells, k=k, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col, method="join", centroids=cents,
    )


def ann_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    n_planes: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed ANN: hyperplanes are the first ``n_planes`` corpus
    vectors by id, re-indexed densely like :func:`ivf_centroids`
    (deterministic + oracle-replayable). Candidates = same bucket; top-k by
    exact cosine within candidates."""
    w = W.orderBy(id_col)
    planes = (
        emb.orderBy(id_col).limit(n_planes)
        .select(
            (F.row_number().over(w) - 1).alias("plane_id"),
            F.col(vec_col).alias("plane_v"),
        )
    )

    def with_bucket(df: DataFrame, idc: str, vc: str) -> DataFrame:
        out = df
        for i in range(n_planes):
            p = planes.filter(F.col("plane_id") == F.lit(i)).select(
                F.col("plane_v").alias(f"pl{i}")
            )
            out = out.crossJoin(F.broadcast(p))
        bucket = F.lit(0)
        for i in range(n_planes):
            bit = F.when(dot_expr(vc, f"pl{i}") > 0, F.lit(2**i)).otherwise(F.lit(0))
            bucket = bucket + bit
        return out.withColumn("bucket", bucket.cast("int")).drop(
            *[f"pl{i}" for i in range(n_planes)]
        )

    c = with_bucket(emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")), "neighbor_id", "cv")
    q = with_bucket(queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")), "query_id", "qv")
    scored = (
        # queries are the small side by construction — broadcast them so the
        # corpus never shuffles (same hint as the brute/IVF siblings)
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine_expr("cv", "qv"), 4))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "bucket", "rank", "neighbor_id", "cos")
    )


def ann_recall_report(
    emb: DataFrame,
    queries: DataFrame,
    n_cells: int = 4,
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "auto",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Index-quality gate: per-query recall@k of the IVF index against the
    brute-force ground truth — the measurement that decides whether an
    approximate index is allowed to serve a pipeline stage (dedup blocking,
    retrieval mixing) before 100 TB flows through it.

    Both rankings run through the existing operators (identical rounding
    and tie-breaks), then a LEFT join from truth to the approximate set
    counts hits: recall = |approx ∩ truth| / |truth| per query (|truth|,
    not k — a query with fewer than k valid neighbors isn't penalized for
    arithmetic it can't win). The join keys are (query, neighbor) id pairs
    — k·|queries| rows, broadcastable at any corpus size; the dominant
    cost stays the two rankings themselves."""
    truth = ann_bruteforce_topk(emb, queries, k=k, id_col=id_col, vec_col=vec_col)
    approx = ann_ivf_topk(
        emb, queries, n_cells=n_cells, k=k, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col, method=method, centroids=centroids,
    )
    hit = approx.select("query_id", "neighbor_id", F.lit(1).alias("_hit"))
    joined = truth.select("query_id", "neighbor_id").join(
        F.broadcast(hit), ["query_id", "neighbor_id"], "left"
    )
    return (
        joined.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_truth"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("n_hit"),
        )
        .select(
            "query_id",
            "n_truth",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_truth"), 4).alias("recall"),
        )
    )
