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


def assign_cells(df: DataFrame, cents: DataFrame, n_cells: int, vc: str) -> DataFrame:
    """Assign every row to its max-cosine centroid cell (ties → lowest cell
    id). The centroid set is tiny by construction (the coarse quantizer),
    so it is collected once and inlined as literal vectors — no joins at
    all in the assignment, and a corpus SMALLER than ``n_cells`` simply
    yields fewer cells instead of an empty-filter crossJoin silently
    zeroing the frame. Cell-to-centroid cosines are rounded to 6dp before
    the argmax so the assignment is reproducible across engines."""
    rows = sorted(cents.collect(), key=lambda r: r["cent_id"])[:n_cells]
    if not rows:
        return df.withColumn("cell", F.lit(-1).cast("int"))
    cos = []
    for r in rows:
        ct = F.array(*[F.lit(float(x)) for x in r["cent_v"]])
        cos.append(
            F.round(
                _dot_cols(F.col(vc), ct)
                / (F.sqrt(_dot_cols(F.col(vc), F.col(vc))) * F.sqrt(_dot_cols(ct, ct))),
                6,
            )
        )
    best = F.greatest(*cos) if len(cos) > 1 else cos[0]
    cell = F.lit(-1)
    for i in reversed(range(len(cos))):  # outermost when = cell 0 → lowest wins ties
        cell = F.when(cos[i] == best, F.lit(i)).otherwise(cell)
    return df.withColumn("cell", cell.cast("int"))


def assign_cells_topk(
    df: DataFrame, cents: DataFrame, n_cells: int, vc: str, nprobe: int
) -> DataFrame:
    """Multi-probe cell assignment: one output row per (input row, probed
    cell), probing the ``nprobe`` max-cosine cells. Tie-break matches
    :func:`assign_cells` (lowest cell id first), so ``nprobe=1`` reproduces
    the single-cell assignment exactly."""
    rows = sorted(cents.collect(), key=lambda r: r["cent_id"])[:n_cells]
    if not rows:
        return df.withColumn("cell", F.lit(-1).cast("int"))
    cos = []
    for r in rows:
        ct = F.array(*[F.lit(float(x)) for x in r["cent_v"]])
        cos.append(
            F.round(
                _dot_cols(F.col(vc), ct)
                / (F.sqrt(_dot_cols(F.col(vc), F.col(vc))) * F.sqrt(_dot_cols(ct, ct))),
                6,
            )
        )
    # sort (neg cosine, cell id) ascending = cosine desc, lowest cell on tie
    pairs = F.array(
        *[
            F.struct((-cos[i]).alias("neg"), F.lit(i).alias("cell"))
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


def ann_ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    n_cells: int = 4,
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN (coarse quantizer + inverted lists): deterministic
    centroids (:func:`ivf_centroids`), every vector assigned to its
    max-cosine cell (:func:`assign_cells`), candidates restricted to the
    query's ``nprobe`` best cells — the standard recall/cost lever (each
    probed cell adds one inverted list's worth of candidates). At scale the
    corpus is hash-partitioned by ``cell`` so each inverted list is
    co-located and the probe is a broadcast-per-cell join instead of a full
    scan."""
    cents = ivf_centroids(emb, n_cells, id_col=id_col, vec_col=vec_col)
    c = assign_cells(
        emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        cents, n_cells, "cv",
    )
    q = assign_cells_topk(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        cents, n_cells, "qv", nprobe,
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
