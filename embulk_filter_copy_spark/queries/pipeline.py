"""Training-data pipeline queries over `documents` / `embeddings`, with
DuckDB oracles replaying the SAME portable-hash / vector formulas.

The corpus vocabulary is tiny (≈31 words), so set-similarity thresholds are
tuned high (unigram Jaccard ≥ 0.9) — the operators themselves take n-gram
size / thresholds as parameters (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from embulk_filter_copy_spark.operators import dedup as D
from embulk_filter_copy_spark.operators import multimodal as M
from embulk_filter_copy_spark.operators import sampling as SA
from embulk_filter_copy_spark.operators import similarity as S
from embulk_filter_copy_spark.operators import text as TX
from embulk_filter_copy_spark.queries.common import duck_phash, reps, spark_phash, t

_TOK_CTE = """
tok AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''
)
"""


# ------------------------------------------------------------- exact dedup
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup_groups(t(spark, sf_dir, "documents"))


DEDUP_EXACT_SQL = """
SELECT md5(text) AS content_md5, count(*) AS n_docs, min(doc_id) AS keep_doc_id
FROM documents GROUP BY 1
"""


# ------------------------------------------------------------- minhash
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_signatures(t(spark, sf_dir, "documents"), k=8)


def _minhash_sig_sql(k: int = 8) -> str:
    mins = ",\n       ".join(
        f"min({duck_phash('tok', f'mh{i}:')}) AS mh{i}" for i in range(k)
    )
    return f"WITH {_TOK_CTE} SELECT doc_id, {mins} FROM tok GROUP BY doc_id"


_MINHASH_CAP = 20  # max docs per LSH band bucket (see minhash_candidate_pairs)


def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = D.minhash_signatures(t(spark, sf_dir, "documents"), k=8)
    return D.minhash_candidate_pairs(
        sig, bands=4, rows_per_band=2, max_bucket_size=_MINHASH_CAP
    )


def _minhash_pairs_ctes(doc_table: str = "documents") -> tuple[str, str]:
    """(CTE list, final UNION select) — split so callers can splice the
    pair graph into a larger flat WITH list (DuckDB resolves nested WITH
    scopes poorly inside a recursive query). ``doc_table`` lets a caller
    build the pair graph over a pre-filtered doc CTE (the composed corpus
    build gates on quality first)."""
    tok_cte = _TOK_CTE if doc_table == "documents" else f"""
tok AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM {doc_table})
  WHERE tok <> ''
)
"""
    mins = ",\n       ".join(
        f"min({duck_phash('tok', f'mh{i}:')}) AS mh{i}" for i in range(8)
    )
    capped = []
    bands = []
    for b in range(4):
        c0, c1 = f"mh{2 * b}", f"mh{2 * b + 1}"
        capped.append(
            f"cb{b} AS (SELECT doc_id, {c0}, {c1} FROM ("
            f"SELECT doc_id, {c0}, {c1}, count(*) OVER (PARTITION BY {c0}, {c1}) AS bs"
            f" FROM sig) WHERE bs <= {_MINHASH_CAP})"
        )
        bands.append(
            f"SELECT x.doc_id AS a, y.doc_id AS b FROM cb{b} x JOIN cb{b} y"
            f" ON x.{c0} = y.{c0} AND x.{c1} = y.{c1} AND x.doc_id < y.doc_id"
        )
    ctes = (
        f"{tok_cte},\nsig AS (SELECT doc_id, {mins} FROM tok GROUP BY doc_id),\n"
        + ",\n".join(capped)
    )
    return ctes, "\nUNION\n".join(bands)


def _minhash_pairs_sql() -> str:
    ctes, union = _minhash_pairs_ctes()
    return f"WITH {ctes}\n{union}"


# ------------------------------------------------------------- components
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH pairs → dedup clusters: connected components over the minhash
    candidate graph, every doc labeled with its cluster's min doc id. The
    DuckDB oracle walks the same graph with a recursive CTE — an exact
    independent replay of the iterative distributed propagation."""
    docs = t(spark, sf_dir, "documents")
    sig = D.minhash_signatures(docs, k=8)
    pairs = D.minhash_candidate_pairs(
        sig, bands=4, rows_per_band=2, max_bucket_size=_MINHASH_CAP
    )
    return D.connected_components(pairs, docs.select("doc_id"))


def _components_sql() -> str:
    ctes, union = _minhash_pairs_ctes()
    return f"""
WITH RECURSIVE {ctes},
pairs AS ({union}),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION
  SELECT b AS src, a AS dst FROM pairs
),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS doc_id, min(lbl) AS comp FROM reach GROUP BY node
"""


def dedup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME clustering computed by large-star/small-star contraction
    (O(log n) rounds on any graph shape — the variant a 10^10-edge graph
    with long chains needs) against the SAME recursive-CTE oracle as the
    label-propagation implementation: the driver's hash gate proves the two
    algorithms agree."""
    docs = t(spark, sf_dir, "documents")
    sig = D.minhash_signatures(docs, k=8)
    pairs = D.minhash_candidate_pairs(
        sig, bands=4, rows_per_band=2, max_bucket_size=_MINHASH_CAP
    )
    return D.connected_components_star(pairs, docs.select("doc_id"))


def dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline's final dedup verdict: one row per doc with its cluster
    id and keep flag (keep = the cluster's min doc id — the canonical
    survivor). This is the table a training-data pipeline joins against to
    filter the corpus."""
    comp = dedup_components(spark, sf_dir)
    return comp.select(
        "doc_id", "comp", (F.col("doc_id") == F.col("comp")).alias("keep")
    )


def _keep_list_sql() -> str:
    return f"""
WITH RECURSIVE {_minhash_pairs_ctes()[0]},
pairs AS ({_minhash_pairs_ctes()[1]}),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION
  SELECT b AS src, a AS dst FROM pairs
),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node AS doc_id, min(lbl) AS comp FROM reach GROUP BY node)
SELECT doc_id, comp, doc_id = comp AS keep FROM comp
"""


# ------------------------------------------------------------- jaccard
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(t(spark, sf_dir, "documents"), threshold=0.9, n=1)


DEDUP_JACCARD_SQL = f"""
WITH {_TOK_CTE},
hsh AS (SELECT DISTINCT doc_id, {duck_phash('tok', 'jac:')} AS h FROM tok),
sizes AS (SELECT doc_id, count(*) AS sz FROM hsh GROUP BY doc_id),
shared AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
  FROM hsh x JOIN hsh y ON x.h = y.h AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT a, b, jaccard FROM (
  SELECT a, b, round(shared::DOUBLE / (sa.sz + sb.sz - shared), 6) AS jaccard
  FROM shared JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
) WHERE jaccard >= 0.9
"""


def dedup_jaccard3_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-trigram Jaccard — the scale-appropriate shingle: trigrams are
    discriminative, so the inverted-index join fans out per near-dup pair
    instead of per vocabulary word (the unigram variant degenerates on this
    tiny-vocab corpus; see bench numbers)."""
    return D.ngram_jaccard_pairs(t(spark, sf_dir, "documents"), threshold=0.8, n=3)


DEDUP_JACCARD3_SQL = f"""
WITH g AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
tok AS (
  SELECT DISTINCT doc_id, {duck_phash('sh', 'jac:')} AS h FROM (
    SELECT doc_id,
           unnest([array_to_string(toks[i:i+2], ' ')
                   FOR i IN range(1, greatest(len(toks) - 1, 2))]) AS sh
    FROM g
  ) WHERE trim(sh) <> ''
),
sizes AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
shared AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
  FROM tok x JOIN tok y ON x.h = y.h AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT a, b, jaccard FROM (
  SELECT a, b, round(shared::DOUBLE / (sa.sz + sb.sz - shared), 6) AS jaccard
  FROM shared JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
) WHERE jaccard >= 0.8
"""


# ------------------------------------------------------------- simhash
_SIMHASH_CAP = 64  # max docs per bit-band bucket (see simhash_pairs)


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-band LSH pairs (4 bands x 4 bits) with the band-bucket cap. A
    16-bit simhash over this tiny-vocab corpus collides massively, so the
    TRUE hamming<=2 pair set is O(n²) — any "correct" uncapped operator
    must materialize it. The cap drops degenerate band buckets (same guard
    as minhash), bounding output at the cost of recall inside capped
    buckets; the oracle replays the banding + cap exactly."""
    return D.simhash_pairs(
        t(spark, sf_dir, "documents"),
        max_hamming=2, bands=4, max_bucket_size=_SIMHASH_CAP,
    )


DEDUP_SIMHASH_SQL = f"""
WITH {_TOK_CTE},
th AS (SELECT doc_id, {duck_phash("tok", "sim:")} AS h FROM tok),
votes AS (
  SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM th, range(16) t(b) GROUP BY doc_id, b
),
sh AS (
  SELECT doc_id, CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
),
e AS (
  SELECT doc_id, simhash, bi, (simhash >> (bi * 4)) & 15 AS bv
  FROM sh, range(4) t(bi)
),
ec AS (
  SELECT doc_id, simhash, bi, bv FROM (
    SELECT *, count(*) OVER (PARTITION BY bi, bv) AS bs FROM e
  ) WHERE bs <= {_SIMHASH_CAP}
)
SELECT DISTINCT a, b, hamming FROM (
  SELECT x.doc_id AS a, y.doc_id AS b,
         CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
  FROM ec x JOIN ec y ON x.bi = y.bi AND x.bv = y.bv AND x.doc_id < y.doc_id
) WHERE hamming <= 2
"""


def dedup_simhash64_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB simhash configuration: 64-bit signature, 4 x 16-bit bands
    (band-key space 2^16 — buckets hold ~n/65536 docs), lossless for
    max_hamming=2 since bands > max_hamming. Exercises the parameterized
    ``bits`` path end-to-end against a full DuckDB replay (the old code
    hardcoded 16 bits and silently degenerated at bits=64)."""
    return D.simhash_pairs(
        t(spark, sf_dir, "documents"),
        max_hamming=2, bands=4, bits=64, max_bucket_size=_SIMHASH_CAP,
    )


# 64-bit oracle notes: bit 63 is assembled from the MIN_VALUE literal
# (DuckDB raises on 1::BIGINT << 63) via bit_or (sum would overflow);
# bits 32-63 come from the independent 'sim2:' salt, mirroring simhash_sig.
DEDUP_SIMHASH64_SQL = f"""
WITH {_TOK_CTE},
th AS (SELECT doc_id, {duck_phash("tok", "sim:")} AS h1,
              {duck_phash("tok", "sim2:")} AS h2 FROM tok),
votes AS (
  SELECT doc_id, bb,
         sum(CASE WHEN ((CASE WHEN bb < 32 THEN h1 >> bb
                              ELSE h2 >> (bb - 32) END) & 1) = 1
                  THEN 1 ELSE -1 END) AS v
  FROM th, range(64) t(bb) GROUP BY doc_id, bb
),
sh AS (
  SELECT doc_id,
         bit_or(CASE WHEN v > 0
                     THEN (CASE WHEN bb = 63 THEN (-9223372036854775807 - 1)
                                ELSE (1::BIGINT << bb) END)
                     ELSE 0 END) AS simhash
  FROM votes GROUP BY doc_id
),
e AS (
  SELECT doc_id, simhash, bi, (simhash >> (bi * 16)) & 65535 AS bv
  FROM sh, range(4) t(bi)
),
ec AS (
  SELECT doc_id, simhash, bi, bv FROM (
    SELECT *, count(*) OVER (PARTITION BY bi, bv) AS bs FROM e
  ) WHERE bs <= {_SIMHASH_CAP}
)
SELECT DISTINCT a, b, hamming FROM (
  SELECT x.doc_id AS a, y.doc_id AS b,
         CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
  FROM ec x JOIN ec y ON x.bi = y.bi AND x.bv = y.bv AND x.doc_id < y.doc_id
) WHERE hamming <= 2
"""


# ------------------------------------------------------------- embeddings
_DCOS = (
    "list_dot_product(x.e, y.e) / (sqrt(list_dot_product(x.e, x.e)) * sqrt(list_dot_product(y.e, y.e)))"
)


def _cell_cte(n_cells: int = 4) -> str:
    """DuckDB mirror of ivf_centroids + assign_cells: centroid i is the
    (i+1)-th corpus vector in id order (OFFSET — explicitly positional, not
    assuming 0-based contiguous ids), every vector goes to its max-cosine
    cell with 6dp rounding and lowest-cell-id tie-break."""

    def cent_cos(i: int) -> str:
        ci = f"(SELECT e FROM e ORDER BY vec_id LIMIT 1 OFFSET {i})"
        return (
            f"round(list_dot_product(e, {ci})"
            f" / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product({ci}, {ci}))), 6)"
        )

    cols = ",\n         ".join(f"{cent_cos(i)} AS c{i}" for i in range(n_cells))
    best = "greatest(" + ", ".join(f"c{i}" for i in range(n_cells)) + ")"
    cell = "-1"
    for i in reversed(range(n_cells)):  # lowest cell id wins ties (matches Spark)
        cell = f"CASE WHEN c{i} = {best} THEN {i} ELSE {cell} END"
    return f"""
e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
b AS (
  SELECT vec_id, e, CAST({cell} AS INT) AS cell
  FROM (SELECT vec_id, e,
         {cols}
        FROM e)
)"""


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.embedding_near_dup_pairs(
        t(spark, sf_dir, "embeddings"), threshold=0.35, n_cells=4
    )


DEDUP_EMB_SQL = f"""
WITH {_cell_cte(4)}
SELECT cell, a, b, cos FROM (
  SELECT x.cell, x.vec_id AS a, y.vec_id AS b, round({_DCOS}, 4) AS cos
  FROM b x JOIN b y ON x.cell = y.cell AND x.vec_id < y.vec_id
) WHERE cos >= 0.35
"""


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return S.ann_bruteforce_topk(emb, emb.filter(F.col("vec_id") < 5), k=5)


ANN_BRUTE_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
scored AS (
  SELECT y.vec_id AS query_id, x.vec_id AS neighbor_id, round({_DCOS}, 4) AS cos
  FROM e x JOIN e y ON y.vec_id < 5 AND x.vec_id <> y.vec_id
)
SELECT query_id, rank, neighbor_id, cos FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= 5
"""


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return S.ann_ivf_topk(emb, emb.filter(F.col("vec_id") < 5), n_cells=4, k=5)


def _ivf_sql(n_cells: int = 4, k: int = 5) -> str:
    return f"""
WITH {_cell_cte(n_cells)},
scored AS (
  SELECT y.vec_id AS query_id, x.cell, x.vec_id AS neighbor_id, round({_DCOS}, 4) AS cos
  FROM b x JOIN b y ON x.cell = y.cell AND y.vec_id < 5 AND x.vec_id <> y.vec_id
)
SELECT query_id, cell, rank, neighbor_id, cos FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def ann_ivf_joinpath_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME IVF search forced onto the broadcast-join cell-assignment
    path (the 100 TB strategy — O(1) expression size in n_cells) against
    the SAME oracle as the literal path: the driver's value-hash gate
    proves the two physical strategies are semantically identical."""
    emb = t(spark, sf_dir, "embeddings")
    return S.ann_ivf_topk(
        emb, emb.filter(F.col("vec_id") < 5), n_cells=4, k=5, method="join"
    )


def _kmeans_fixture_path() -> str:
    import os

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
        "kmeans_centroids_c4.parquet",
    )


def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search over a REAL k-means quantizer via the broadcast-join
    assignment path (nprobe=2) — the full 100 TB configuration.

    The centroids are a FROZEN fixture (`fixtures/kmeans_centroids_c4.
    parquet`): one deterministic `similarity.kmeans_centroids` fit (seeded
    init, 2 Lloyd rounds, verified refit-bit-identical), pinned so the
    search stage — assignment argmax + probed-cell join + top-k — is fully
    SQL-expressible and the DuckDB oracle checks rows+schema+values against
    the SAME centroid table. The iterative fit itself is covered by pytest
    property tests (seed equality at n_iters=0, monotone inertia, blob
    separation) plus a fixture-freshness test that refits and compares."""
    emb = t(spark, sf_dir, "embeddings")
    cents = spark.read.parquet(_kmeans_fixture_path())
    return S.ann_ivf_topk(
        emb, emb.filter(F.col("vec_id") < 5), n_cells=4, k=5, nprobe=2,
        method="join", centroids=cents,
    )


def _kmeans_cell_cte() -> str:
    """Shared CTEs: cosine of every vector to every FIXTURE centroid
    (rounded 6dp — the engine's pre-argmax rounding), best cell per corpus
    vector (`b`, tie → lowest cent_id: the struct-min tie-break of
    `similarity._assign_cells_join`)."""
    return f"""
e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cent AS (SELECT cent_id, cent_v FROM read_parquet('{_kmeans_fixture_path()}')),
ca AS (
  SELECT vec_id, e, cent_id,
         round(list_dot_product(e, cent_v)
               / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(cent_v, cent_v))), 6) AS c6
  FROM e CROSS JOIN cent
),
b AS (
  SELECT vec_id, e, CAST(cent_id AS INT) AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c6 DESC, cent_id) AS rn
    FROM ca
  ) WHERE rn = 1
)"""


ANN_KMEANS_SQL = f"""
WITH {_kmeans_cell_cte()},
qp AS (
  SELECT vec_id, e, CAST(cent_id AS INT) AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c6 DESC, cent_id) AS rn
    FROM ca WHERE vec_id < 5
  ) WHERE rn <= 2
),
scored AS (
  SELECT y.vec_id AS query_id, x.cell, x.vec_id AS neighbor_id, round({_DCOS}, 4) AS cos
  FROM b x JOIN qp y ON x.cell = y.cell AND x.vec_id <> y.vec_id
)
SELECT query_id, cell, rank, neighbor_id, cos FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= 5
"""


def dedup_embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs blocked by the k-means fixture cells —
    the real-quantizer configuration of `dedup_embedding_cosine` (balanced
    data-shaped blocks instead of the positional seed), join-path
    assignment, same oracle discipline as `ann_ivf_kmeans_topk`."""
    from embulk_filter_copy_spark.operators import dedup as DD

    emb = t(spark, sf_dir, "embeddings")
    cents = spark.read.parquet(_kmeans_fixture_path())
    return DD.embedding_near_dup_pairs(
        emb, threshold=0.35, n_cells=4, method="join", centroids=cents
    )


DEDUP_EMB_KMEANS_SQL = f"""
WITH {_kmeans_cell_cte()}
SELECT cell, a, b, cos FROM (
  SELECT x.cell, x.vec_id AS a, y.vec_id AS b, round({_DCOS}, 4) AS cos
  FROM b x JOIN b y ON x.cell = y.cell AND x.vec_id < y.vec_id
) WHERE cos >= 0.35
"""


def dedup_embedding_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup verdict: connected components over the
    embedding-cosine near-dup graph (k-means fixture cells), one canonical
    survivor (min vec_id) per component. The embedding analogue of
    `dedup_keep_list` — the table a pipeline joins to drop semantic
    near-duplicates the text-level dedups can't see. Same distributed
    shape: cell-blocked pair join → min-label propagation, shuffles only
    ids and labels."""
    from embulk_filter_copy_spark.operators import dedup as DD

    emb = t(spark, sf_dir, "embeddings")
    cents = spark.read.parquet(_kmeans_fixture_path())
    pairs = DD.embedding_near_dup_pairs(
        emb, threshold=0.35, n_cells=4, method="join", centroids=cents
    )
    comp = DD.connected_components(
        pairs, emb.select("vec_id"), node_col="vec_id"
    )
    return comp.select(
        "vec_id", "comp", (F.col("vec_id") == F.col("comp")).alias("keep")
    )


DEDUP_EMB_KEEP_SQL = f"""
WITH RECURSIVE {_kmeans_cell_cte()},
pairs AS (
  SELECT a, b FROM (
    SELECT x.vec_id AS a, y.vec_id AS b, round({_DCOS}, 4) AS cos
    FROM b x JOIN b y ON x.cell = y.cell AND x.vec_id < y.vec_id
  ) WHERE cos >= 0.35
),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION
  SELECT b AS src, a AS dst FROM pairs
),
reach(node, lbl) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node AS vec_id, min(lbl) AS comp FROM reach GROUP BY node)
SELECT vec_id, comp, vec_id = comp AS keep FROM comp
"""


def pipeline_build_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END corpus build a training pipeline actually runs, as
    one composed plan: quality gate (Gopher rules) → near-dup keep-list
    (MinHash LSH → components → canonical survivor) → deterministic 50%
    hash sample → per-source token cap → training-shard assignment. Every
    stage is the already-verified operator; this query verifies their
    COMPOSITION (column contracts, hash-salt independence between stages)
    against one chained CTE oracle. Each stage shuffles only
    ids/hashes/counts — the composed plan inherits every per-stage 100 TB
    property."""
    docs = t(spark, sf_dir, "documents")
    passing = TX.quality_rules(
        docs, min_tokens=30, max_tokens=400,
        min_mean_word_len=3.0, max_mean_word_len=4.5,
        max_top_token_frac=0.12, min_ttr=0.4,
    ).filter(F.col("keep")).select("doc_id")
    docs = docs.join(passing, "doc_id", "left_semi")
    sig = D.minhash_signatures(docs, k=8)
    pairs = D.minhash_candidate_pairs(
        sig, bands=4, rows_per_band=2, max_bucket_size=_MINHASH_CAP
    )
    comp = D.connected_components(pairs, docs.select("doc_id"))
    survivors = comp.filter(F.col("doc_id") == F.col("comp")).select("doc_id")
    kept = docs.join(survivors, "doc_id", "left_semi")
    sampled = SA.sample_by_hash(kept, "doc_id", 0.5)
    capped = SA.cap_tokens_per_group(
        sampled, budget=15_000, group_col="source", key_col="doc_id"
    )
    out = SA.assign_shards(
        capped.select("doc_id", "source", "n_tok"), "doc_id", 8
    )
    return out.select("doc_id", "source", "n_tok", "shard", "pos")


def _build_corpus_sql() -> str:
    ctes, union = _minhash_pairs_ctes(doc_table="gated")
    return f"""
WITH RECURSIVE qtk AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_distinct,
         length(text) AS n_chars
  FROM documents
),
qrep AS (
  SELECT doc_id, max(c) AS top_c, sum(c) AS total_c
  FROM (
    SELECT doc_id, tok, count(*) AS c
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY 1, 2
  ) GROUP BY doc_id
),
gated AS (
  SELECT d.* FROM documents d
  JOIN qtk ON qtk.doc_id = d.doc_id
  JOIN qrep ON qrep.doc_id = d.doc_id
  WHERE qtk.n_tokens BETWEEN 30 AND 400
    AND (qtk.n_chars - (qtk.n_tokens - 1)) / CAST(qtk.n_tokens AS DOUBLE)
        BETWEEN 3.0 AND 4.5
    AND qrep.top_c / CAST(qrep.total_c AS DOUBLE) <= 0.12
    AND qtk.n_distinct / CAST(qtk.n_tokens AS DOUBLE) >= 0.4
),
{ctes},
pairs AS ({union}),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION
  SELECT b AS src, a AS dst FROM pairs
),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM gated
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node AS doc_id, min(lbl) AS comp FROM reach GROUP BY node),
kept AS (
  SELECT d.* FROM gated d
  JOIN comp ON comp.doc_id = d.doc_id AND comp.comp = d.doc_id
),
samp AS (
  SELECT * FROM kept
  WHERE ({duck_phash("doc_id", "sample:")} % 1000000) < 500000
),
tk AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok,
         {duck_phash("doc_id", "cap:")} AS h
  FROM samp
),
capped AS (
  SELECT doc_id, source, CAST(n_tok AS INT) AS n_tok
  FROM (
    SELECT *, coalesce(sum(n_tok) OVER (
        PARTITION BY source ORDER BY h, doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
    FROM tk
  ) WHERE before < 15000
),
sh AS (
  SELECT doc_id, source, n_tok,
         CAST({duck_phash("doc_id", "shard:")} % 8 AS INT) AS shard,
         {duck_phash("doc_id", "shard:")} AS h2
  FROM capped
)
SELECT doc_id, source, n_tok, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY h2, doc_id) - 1 AS INT) AS pos
FROM sh
"""


def text_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality gate: ten named Gopher/C4-style rule booleans
    + the keep conjunction. Lexical thresholds are tuned so the synthetic
    corpus splits both ways (len / word-len / repetition / diversity /
    stopwords / short-words); the structural Gopher rules (symbol, bullet,
    ellipsis, alpha) run at paper thresholds — the synthetic corpus has no
    such structure, so they pass here and split on the structured corpus
    in tests/test_text_ops.py."""
    return TX.quality_rules(
        t(spark, sf_dir, "documents"),
        min_tokens=30, max_tokens=400,
        min_mean_word_len=3.0, max_mean_word_len=4.5,
        max_top_token_frac=0.12, min_ttr=0.4,
        min_stop_hits=2,
        max_symbol_word_ratio=0.1,
        max_bullet_line_frac=0.9,
        max_ellipsis_line_frac=0.3,
        min_alpha_word_frac=0.8,
        max_short_word_frac=0.05,
    )


TEXT_RULES_SQL = """
WITH tk AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_distinct,
         length(text) AS n_chars,
         len(list_intersect(list_distinct(string_split(text, ' ')),
             ['the','a','of','and','to','in','is','that'])) AS stop_hits,
         (length(text) - length(replace(text, '#', '')))
           + (length(text) - length(replace(text, '...', ''))) / 3
           + (length(text) - length(replace(text, '…', ''))) AS symbols,
         len(list_filter(string_split(text, chr(10)),
             l -> l LIKE '-%' OR l LIKE '*%' OR l LIKE '•%')) AS bullet_lines,
         len(list_filter(string_split(text, chr(10)),
             l -> l LIKE '%...' OR l LIKE '%…')) AS ellipsis_lines,
         len(string_split(text, chr(10))) AS n_lines,
         len(list_filter(string_split(text, ' '),
             w -> regexp_matches(w, '[A-Za-z]'))) AS alpha_words,
         len(list_filter(string_split(text, ' '),
             w -> length(w) <= 2)) AS short_words
  FROM documents
),
uni AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY 1, 2
),
rep AS (
  SELECT doc_id, max(c) AS top_c, sum(c) AS total_c FROM uni GROUP BY doc_id
),
j AS (
  SELECT tk.doc_id, n_tokens, stop_hits,
         (n_chars - (n_tokens - 1)) / CAST(n_tokens AS DOUBLE) AS mwl,
         n_distinct / CAST(n_tokens AS DOUBLE) AS ttr,
         top_c / CAST(total_c AS DOUBLE) AS ttf,
         symbols / CAST(n_tokens AS DOUBLE) AS syr,
         bullet_lines / CAST(n_lines AS DOUBLE) AS blf,
         ellipsis_lines / CAST(n_lines AS DOUBLE) AS elf,
         alpha_words / CAST(n_tokens AS DOUBLE) AS awf,
         short_words / CAST(n_tokens AS DOUBLE) AS swf
  FROM tk JOIN rep ON rep.doc_id = tk.doc_id
)
SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
       round(mwl, 4) AS mean_word_len,
       round(ttr, 4) AS ttr,
       round(ttf, 4) AS top_token_frac,
       CAST(stop_hits AS INT) AS stop_hits,
       round(syr, 4) AS symbol_ratio,
       round(swf, 4) AS short_word_frac,
       (n_tokens BETWEEN 30 AND 400) AS rule_len,
       (mwl >= 3.0 AND mwl <= 4.5) AS rule_word_len,
       (ttf <= 0.12) AS rule_repetition,
       (ttr >= 0.4) AS rule_diversity,
       (stop_hits >= 2) AS rule_stopwords,
       (syr <= 0.1) AS rule_symbol,
       (blf <= 0.9) AS rule_bullet,
       (elf <= 0.3) AS rule_ellipsis,
       (awf >= 0.8) AS rule_alpha,
       (swf <= 0.05) AS rule_short_words,
       ((n_tokens BETWEEN 30 AND 400) AND (mwl >= 3.0 AND mwl <= 4.5)
        AND (ttf <= 0.12) AND (ttr >= 0.4) AND (stop_hits >= 2)
        AND (syr <= 0.1) AND (blf <= 0.9) AND (elf <= 0.3)
        AND (awf >= 0.8) AND (swf <= 0.05)) AS keep
FROM j
"""


def sample_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe 80/10/10 split: near-dup components (MinHash LSH graph)
    routed whole to one split — no near-copy of a training doc can land in
    val/test. Oracle: the recursive-CTE component walk + the same
    portable-hash interval layout over the component id."""
    docs = t(spark, sf_dir, "documents")
    sig = D.minhash_signatures(docs, k=8)
    pairs = D.minhash_candidate_pairs(
        sig, bands=4, rows_per_band=2, max_bucket_size=_MINHASH_CAP
    )
    return SA.split_leakage_safe(
        docs, pairs, {"train": 0.8, "val": 0.1, "test": 0.1}
    )


def _leakage_split_sql() -> str:
    ctes, union = _minhash_pairs_ctes()
    return f"""
WITH RECURSIVE {ctes},
pairs AS ({union}),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION
  SELECT b AS src, a AS dst FROM pairs
),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node AS doc_id, min(lbl) AS comp FROM reach GROUP BY node)
SELECT doc_id, comp,
       CASE WHEN u < 800000 THEN 'train'
            WHEN u < 900000 THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id, comp,
             ({duck_phash("comp", "split:")} % 1000000) AS u
      FROM comp)
"""


def sample_domain_token_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget quota: keep docs in hash order until each
    source hits 20k tokens — the domain-cap stage of a mixture build."""
    kept = SA.cap_tokens_per_group(
        t(spark, sf_dir, "documents"), budget=20_000,
        group_col="source", key_col="doc_id",
    )
    return kept.select(
        "doc_id", "source", "n_tok",
        F.col("grp_tokens_before").cast("long").alias("grp_tokens_before"),
    )


DOMAIN_CAP_SQL = f"""
WITH tk AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok,
         {duck_phash("doc_id", "cap:")} AS h
  FROM documents
),
r AS (
  SELECT doc_id, source, CAST(n_tok AS INT) AS n_tok,
         CAST(coalesce(sum(n_tok) OVER (
             PARTITION BY source ORDER BY h, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS grp_tokens_before
  FROM tk
)
SELECT doc_id, source, n_tok, grp_tokens_before
FROM r WHERE grp_tokens_before < 20000
"""


def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality gate: per-query recall@5 of the IVF index (positional
    centroids, nprobe=1) vs brute-force ground truth. The oracle replays
    BOTH rankings and the hit join."""
    emb = t(spark, sf_dir, "embeddings")
    return S.ann_recall_report(
        emb, emb.filter(F.col("vec_id") < 5), n_cells=4, k=5, nprobe=1
    )


ANN_RECALL_SQL = f"""
WITH {_cell_cte(4)},
bt AS (
  SELECT y.vec_id AS query_id, x.vec_id AS neighbor_id, round({_DCOS}, 4) AS cos
  FROM e x JOIN e y ON y.vec_id < 5 AND x.vec_id <> y.vec_id
),
truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
    FROM bt
  ) WHERE rank <= 5
),
iv AS (
  SELECT y.vec_id AS query_id, x.vec_id AS neighbor_id, round({_DCOS}, 4) AS cos
  FROM b x JOIN b y ON x.cell = y.cell AND y.vec_id < 5 AND x.vec_id <> y.vec_id
),
approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
    FROM iv
  ) WHERE rank <= 5
)
SELECT t.query_id,
       count(*) AS n_truth,
       CAST(count(a.neighbor_id) AS BIGINT) AS n_hit,
       round(CAST(count(a.neighbor_id) AS DOUBLE) / count(*), 4) AS recall
FROM truth t LEFT JOIN approx a
  ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
GROUP BY t.query_id
"""


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return S.ann_lsh_topk(emb, emb.filter(F.col("vec_id") < 5), n_planes=4, k=5)


def _plane(i: int) -> str:
    # positional plane selection (OFFSET), mirroring the Spark row_number
    # re-index — no assumption that ids are 0-based contiguous
    return f"(SELECT e FROM e ORDER BY vec_id LIMIT 1 OFFSET {i})"


ANN_LSH_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
b AS (
  SELECT vec_id, e,
         (CASE WHEN list_dot_product(e, {_plane(0)}) > 0 THEN 1 ELSE 0 END
        + CASE WHEN list_dot_product(e, {_plane(1)}) > 0 THEN 2 ELSE 0 END
        + CASE WHEN list_dot_product(e, {_plane(2)}) > 0 THEN 4 ELSE 0 END
        + CASE WHEN list_dot_product(e, {_plane(3)}) > 0 THEN 8 ELSE 0 END) AS bucket
  FROM e
),
scored AS (
  SELECT y.vec_id AS query_id, x.bucket, x.vec_id AS neighbor_id,
         round(list_dot_product(x.e, y.e) / (sqrt(list_dot_product(x.e, x.e)) * sqrt(list_dot_product(y.e, y.e))), 4) AS cos
  FROM b x JOIN b y ON x.bucket = y.bucket AND y.vec_id < 5 AND x.vec_id <> y.vec_id
)
SELECT query_id, bucket, rank, neighbor_id, cos FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= 5
"""


# ------------------------------------------------------------- text analysis
def text_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = TX.quality_score(t(spark, sf_dir, "documents"))
    return q.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        reps(F.avg("ttr"), 4).alias("avg_ttr"),
        reps(F.avg("quality"), 4).alias("avg_quality"),
        F.sum("n_subtokens").alias("total_subtokens"),
    )


TEXT_QUALITY_SQL = """
WITH f AS (
  SELECT source,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
         CAST(list_sum(list_transform(string_split(text, ' '),
              w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS n_subtokens,
         length(text) AS n_chars
  FROM documents
),
q AS (
  SELECT source, n_subtokens,
         round(n_distinct_tokens::DOUBLE / n_tokens, 4) AS ttr,
         round(((n_chars - (n_tokens - 1))::DOUBLE / n_tokens), 4) AS mean_word_len,
         round((CASE WHEN n_chars >= 100 THEN 0.25 ELSE 0 END)
             + (CASE WHEN n_distinct_tokens::DOUBLE / n_tokens BETWEEN 0.2 AND 0.9 THEN 0.25 ELSE 0 END)
             + (CASE WHEN (n_chars - (n_tokens - 1))::DOUBLE / n_tokens BETWEEN 2 AND 12 THEN 0.25 ELSE 0 END)
             + (CASE WHEN n_tokens >= 20 THEN 0.25 ELSE 0 END), 2) AS quality
  FROM f
)
SELECT source, count(*) AS n_docs, round(avg(ttr) + 1e-9, 4) AS avg_ttr,
       round(avg(quality) + 1e-9, 4) AS avg_quality,
       CAST(sum(n_subtokens) AS BIGINT) AS total_subtokens
FROM q GROUP BY source
"""


def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per language: whitespace tokens, the 4-chars-per-token
    BPE budget from token_stats, and a BPE-ish regex tokenizer
    (letter-runs | digit-runs | single punctuation) — all JVM-side."""
    d = TX.token_stats(t(spark, sf_dir, "documents")).withColumn(
        "n_bpe_tokens",
        F.regexp_count("text", F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")),
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_ws_tokens"),
        F.sum("n_subtokens").alias("total_subtokens"),
        F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
        reps(F.avg(F.col("n_bpe_tokens") / F.col("n_tokens")), 4).alias("avg_bpe_per_word"),
    )


TEXT_TOKENS_SQL = """
WITH f AS (
  SELECT lang,
         len(string_split(text, ' ')) AS n_tokens,
         CAST(list_sum(list_transform(string_split(text, ' '),
              w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS n_subtokens,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_bpe_tokens
  FROM documents
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_ws_tokens,
       CAST(sum(n_subtokens) AS BIGINT) AS total_subtokens,
       CAST(sum(n_bpe_tokens) AS BIGINT) AS total_bpe_tokens,
       round(avg(n_bpe_tokens::DOUBLE / n_tokens) + 1e-9, 4) AS avg_bpe_per_word
FROM f GROUP BY lang
"""


def text_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = TX.lang_id(t(spark, sf_dir, "documents"))
    return p.groupBy("lang", "pred_lang").agg(F.count(F.lit(1)).alias("n"))


def _marker_sql(lang: str) -> str:
    from embulk_filter_copy_spark.operators.text import LANG_MARKERS

    parts = [
        f"(CASE WHEN regexp_matches(text, '(^| ){w}( |$)') THEN 1 ELSE 0 END)"
        for w in LANG_MARKERS[lang]
    ]
    return " + ".join(parts)


def _lang_id_sql() -> str:
    from embulk_filter_copy_spark.operators.text import LANG_MARKERS

    langs = list(LANG_MARKERS)
    hits = ",\n       ".join(f"{_marker_sql(lg)} AS h_{lg}" for lg in langs)
    best = "greatest(" + ", ".join(f"h_{lg}" for lg in langs) + ")"
    pred = "'und'"
    for lg in reversed(langs):
        pred = f"CASE WHEN h_{lg} = {best} AND {best} > 0 THEN '{lg}' ELSE {pred} END"
    return f"""
WITH h AS (SELECT lang, {hits} FROM documents)
SELECT lang, pred_lang, count(*) AS n
FROM (SELECT lang, {pred} AS pred_lang FROM h)
GROUP BY lang, pred_lang
"""


def text_fingerprint_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    fp = TX.fingerprint(docs).join(docs.select("doc_id", "source"), "doc_id")
    return fp.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fingerprint").alias("n_fingerprints"),
        F.min("fingerprint").alias("min_fingerprint"),
    )


TEXT_FP_SQL = f"""
WITH g AS (
  SELECT doc_id, source,
         [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, greatest(len(toks) - 1, 2))] AS grams
  FROM (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents)
),
fp AS (
  SELECT doc_id, source,
         list_aggregate(list_transform(grams, gg -> {duck_phash('gg', 'fp:')}), 'min') AS fingerprint
  FROM g
)
SELECT source, count(*) AS n_docs, count(DISTINCT fingerprint) AS n_fingerprints,
       min(fingerprint) AS min_fingerprint
FROM fp GROUP BY source
"""


# ------------------------------------------------------------- multimodal
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = M.to_media_assets(t(spark, sf_dir, "documents"), "doc_id", "text", "text")
    return M.extract_metadata(assets)


MULTIMODAL_META_SQL = """
SELECT doc_id AS asset_id, 'text' AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       sha256(text) AS sha256,
       lower(hex(encode(substr(text, 1, 4)))) AS magic
FROM documents
"""


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = M.to_media_assets(t(spark, sf_dir, "documents"), "doc_id", "text", "text")
    feats = M.decode_and_featurize(assets, n_features=8)
    return feats.select(
        "asset_id", F.posexplode("feature").alias("pos", "fv")
    ).select("asset_id", "pos", F.round(F.col("fv").cast("double"), 4).alias("fv"))


MULTIMODAL_FEAT_SQL = """
WITH s AS (SELECT doc_id AS asset_id, sha256(text) AS sha FROM documents)
SELECT asset_id, CAST(i AS INT) AS pos,
       round((('0x' || substr(sha, 2 * i + 1, 2))::INT) / 255.0, 4) AS fv
FROM s, range(8) t(i)
"""


# ------------------------------------------------------------- sampling
def sample_docs_by_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 25% Bernoulli corpus sample (portable-hash filter —
    narrow, shuffle-free, pushes to the scan)."""
    return SA.sample_by_hash(t(spark, sf_dir, "documents"), "doc_id", 0.25).select(
        "doc_id", "source", "n_chars"
    )


SAMPLE_HASH_SQL = f"""
SELECT doc_id, source, n_chars FROM documents
WHERE ({duck_phash("doc_id", "sample:")} % 1000000) < 250000
"""


def sample_stratified_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-per-source stratified sample (hash-order top-n)."""
    return SA.stratified_sample(
        t(spark, sf_dir, "documents"), "source", 5, "doc_id"
    ).select("doc_id", "source")


SAMPLE_STRAT_SQL = f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {duck_phash("doc_id", "strat:")}, doc_id) AS rn
  FROM documents)
WHERE rn <= 5
"""


def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked token-budget packing: pack_id = floor(exclusive running
    token sum / 256) per source (distributed first-fit approximation)."""
    out = SA.pack_sequences(t(spark, sf_dir, "documents"), 256)
    return out.select(
        "doc_id", "source", F.col("n_tok").cast("long").alias("n_tok"), "pack_id"
    )


PACK_SEQ_SQL = """
SELECT doc_id, source, n_tok,
       CAST(floor(COALESCE(SUM(n_tok) OVER (
            PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 256.0)
            AS BIGINT) AS pack_id
FROM (SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok FROM documents)
"""


# ------------------------------------------------------------- pii scrub
def text_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inject deterministic synthetic PII (the corpus has none), scrub it
    with the regexp chain, and return per-category counts + a digest of the
    cleaned text."""
    did = F.col("doc_id")
    docs = t(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(did % 5 == 0,
                   F.concat(F.lit(" contact user"), did, F.lit("@example.com"))
                   ).otherwise(F.lit("")),
            F.when(did % 7 == 0,
                   F.concat(F.lit(" host 10.0."), (did % 250), F.lit(".1"))
                   ).otherwise(F.lit("")),
            F.when(did % 11 == 0, F.lit(" call 555-867-5309")).otherwise(F.lit("")),
        ),
    )
    out = TX.scrub_pii(docs)
    return out.select(
        "doc_id",
        F.col("n_email").cast("int").alias("n_email"),
        F.col("n_ipv4").cast("int").alias("n_ipv4"),
        F.col("n_phone").cast("int").alias("n_phone"),
        F.md5("clean_text").alias("clean_md5"),
    )


SCRUB_PII_SQL = r"""
WITH injected AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 5 = 0
                 THEN ' contact user' || doc_id || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' host 10.0.' || (doc_id % 250) || '.1' ELSE '' END
         || CASE WHEN doc_id % 11 = 0 THEN ' call 555-867-5309' ELSE '' END
         AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text,
            '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
       CAST(len(regexp_extract_all(text,
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ipv4,
       CAST(len(regexp_extract_all(text,
            '\b\d{3}-\d{3}-\d{4}\b')) AS INT) AS n_phone,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
            '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
            '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g')) AS clean_md5
FROM injected
"""


# ------------------------------------------------------------- repetition
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source aggregates of the Gopher-style top-unigram / top-bigram
    repetition fractions."""
    docs = t(spark, sf_dir, "documents")
    rep = TX.repetition_stats(docs)
    joined = rep.join(docs.select("doc_id", "source"), "doc_id")
    return joined.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        reps(F.avg("top_token_frac"), 4).alias("avg_top_token_frac"),
        reps(F.avg("top_bigram_frac"), 4).alias("avg_top_bigram_frac"),
        reps(F.max("top_token_frac"), 4).alias("max_top_token_frac"),
    )


REPETITION_SQL = """
WITH uni AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY 1, 2
),
ud AS (SELECT doc_id, max(c)::DOUBLE / sum(c) AS top_token_frac FROM uni GROUP BY 1),
bg AS (
  SELECT doc_id, g, count(*) AS c
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i + 1])) AS g
    FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
    WHERE len(tk) >= 2)
  GROUP BY 1, 2
),
bd AS (SELECT doc_id, max(c)::DOUBLE / sum(c) AS top_bigram_frac FROM bg GROUP BY 1),
j AS (
  SELECT d.source, ud.top_token_frac, bd.top_bigram_frac
  FROM documents d JOIN ud USING (doc_id) LEFT JOIN bd USING (doc_id)
)
SELECT source, count(*) AS n_docs,
       round(avg(top_token_frac) + 1e-9, 4) AS avg_top_token_frac,
       round(avg(top_bigram_frac) + 1e-9, 4) AS avg_top_bigram_frac,
       round(max(top_token_frac) + 1e-9, 4) AS max_top_token_frac
FROM j GROUP BY source
"""


# ------------------------------------------- incremental signature upkeep
def dedup_incremental_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup-signature maintenance via the change feed — the
    100 TB shape: when documents change, recompute MinHash signatures ONLY
    for the changed keys and merge them into a persistent signature table,
    instead of re-sketching the whole corpus.

    Flow: documents → lake table (bootstrap) + initial signature table;
    a deterministic update batch (doc_id%7==0 → text||' updated',
    doc_id%13==0 → delete) replayed through the merge; `read_changes`
    yields the net per-key feed (per-file LSN pruning, no full scan);
    signatures recomputed for feed upserts only; deletes tombstone the
    signature rows through the same merge path. The oracle is the FULL
    recompute over the final document state — incremental == full is
    exactly the invariant this maintenance job must keep."""
    import tempfile

    from embulk_filter_copy_spark.cdc.apply import apply_batch
    from embulk_filter_copy_spark.lake.table import LakeTable

    k = 8
    mh_cols = [f"mh{i}" for i in range(k)]
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="efc-incsig-")
    doc_table = LakeTable.create(
        spark, f"{root}/docs", [("doc_id", "long"), ("text", "string")],
        key_columns=["doc_id"], n_buckets=8,
    )
    doc_table.append(docs.withColumn("_lsn", F.lit(0)))
    sig_table = LakeTable.create(
        spark, f"{root}/sigs",
        [("doc_id", "long")] + [(c, "long") for c in mh_cols],
        key_columns=["doc_id"], n_buckets=8,
    )
    sig_table.append(
        D.minhash_signatures(docs, k=k).withColumn("_lsn", F.lit(0))
    )
    v0 = doc_table.current_version()

    did = F.col("doc_id")
    env_null = F.lit(None).cast("string").alias("schema_change")
    upd = docs.filter((did % 7 == 0) & (did % 13 != 0)).select(
        (did + 1000).alias("lsn"),
        F.timestamp_micros(did + 1000).alias("ts"),
        F.lit("U").alias("op"),
        "doc_id",
        F.concat("text", F.lit(" updated")).alias("text"),
        env_null,
    )
    dels = docs.filter(did % 13 == 0).select(
        (did + 1_000_000).alias("lsn"),
        F.timestamp_micros(did + 1_000_000).alias("ts"),
        F.lit("D").alias("op"),
        "doc_id",
        F.lit(None).cast("string").alias("text"),
        env_null,
    )
    apply_batch(doc_table, upd.unionByName(dels), run_id="inc-docs", epoch=0)

    feed = doc_table.read_changes(since_version=v0)
    ups = feed.filter(F.col("op") == "U").select("doc_id", "text", "lsn", "ts")
    new_sigs = D.minhash_signatures(ups, k=k).join(
        ups.select("doc_id", "lsn", "ts"), "doc_id"
    )
    sig_upserts = new_sigs.select(
        "lsn", "ts", F.lit("U").alias("op"), "doc_id", *mh_cols, env_null
    )
    sig_deletes = feed.filter(F.col("op") == "D").select(
        "lsn", "ts", F.lit("D").alias("op"), "doc_id",
        *[F.lit(None).cast("long").alias(c) for c in mh_cols], env_null,
    )
    apply_batch(
        sig_table, sig_upserts.unionByName(sig_deletes), run_id="inc-sigs", epoch=0
    )
    return sig_table.read().select("doc_id", *mh_cols)


def _inc_sig_sql(k: int = 8) -> str:
    mins = ",\n       ".join(
        f"min({duck_phash('tok', f'mh{i}:')}) AS mh{i}" for i in range(k)
    )
    return f"""
WITH final_docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' updated' ELSE text END AS text
  FROM documents WHERE doc_id % 13 <> 0
),
tok AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM final_docs)
  WHERE tok <> ''
)
SELECT doc_id, {mins} FROM tok GROUP BY doc_id
"""


# ------------------------------------------------- decontamination / spans
def _bench_split(spark: SparkSession, sf_dir: str):
    """Deterministic 10% 'benchmark' carve-out of documents (phash salt
    'bench:') — stands in for the eval suites a decontamination pass
    screens against. Returns (corpus, bench)."""
    docs = t(spark, sf_dir, "documents")
    is_bench = F.expr(f"pmod({spark_phash('doc_id', 'bench:')}, 10) = 0")
    return docs.filter(~is_bench), docs.filter(is_bench)


def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram decontamination of the corpus against the carved-out bench
    set: broadcast bench shingle hashes, count per-doc hits. n=3 because
    the synthetic vocab is ~31 words (13-grams would never repeat); the
    operator defaults to n=13 for real text."""
    from embulk_filter_copy_spark.operators import decontam as DC

    corpus, bench = _bench_split(spark, sf_dir)
    return DC.ngram_overlap(corpus, bench, n=3)


def _tri_cte(dist: bool) -> str:
    """DuckDB word-trigram shingles replaying `ngram_shingles(n=3)`:
    positions 1..len-2 (one short gram for <3-token docs)."""
    inner = (
        "SELECT doc_id, unnest([array_to_string(toks[i:i+2], ' ')\n"
        "           FOR i IN range(1, greatest(len(toks) - 1, 2))]) AS sh\n"
        "    FROM g"
    )
    body = f"SELECT DISTINCT doc_id, sh FROM ({inner})" if dist else f"SELECT doc_id, sh FROM ({inner})"
    return (
        "g AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),\n"
        f"sh3 AS ({body} WHERE trim(sh) <> '')"
    )


DECONTAM_SQL = f"""
WITH {_tri_cte(dist=True)},
h AS (SELECT doc_id, {duck_phash('sh', 'dc:')} AS h,
             ({duck_phash('doc_id', 'bench:')} % 10 = 0) AS is_bench
      FROM sh3),
bh AS (SELECT DISTINCT h FROM h WHERE is_bench),
d AS (SELECT doc_id, h FROM h WHERE NOT is_bench),
corpus AS (SELECT doc_id FROM documents
           WHERE NOT ({duck_phash('doc_id', 'bench:')} % 10 = 0)),
sizes AS (SELECT doc_id, count(*) AS n_grams FROM d GROUP BY 1),
hits AS (SELECT d.doc_id, count(*) AS n_hit FROM d JOIN bh USING (h) GROUP BY 1)
SELECT c.doc_id, coalesce(s.n_grams, 0) AS n_grams,
       coalesce(n_hit, 0) AS n_hit_grams,
       CASE WHEN coalesce(s.n_grams, 0) = 0 THEN 0.0
            ELSE round(coalesce(n_hit, 0)::DOUBLE / s.n_grams, 6) END AS contamination
FROM corpus c
LEFT JOIN sizes s ON s.doc_id = c.doc_id
LEFT JOIN hits ON hits.doc_id = c.doc_id
"""


def dedup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication over 3-token windows (positional, not
    set-based — boilerplate repeated across docs counts every occurrence)."""
    from embulk_filter_copy_spark.operators import decontam as DC

    return DC.duplicated_spans(t(spark, sf_dir, "documents"), w=3)


SPAN_STATS_SQL = f"""
WITH {_tri_cte(dist=False)},
pos AS (SELECT doc_id, {duck_phash('sh', 'dc:')} AS h FROM sh3),
cross_h AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd FROM pos GROUP BY h)
            WHERE nd >= 2),
n_all AS (SELECT doc_id, count(*) AS n_windows FROM pos GROUP BY 1),
n_dup AS (SELECT doc_id, count(*) AS n_dup
          FROM pos WHERE h IN (SELECT h FROM cross_h) GROUP BY 1)
SELECT docs.doc_id, coalesce(a.n_windows, 0) AS n_windows,
       coalesce(d.n_dup, 0) AS n_dup_windows,
       CASE WHEN coalesce(a.n_windows, 0) = 0 THEN 0.0
            ELSE round(coalesce(d.n_dup, 0)::DOUBLE / a.n_windows, 6) END AS dup_fraction
FROM (SELECT doc_id FROM documents) docs
LEFT JOIN n_all a ON a.doc_id = docs.doc_id
LEFT JOIN n_dup d ON d.doc_id = docs.doc_id
"""


# ------------------------------------------------- shards / mixture
def sample_assign_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SA.assign_shards(t(spark, sf_dir, "documents"), "doc_id", 8).select(
        "doc_id", "shard", "pos"
    )


ASSIGN_SHARDS_SQL = f"""
WITH h AS (SELECT doc_id, {duck_phash('doc_id', 'shard:')} AS h FROM documents)
SELECT doc_id, CAST(h % 8 AS INT) AS shard,
       CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1 AS INT) AS pos
FROM h
"""

_MIX_WEIGHTS = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}
_MIX_DEFAULT = 0.05


def sample_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SA.mixture_sample(
        t(spark, sf_dir, "documents"),
        "source",
        _MIX_WEIGHTS,
        key_col="doc_id",
        default_fraction=_MIX_DEFAULT,
    ).select("doc_id", "source")


def _mixture_sql() -> str:
    cases = " ".join(
        f"WHEN '{g}' THEN {int(round(f * SA.HASH_MOD))}"
        for g, f in sorted(_MIX_WEIGHTS.items())
    )
    thr = f"CASE source {cases} ELSE {int(round(_MIX_DEFAULT * SA.HASH_MOD))} END"
    return f"""
SELECT doc_id, source FROM documents
WHERE ({duck_phash('doc_id', 'mix:')} % {SA.HASH_MOD}) < ({thr})
"""


# ------------------------------------------------- chunking
def sample_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking (16-token chunks, 4-token overlap): narrow
    scan-speed JVM work; the last window is emitted short, tiny docs yield
    one chunk."""
    return SA.chunk_documents(t(spark, sf_dir, "documents"), 16, overlap=4)


# DuckDB replay of the same start grid: s in range(0, greatest(n-overlap,1), step)
CHUNK_SQL = """
WITH g AS (
  SELECT doc_id, string_split(text, ' ') AS toks, len(string_split(text, ' ')) AS n
  FROM documents
),
s AS (
  SELECT doc_id, n, unnest(range(0, greatest(n - 4, 1), 12)) AS st
  FROM g
)
SELECT s.doc_id,
       CAST(row_number() OVER (PARTITION BY s.doc_id ORDER BY st) - 1 AS INT) AS chunk_idx,
       CAST(least(16, s.n - st) AS INT) AS chunk_n_tokens,
       array_to_string(g.toks[st + 1 : st + 16], ' ') AS chunk_text
FROM s JOIN g USING (doc_id)
"""


QUERIES = {
    "dedup_exact_docs": (dedup_exact_docs, DEDUP_EXACT_SQL),
    "sample_chunk_documents": (sample_chunk_documents, CHUNK_SQL),
    "dedup_minhash_signatures": (dedup_minhash_signatures, _minhash_sig_sql(8)),
    "dedup_minhash_pairs": (dedup_minhash_pairs, _minhash_pairs_sql()),
    "dedup_components": (dedup_components, _components_sql()),
    "dedup_components_star": (dedup_components_star, _components_sql()),
    "dedup_keep_list": (dedup_keep_list, _keep_list_sql()),
    "dedup_jaccard_pairs": (dedup_jaccard_pairs, DEDUP_JACCARD_SQL),
    "dedup_jaccard3_pairs": (dedup_jaccard3_pairs, DEDUP_JACCARD3_SQL),
    "dedup_simhash_pairs": (dedup_simhash_pairs, DEDUP_SIMHASH_SQL),
    "dedup_simhash64_pairs": (dedup_simhash64_pairs, DEDUP_SIMHASH64_SQL),
    "dedup_embedding_cosine": (dedup_embedding_cosine, DEDUP_EMB_SQL),
    "ann_bruteforce_topk": (ann_bruteforce_topk, ANN_BRUTE_SQL),
    "ann_lsh_topk": (ann_lsh_topk, ANN_LSH_SQL),
    "ann_ivf_topk": (ann_ivf_topk, _ivf_sql()),
    "ann_ivf_joinpath_topk": (ann_ivf_joinpath_topk, _ivf_sql()),
    "ann_ivf_kmeans_topk": (ann_ivf_kmeans_topk, ANN_KMEANS_SQL),
    "dedup_embedding_kmeans": (dedup_embedding_kmeans, DEDUP_EMB_KMEANS_SQL),
    "dedup_embedding_keep_list": (dedup_embedding_keep_list, DEDUP_EMB_KEEP_SQL),
    "sample_leakage_safe_split": (sample_leakage_safe_split, _leakage_split_sql()),
    "pipeline_build_corpus": (pipeline_build_corpus, _build_corpus_sql()),
    "text_quality_rules": (text_quality_rules, TEXT_RULES_SQL),
    "sample_domain_token_cap": (sample_domain_token_cap, DOMAIN_CAP_SQL),
    "ann_ivf_recall": (ann_ivf_recall, ANN_RECALL_SQL),
    "text_token_counts": (text_token_counts, TEXT_TOKENS_SQL),
    "text_quality_by_source": (text_quality_by_source, TEXT_QUALITY_SQL),
    "text_lang_id_confusion": (text_lang_id_confusion, _lang_id_sql()),
    "text_fingerprint_stats": (text_fingerprint_stats, TEXT_FP_SQL),
    "multimodal_metadata": (multimodal_metadata, MULTIMODAL_META_SQL),
    "multimodal_features": (multimodal_features, MULTIMODAL_FEAT_SQL),
    "sample_docs_by_hash": (sample_docs_by_hash, SAMPLE_HASH_SQL),
    "sample_stratified_docs": (sample_stratified_docs, SAMPLE_STRAT_SQL),
    "pack_training_sequences": (pack_training_sequences, PACK_SEQ_SQL),
    "text_scrub_pii": (text_scrub_pii, SCRUB_PII_SQL),
    "text_repetition_stats": (text_repetition_stats, REPETITION_SQL),
    "dedup_incremental_signatures": (dedup_incremental_signatures, _inc_sig_sql(8)),
    "decontam_ngram_overlap": (decontam_ngram_overlap, DECONTAM_SQL),
    "dedup_span_stats": (dedup_span_stats, SPAN_STATS_SQL),
    "sample_assign_shards": (sample_assign_shards, ASSIGN_SHARDS_SQL),
    "sample_mixture_weights": (sample_mixture_weights, _mixture_sql()),
}


# ------------------------------------------------- corpus-LM quality
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean unigram log-probability of each doc under the corpus's own
    add-one-smoothed unigram model (the KenLM-free CCNet-style quality
    signal)."""
    out = TX.unigram_logprob(t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id", "n_tokens", reps(F.col("mean_logprob"), 6).alias("mean_logprob")
    )


UNIGRAM_LP_SQL = """
WITH tokp AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
  ) WHERE tok <> ''
),
vocab AS (SELECT tok, count(*) AS cnt FROM tokp GROUP BY tok),
tot AS (SELECT sum(cnt) AS n_total, count(*) AS v_size FROM vocab),
lp AS (SELECT tok, ln((cnt + 1)::DOUBLE / (n_total + v_size)) AS lp FROM vocab, tot),
per AS (
  SELECT doc_id, count(*) AS n_tokens, round(avg(lp) + 1e-9, 6) AS mean_logprob
  FROM tokp JOIN lp USING (tok) GROUP BY doc_id
)
SELECT d.doc_id, coalesce(per.n_tokens, 0) AS n_tokens, per.mean_logprob
FROM (SELECT doc_id FROM documents) d LEFT JOIN per ON per.doc_id = d.doc_id
"""

QUERIES["text_unigram_logprob"] = (text_unigram_logprob, UNIGRAM_LP_SQL)


# ------------------------------------------------- span removal
def dedup_trim_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove cross-doc duplicated 3-token spans from every document (the
    removal step of substring dedup, window-hash approximation)."""
    from embulk_filter_copy_spark.operators import decontam as DC

    return DC.trim_duplicated_spans(t(spark, sf_dir, "documents"), w=3)


# DuckDB replay: same window starts / hash, covered = union of [s, s+2]
# 0-based token indices, kept tokens re-joined in order.
TRIM_SPANS_SQL = f"""
WITH g AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
posu AS (
  SELECT doc_id,
         unnest([{{'s': i - 1, 'sh': array_to_string(toks[i:i+2], ' ')}}
                 FOR i IN range(1, greatest(len(toks) - 1, 2))]) AS u
  FROM g
),
pos AS (
  SELECT doc_id, u.s AS s, {duck_phash("u.sh", 'dc:')} AS h
  FROM posu WHERE trim(u.sh) <> ''
),
cross_h AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd FROM pos GROUP BY h)
            WHERE nd >= 2),
cov AS (
  SELECT DISTINCT doc_id, s + unnest([0, 1, 2]) AS idx
  FROM pos WHERE h IN (SELECT h FROM cross_h)
),
toku AS (
  SELECT doc_id, unnest([{{'idx': i - 1, 'tok': toks[i]}}
                         FOR i IN range(1, len(toks) + 1)]) AS u
  FROM g
),
tokpos AS (SELECT doc_id, u.idx AS idx, u.tok AS tok FROM toku),
kept AS (
  SELECT t.doc_id, t.idx, t.tok
  FROM tokpos t LEFT JOIN cov ON cov.doc_id = t.doc_id AND cov.idx = t.idx
  WHERE cov.idx IS NULL
),
agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS text_trimmed
  FROM kept GROUP BY doc_id
),
removed AS (
  SELECT c.doc_id, count(*) AS n_removed
  FROM cov c JOIN g ON g.doc_id = c.doc_id
  WHERE c.idx < len(g.toks) GROUP BY c.doc_id
)
SELECT g.doc_id,
       coalesce(agg.text_trimmed, '') AS text_trimmed,
       CAST(len(g.toks) AS INT) AS n_tokens,
       CAST(coalesce(removed.n_removed, 0) AS INT) AS n_tokens_removed
FROM g LEFT JOIN agg ON agg.doc_id = g.doc_id
LEFT JOIN removed ON removed.doc_id = g.doc_id
"""

QUERIES["dedup_trim_spans"] = (dedup_trim_spans, TRIM_SPANS_SQL)
