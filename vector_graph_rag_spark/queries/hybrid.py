"""Hybrid retrieval (RRF + weighted fusion), quantized vector search, ANN quality eval.

Operators a vector-database user expects beyond the reference's plain
cosine top-k (milvus.py:346-427):

- ``hybrid_rrf_topk`` — reciprocal-rank fusion of the BM25 lexical ranking
  (queries/ranking.py) and the cosine vector ranking over the same corpus
  (documents.doc_id == embeddings.vec_id in the test data).  RRF(k=60) works
  on *ranks*, never raw scores, so it needs no score normalization — the
  standard hybrid-search combiner (Milvus exposes the same RRFRanker).
  Contributions ``1/(60+rank)`` are rounded to 6 decimals and summed as
  DECIMAL so the fused score is addition-order-independent under shuffles.

- ``quantized_cosine_topk`` — scalar int8 quantization (Milvus's SQ8 index
  analogue): one global max-|x| pass fixes the scale, vectors quantize to
  integers via ``floor(x*scale + 0.5)`` (floor, not round: identical
  half-up behavior for both engines), and ranking uses the *integer* dot
  product — bit-exact across engines, 4× smaller vectors, and SIMD-friendly
  at scale.  Rank by quantized score, tie-break by id.

- ``ann_recall_eval`` — recall@5 of the LSH-bucketed ANN against the exact
  top-5, per query: the ANN-quality harness (SURVEY §2 #45 applied to the
  index itself, the trade Milvus documents for IVF/HNSW).

Scale: every query-side table here is tiny (fixture queries) and broadcast;
the corpus sides shuffle only for their group-bys; top-k is the usual
per-query window — same plan shape as knn_cosine_topk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_graph_rag_spark.functions.literals import inline_rows
from vector_graph_rag_spark.functions.vector import cosine
from vector_graph_rag_spark.queries import register
from vector_graph_rag_spark.queries.ranking import (
    bm25_scores,
    bm25_scores_ctes,
    query_values_sql,
)
from vector_graph_rag_spark.queries.vector import _bucket_col, _bucket_sql, _cos_sql
from vector_graph_rag_spark.sources.tables import load_table

RRF_K = 60

# (query_id, keyword terms, query-vector id) — the two modalities of one query.
_HYBRID_QUERIES = [
    ("q_hash_join", ["hash", "join"], 100),
    ("q_vector_scan", ["vector", "scan", "filter"], 101),
    ("q_customer_order", ["customer", "order"], 102),
]

_LEX_FIXTURE = [(qid, terms) for qid, terms, _ in _HYBRID_QUERIES]
_QVEC_VALUES = ", ".join(f"({qid!r}, {vid})" for qid, _, vid in _HYBRID_QUERIES)

_RRF_SQL = f"""
WITH {bm25_scores_ctes(query_values_sql(_LEX_FIXTURE))},
lex_rank AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
    FROM scored
  ) WHERE rank <= 20
),
qv(query_id, qvec_id) AS (VALUES {_QVEC_VALUES}),
c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT qv.query_id, c.v AS qvec FROM qv JOIN c ON c.vec_id = qv.qvec_id),
vec_rank AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT q.query_id, c.vec_id AS doc_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY round({_cos_sql('c.v', 'q.qvec')}, 6) DESC,
                                       c.vec_id ASC) AS rank
    FROM c CROSS JOIN q
  ) WHERE rank <= 20
),
unioned AS (
  SELECT query_id, doc_id, rank FROM lex_rank
  UNION ALL
  SELECT query_id, doc_id, rank FROM vec_rank
),
fused AS (
  SELECT query_id, doc_id,
         CAST(SUM(CAST(round(1.0 / ({RRF_K} + rank), 6) AS DECIMAL(18,6))) AS DOUBLE)
           AS rrf_score,
         COUNT(*) AS n_lists
  FROM unioned GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, rrf_score, CAST(n_lists AS INT) AS n_lists,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC) AS INT) AS rank
FROM fused
QUALIFY rank <= 10
"""


def _rank_topk(
    df: DataFrame, k: int, order_col: str, keep_score: bool = False
) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc(order_col), F.asc("doc_id"))
    keep = [order_col] if keep_score else ["rank"]
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", *keep)
    )


@register(
    "hybrid_rrf_topk",
    oracle=_RRF_SQL,
    retired=True,  # r17 swap: gate moved to colbert_maxsim_topk (multi-signal ranking fusion family); RRF stays exercised via hybrid_weighted_topk + /search API tests
    description="hybrid retrieval: RRF(k=60) fusion of BM25 and cosine rankings (Milvus RRFRanker analogue)",
)
def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    lex = _rank_topk(bm25_scores(spark, sf_dir, _LEX_FIXTURE), 20, "score")

    emb = load_table(spark, sf_dir, "embeddings")
    c = emb.select("vec_id", F.col("embedding").alias("v"))
    qv = inline_rows(
        spark, [(qid, vid) for qid, _, vid in _HYBRID_QUERIES], "query_id string, qvec_id long"
    )
    q = F.broadcast(
        qv.join(c, c.vec_id == qv.qvec_id).select("query_id", F.col("v").alias("qvec"))
    )
    vec_scored = (
        c.crossJoin(q)
        .withColumn("vscore", F.round(cosine("v", "qvec"), 6))
        .select("query_id", F.col("vec_id").alias("doc_id"), "vscore")
    )
    vec = _rank_topk(vec_scored, 20, "vscore")

    fused = (
        lex.unionByName(vec)
        .withColumn(
            "contrib",
            F.round(F.lit(1.0) / (F.lit(RRF_K) + F.col("rank")), 6).cast("decimal(18,6)"),
        )
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("contrib").cast("double").alias("rrf_score"),
            F.count(F.lit(1)).cast("int").alias("n_lists"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "doc_id", "rrf_score", "n_lists", "rank")
    )


# --- int8 scalar quantization (SQ8) -----------------------------------------

_SQ8_SQL = """
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
mx AS (SELECT max(list_max(list_transform(v, x -> abs(x)))) AS max_abs FROM c),
quant AS (
  SELECT vec_id,
         list_transform(v, x -> CAST(floor(x * (127.0 / mx.max_abs) + 0.5) AS BIGINT)) AS qv
  FROM c CROSS JOIN mx
),
q AS (SELECT vec_id AS query_id, qv AS qq FROM quant WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, quant.vec_id,
         CAST(list_dot_product(quant.qv::DOUBLE[], q.qq::DOUBLE[]) AS BIGINT) AS qscore
  FROM quant CROSS JOIN q
)
SELECT query_id, vec_id, qscore,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY qscore DESC, vec_id ASC) AS INT) AS rank
FROM scored
QUALIFY rank <= 20
"""


@register(
    "quantized_cosine_topk",
    oracle=_SQ8_SQL,
    retired=True,  # r10 swap: compressed-domain top-k driver-gated via ann_pq_adc_topk (PQ codebooks strictly richer than SQ8 scalar bins); r8-green
    description="int8 scalar-quantized top-k (Milvus SQ8 analogue): integer dot products, bit-exact",
)
def quantized_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    c = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    mx = c.agg(
        F.max(F.array_max(F.transform("v", lambda x: F.abs(x)))).alias("max_abs")
    )
    quant = c.crossJoin(F.broadcast(mx)).select(
        "vec_id",
        F.transform(
            "v",
            lambda x: F.floor(x * (F.lit(127.0) / F.col("max_abs")) + F.lit(0.5)),
        ).alias("qv"),
    )
    q = quant.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qq")
    )
    scored = quant.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.aggregate(
            F.zip_with("qv", "qq", lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("qscore"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qscore"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select("query_id", "vec_id", "qscore", "rank")
    )


# --- binary (sign) quantization + Hamming ranking ----------------------------

# Hamming distance between sign bit-vectors without bit packing:
# with s ∈ {0,1} per dim, |sa - sb| summed = Σsa + Σsb - 2·(sa·sb) — exact
# integer arithmetic in both engines (values ≪ 2^53 in doubles).
_HAMMING_SQL = """
WITH c AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[], x -> CASE WHEN x >= 0.0 THEN 1.0 ELSE 0.0 END) AS sb
  FROM embeddings
),
pc AS (SELECT vec_id, sb, CAST(list_sum(sb) AS BIGINT) AS ones FROM c),
q AS (SELECT vec_id AS query_id, sb AS qsb, ones AS qones FROM pc WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, pc.vec_id,
         pc.ones + q.qones - 2 * CAST(list_dot_product(pc.sb, q.qsb) AS BIGINT) AS hamming
  FROM pc CROSS JOIN q
)
SELECT query_id, vec_id, hamming,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY hamming ASC, vec_id ASC) AS INT) AS rank
FROM scored
QUALIFY rank <= 20
"""


@register(
    "hamming_binary_topk",
    oracle=_HAMMING_SQL,
    retired=True,  # r11 swap: alternate vector-TYPE ranking driver-gated via sparse_dot_topk (sparse term vectors; binary-domain compressed ranking moved to PQ codes in r10); sign-bucket arithmetic stays locally gated via minhash/simhash parity; r9-green
    description="sign-quantized binary vectors ranked by Hamming distance (Milvus BINARY_VECTOR analogue, integer-exact)",
)
def hamming_binary_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    sb = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.when(x >= 0.0, F.lit(1.0)).otherwise(F.lit(0.0)),
    )
    c = emb.select("vec_id", sb.alias("sb")).withColumn(
        "ones",
        F.aggregate("sb", F.lit(0.0), lambda acc, x: acc + x).cast("long"),
    )
    q = c.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("sb").alias("qsb"),
        F.col("ones").alias("qones"),
    )
    dot = F.aggregate(
        F.zip_with("sb", "qsb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    ).cast("long")
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        (F.col("ones") + F.col("qones") - F.lit(2) * dot).alias("hamming"),
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("hamming"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select("query_id", "vec_id", "hamming", "rank")
    )


# --- ANN recall harness ------------------------------------------------------

_RECALL_SQL = f"""
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v, {_bucket_sql('embedding::DOUBLE[]')} AS bucket FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qvec, bucket FROM c WHERE vec_id < 20),
exact AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, c.vec_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY round({_cos_sql('c.v', 'q.qvec')}, 6) DESC,
                                       c.vec_id ASC) AS rank
    FROM c CROSS JOIN q
  ) WHERE rank <= 5
),
ann AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, c.vec_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY round({_cos_sql('c.v', 'q.qvec')}, 6) DESC,
                                       c.vec_id ASC) AS rank
    FROM c JOIN q ON c.bucket = q.bucket
  ) WHERE rank <= 5
)
SELECT e.query_id,
       CAST(COUNT(a.vec_id) AS INT) AS n_matched,
       round(COUNT(a.vec_id) / 5.0, 6) AS recall_at_5
FROM exact e
LEFT JOIN ann a ON a.query_id = e.query_id AND a.vec_id = e.vec_id
GROUP BY e.query_id
"""


@register(
    "ann_recall_eval",
    oracle=_RECALL_SQL,
    description="recall@5 of LSH ANN vs exact top-5 per query (index-quality eval, evaluate.py:177-229 shape)",
    retired=True,  # r8 swap: composite of three still-gated queries (ann_lsh_topk + knn_cosine_topk + recall_at_k's ratio arithmetic)
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_graph_rag_spark.queries.vector import ann_lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    c = emb.select("vec_id", F.col("embedding").alias("v")).withColumn(
        "bucket", _bucket_col(F.col("v"))
    )
    q = c.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qvec")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    exact = (
        c.crossJoin(F.broadcast(q))
        .withColumn("score", F.round(cosine("v", "qvec"), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "vec_id")
    )
    ann = ann_lsh_topk(spark, sf_dir).select("query_id", "vec_id", F.lit(1).alias("hit"))
    return (
        exact.join(ann, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce("hit", F.lit(0))).cast("int").alias("n_matched"),
            F.round(
                F.sum(F.coalesce("hit", F.lit(0))) / F.lit(5.0), 6
            ).alias("recall_at_5"),
        )
    )


# --- weighted-score fusion (Milvus WeightedRanker analogue, staged r12) -------

_W_VEC = 0.7
_W_LEX = 0.3

# Per-(query, modality) min-max normalization over each top-20 candidate
# list (a degenerate list where max == min normalizes to 1.0), weighted
# blend 0.7*vec + 0.3*lex with a missing modality contributing 0.  Both
# normalized scores and the blend are rounded to 6 decimals before ranking
# so the order is bit-identical across engines.
_WEIGHTED_SQL = f"""
WITH {bm25_scores_ctes(query_values_sql(_LEX_FIXTURE))},
lex_top AS (
  SELECT query_id, doc_id, score FROM (
    SELECT query_id, doc_id, score,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
    FROM scored
  ) WHERE rank <= 20
),
lex_n AS (
  SELECT query_id, doc_id,
         CASE WHEN mx = mn THEN 1.0 ELSE round((score - mn) / (mx - mn), 6) END AS ln
  FROM (
    SELECT *, MAX(score) OVER (PARTITION BY query_id) AS mx,
              MIN(score) OVER (PARTITION BY query_id) AS mn
    FROM lex_top
  )
),
qv(query_id, qvec_id) AS (VALUES {_QVEC_VALUES}),
c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT qv.query_id, c.v AS qvec FROM qv JOIN c ON c.vec_id = qv.qvec_id),
vec_top AS (
  SELECT query_id, doc_id, score FROM (
    SELECT q.query_id, c.vec_id AS doc_id,
           round({_cos_sql('c.v', 'q.qvec')}, 6) AS score,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY round({_cos_sql('c.v', 'q.qvec')}, 6) DESC,
                                       c.vec_id ASC) AS rank
    FROM c CROSS JOIN q
  ) WHERE rank <= 20
),
vec_n AS (
  SELECT query_id, doc_id,
         CASE WHEN mx = mn THEN 1.0 ELSE round((score - mn) / (mx - mn), 6) END AS vn
  FROM (
    SELECT *, MAX(score) OVER (PARTITION BY query_id) AS mx,
              MIN(score) OVER (PARTITION BY query_id) AS mn
    FROM vec_top
  )
),
blended AS (
  SELECT COALESCE(l.query_id, v.query_id) AS query_id,
         COALESCE(l.doc_id, v.doc_id) AS doc_id,
         round({_W_VEC} * COALESCE(v.vn, 0.0) + {_W_LEX} * COALESCE(l.ln, 0.0), 6) AS wscore,
         CAST((l.doc_id IS NOT NULL) AS INT) + CAST((v.doc_id IS NOT NULL) AS INT) AS n_lists
  FROM lex_n l FULL OUTER JOIN vec_n v
    ON v.query_id = l.query_id AND v.doc_id = l.doc_id
)
SELECT query_id, doc_id, wscore, CAST(n_lists AS INT) AS n_lists,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY wscore DESC, doc_id ASC) AS INT) AS rank
FROM blended
QUALIFY rank <= 10
"""


def _minmax_norm(df: DataFrame, out_col: str) -> DataFrame:
    """Per-query min-max normalization of ``score`` over a k-bounded
    candidate list (the window frame is the top-20 list, never the
    corpus); max == min normalizes to 1.0."""
    w = Window.partitionBy("query_id")
    mx, mn = F.max("score").over(w), F.min("score").over(w)
    return df.select(
        "query_id",
        "doc_id",
        F.when(mx == mn, F.lit(1.0))
        .otherwise(F.round((F.col("score") - mn) / (mx - mn), 6))
        .alias(out_col),
    )


@register(
    "hybrid_weighted_topk",
    oracle=_WEIGHTED_SQL,
    # ACTIVE since the r12 swap (staged retired=True through r11)
    description=(
        "hybrid retrieval: weighted-score fusion (Milvus WeightedRanker "
        "analogue, 0.7*vec + 0.3*lex) — per-modality min-max normalization "
        "over each top-20 list, missing modality contributes 0; the "
        "score-blend sibling of the rank-based hybrid_rrf_topk"
    ),
)
def hybrid_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same plan shape as hybrid_rrf_topk (broadcast fixture queries,
    per-query k-bounded windows); the only new seam is the FULL OUTER join
    of the two 20-row-per-query normalized lists — k-bounded on both
    sides, so every post-scoring operator touches at most 40 rows per
    query at any corpus size."""
    lex_top = _rank_topk(
        bm25_scores(spark, sf_dir, _LEX_FIXTURE), 20, "score", keep_score=True
    )
    lex_n = _minmax_norm(lex_top, "ln")

    emb = load_table(spark, sf_dir, "embeddings")
    c = emb.select("vec_id", F.col("embedding").alias("v"))
    qv = inline_rows(
        spark,
        [(qid, vid) for qid, _, vid in _HYBRID_QUERIES],
        "query_id string, qvec_id long",
    )
    q = F.broadcast(
        qv.join(c, c.vec_id == qv.qvec_id).select(
            "query_id", F.col("v").alias("qvec")
        )
    )
    vec_top = _rank_topk(
        c.crossJoin(q)
        .withColumn("score", F.round(cosine("v", "qvec"), 6))
        .select("query_id", F.col("vec_id").alias("doc_id"), "score"),
        20,
        "score",
        keep_score=True,
    )
    vec_n = _minmax_norm(vec_top, "vn")

    blended = (
        lex_n.join(vec_n, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.lit(_W_VEC) * F.coalesce("vn", F.lit(0.0))
                + F.lit(_W_LEX) * F.coalesce("ln", F.lit(0.0)),
                6,
            ).alias("wscore"),
            (
                F.col("ln").isNotNull().cast("int")
                + F.col("vn").isNotNull().cast("int")
            ).alias("n_lists"),
        )
    )
    w_final = Window.partitionBy("query_id").orderBy(
        F.desc("wscore"), F.asc("doc_id")
    )
    return (
        blended.withColumn("rank", F.row_number().over(w_final).cast("int"))
        .filter(F.col("rank") <= 10)
        .select("query_id", "doc_id", "wscore", "n_lists", "rank")
    )
