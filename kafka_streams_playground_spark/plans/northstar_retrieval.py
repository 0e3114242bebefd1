"""Hybrid retrieval operators (north star, round 7): reciprocal-rank fusion
of the lexical (BM25) and semantic (dense cosine) retrieval legs, and
label-aware hard-negative mining for contrastive training data.

These are the ops a retrieval/training pipeline runs on top of the index
artifacts the scoring/similarity families already build: fusion is how every
production hybrid search combines its two rankings (Cormack et al. 2009,
reciprocal rank fusion), and hard-negative mining is how embedding models
get their contrastive batches (closest vectors with a DIFFERENT label).

Cross-engine conventions follow plans/registry.py: identical aliases, ranks
fused on an exact integer grid (floor(1e6/(k+rank)) — integer division, no
float fold), cosines rounded to 6 before any ordering so rank boundaries are
deterministic, absent ranks carried as 0 (not NULL) to dodge nullable-int
pandas coercion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_playground_spark.plans import northstar_scoring  # noqa: F401  (registers text_bm25_topk before _rrf_oracle() reads it)
from kafka_streams_playground_spark.plans.northstar_similarity import (
    _dot_udf,
    _vectors,
)
from kafka_streams_playground_spark.plans.registry import REGISTRY, query
from kafka_streams_playground_spark.sources.parquet import load_table

# RRF (Cormack/Clarke/Buettcher 2009): score(d) = Σ_systems 1/(K + rank_d).
# K=60 is the paper's constant. Contributions ride as floor(1e6/(K+rank)) —
# exact integers, so the fusion fold is order-free and cross-engine exact.
RRF_K = 60
RRF_TOP = 20
SEM_QUERY_ID = 0  # vec_id 0 plays the dense query vector
SEM_N = 20  # semantic candidate-list depth (= BM25_TOP_K, the lexical depth)

HN_TOP_K = 10
HN_QUERIES = 5  # vec_id < 5 play the query set (sim_topk_bruteforce's set)


def _rrf_oracle() -> str:
    lex_sql = REGISTRY["text_bm25_topk"].oracle  # reuse the EXACT lexical leg
    return f"""
    WITH lex0 AS ({lex_sql}),
    lex AS (
      SELECT doc_id, row_number() OVER (ORDER BY score6 DESC, doc_id) AS lex_rank
      FROM lex0
    ),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    q AS (SELECT v AS qv, nrm AS qn FROM n WHERE vec_id = {SEM_QUERY_ID}),
    sc AS (
      SELECT c.vec_id AS doc_id,
             ROUND(list_dot_product(q.qv, c.v) / (q.qn * c.nrm), 6) AS cosine
      FROM n c, q WHERE c.vec_id <> {SEM_QUERY_ID}
    ),
    sem0 AS (SELECT * FROM sc ORDER BY cosine DESC, doc_id LIMIT {SEM_N}),
    sem AS (
      SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id) AS sem_rank
      FROM sem0
    ),
    fused AS (
      SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
             COALESCE(l.lex_rank, 0) AS lex_rank,
             COALESCE(s.sem_rank, 0) AS sem_rank
      FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
    )
    SELECT doc_id, lex_rank, sem_rank,
           CAST(CASE WHEN lex_rank > 0 THEN 1000000 // ({RRF_K} + lex_rank)
                     ELSE 0 END
              + CASE WHEN sem_rank > 0 THEN 1000000 // ({RRF_K} + sem_rank)
                     ELSE 0 END AS BIGINT) AS rrf6
    FROM fused
    ORDER BY rrf6 DESC, doc_id LIMIT {RRF_TOP}
    """


@query(
    "retrieval_rrf_fusion",
    oracle=_rrf_oracle(),
    tags=("northstar", "retrieval", "similarity", "bench"),
)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion: the BM25 lexical top-k
    (``text_bm25_topk`` — reused verbatim, Spark fn AND oracle CTE) and the
    dense cosine top-k for a query embedding are fused by
    Σ 1/(60 + rank), the standard score-free combination that needs no
    calibration between the two systems' score scales. Absent ranks carry 0,
    contributions are exact floor(1e6/(60+rank)) integers, and the final
    order is (rrf6 desc, doc_id) — fully deterministic cross-engine.

    Spark shape: each leg ends in a TakeOrderedAndProject top-k (heap
    per partition, k-row merge — never a global sort of the corpus); the
    two k-row candidate lists are O(config), so the rank windows and the
    full-outer fusion join run on k+k rows regardless of corpus size. At
    100 TB the legs are index probes (inverted postings / IVF cells — both
    built elsewhere in this repo) and the fusion cost stays the k+k rows it
    is here; this is why RRF is THE hybrid combiner at scale."""
    lex0 = REGISTRY["text_bm25_topk"].fn(spark, sf_dir)  # top-k lexical leg
    w_lex = Window.orderBy(F.col("score6").desc(), F.col("doc_id").asc())
    lex = lex0.select("doc_id", "score6").withColumn(
        "lex_rank", F.row_number().over(w_lex)
    )  # window over BM25_TOP_K rows — O(config), post-limit

    n = _vectors(spark, sf_dir)
    qv = n.filter(F.col("vec_id") == SEM_QUERY_ID).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    sc = (
        n.filter(F.col("vec_id") != SEM_QUERY_ID)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(
                _dot_udf(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6
            ).alias("cosine"),
        )
    )
    sem0 = sc.orderBy(F.col("cosine").desc(), F.col("doc_id").asc()).limit(SEM_N)
    w_sem = Window.orderBy(F.col("cosine").desc(), F.col("doc_id").asc())
    sem = sem0.withColumn("sem_rank", F.row_number().over(w_sem))

    fused = (
        lex.select("doc_id", "lex_rank")
        .join(sem.select("doc_id", "sem_rank"), "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("lex_rank", F.lit(0)).alias("lex_rank"),
            F.coalesce("sem_rank", F.lit(0)).alias("sem_rank"),
        )
    )
    contrib = lambda c: F.when(  # noqa: E731
        F.col(c) > 0, F.floor(F.lit(1000000) / (F.lit(RRF_K) + F.col(c)))
    ).otherwise(F.lit(0))
    return (
        fused.select(
            "doc_id",
            "lex_rank",
            "sem_rank",
            (contrib("lex_rank") + contrib("sem_rank")).cast("bigint").alias("rrf6"),
        )
        .orderBy(F.col("rrf6").desc(), F.col("doc_id").asc())
        .limit(RRF_TOP)
    )


@query(
    "sim_hard_negative_mining",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS negative_id, c.label AS neg_label,
             ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
      FROM n q JOIN n c ON q.vec_id < {HN_QUERIES} AND c.label <> q.label
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, negative_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, negative_id, neg_label, cosine, rank
    FROM ranked WHERE rank <= {HN_TOP_K}
    """,
    tags=("northstar", "retrieval", "similarity", "training", "bench"),
)
def sim_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query vector,
    the top-k most-similar vectors whose LABEL DIFFERS — the negatives that
    sit closest to the decision boundary, which is what makes contrastive
    batches informative (random negatives are trivially separable). The
    label inequality also subsumes self-exclusion.

    Spark shape: identical to ``sim_topk_bruteforce`` — the Q-row query set
    broadcasts, candidates never shuffle (each partition scores its
    residents via the Arrow-batched dot UDF), the label predicate prunes
    pair rows before ranking, and the per-query rank window is partitioned
    by query_id. At 100 TB the candidate scan is replaced by an
    over-fetched ANN probe (IVF top-(k·labels) then filter — the standard
    filtered-search recipe); the mining logic downstream of the score
    column is unchanged."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    n = _vectors(spark, sf_dir).join(emb, "vec_id")
    q = n.filter(F.col("vec_id") < HN_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    c = n.select(
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("neg_label"),
        "v",
        "nrm",
    )
    scored = c.join(F.broadcast(q), F.col("neg_label") != F.col("q_label")).select(
        "query_id",
        "negative_id",
        "neg_label",
        F.round(
            _dot_udf(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("negative_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= HN_TOP_K)
        .select("query_id", "negative_id", "neg_label", "cosine", "rank")
    )
