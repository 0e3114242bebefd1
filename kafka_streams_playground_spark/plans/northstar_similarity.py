"""Similarity search over the ``embeddings`` table (north star).

Two paths, both registered with oracles:

* brute-force cosine top-k — the exact baseline; O(Q·N·d) with all math in
  Catalyst array expressions (zip_with/aggregate in double so the oracle's
  sequential fold agrees bit-for-bit);
* random-hyperplane LSH buckets + bucketed ANN top-k — the scale path:
  candidates share a 16-bit hyperplane sign bucket, so compare cost tracks
  bucket occupancy, not N. Hyperplane weights are integer-arithmetic
  pseudo-randoms (Knuth multiplicative hash), so both engines derive the
  exact same planes with no float or RNG portability hazards.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_playground_spark.plans.registry import query
from kafka_streams_playground_spark.sources.parquet import load_table

TOP_K = 10
N_QUERIES = 5  # vec_id < 5 play the query set
N_PLANES = 16
DIM = 64
KNUTH = 2654435761  # 2^32 / golden ratio; classic multiplicative hash


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _dot_fn(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched dot product with an explicit dimension-ordered
    sequential fold — bit-identical IEEE-754 to :func:`_dot` (Catalyst
    ``aggregate(zip_with(...))``) and to DuckDB's ``list_dot_product``.
    Catalyst higher-order functions are interpreted per element; on the
    N×C / N×Q pair-scoring hot paths this UDF replaces them with DIM
    vectorized numpy ops per batch."""
    import numpy as np

    if len(a) == 0:
        return pd.Series([], dtype="float64")
    av = np.stack(a.to_numpy())
    bv = np.stack(b.to_numpy())
    acc = np.zeros(len(a), dtype=np.float64)
    for d in range(av.shape[1]):
        acc = acc + av[:, d] * bv[:, d]
    return pd.Series(acc)


def _dot_udf(a: Column, b: Column) -> Column:
    """Lazy pandas_udf wrapper (type parse needs an active session)."""
    return F.pandas_udf(_dot_fn, "double")(a, b)


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return emb.select("vec_id", "v", F.sqrt(_dot(F.col("v"), F.col("v"))).alias("nrm"))


@query(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
      FROM n q JOIN n c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {TOP_K}
    """,
    tags=("northstar", "similarity", "bench"),
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: queries (vec_id < 5) × all candidates, ranked per
    query. Ranking orders by ROUNDED cosine with neighbor_id tiebreak in both
    engines, so rank boundaries are deterministic cross-engine. Scale shape:
    the query set broadcasts (Q ≪ N); candidates never shuffle — each
    partition scores its vectors and TakeOrdered merges k·Q rows."""
    n = _vectors(spark, sf_dir)
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    c = n.select(F.col("vec_id").alias("neighbor_id"), "v", "nrm")
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot_udf(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _plane_weight_sql(p: int, d: int) -> str:
    """Integer pseudo-random hyperplane weight, portable SQL: centered
    Knuth-hash of the (plane, dim) index."""
    return f"(({p * DIM + d} * {KNUTH}) % 2147483648 - 1073741824)"


def _plane_weight(p: int, d: int) -> float:
    """Python twin of :func:`_plane_weight_sql` — same integers, same sign."""
    return float((p * DIM + d) * KNUTH % 2147483648 - 1073741824)


def _bucket_fn(v: pd.Series) -> pd.Series:
    """16-bit sign bucket of v against the integer hyperplanes — Arrow-
    vectorized across rows, but the per-row accumulation is an explicit
    dimension-ordered sequential fold (``acc += v[d]·w[d]`` for d=0..63),
    bit-identical IEEE-754 to DuckDB's ``list_dot_product`` sequential fold
    and to the previous Catalyst ``aggregate(zip_with(...))`` form. The UDF
    replaces N_PLANES×DIM interpreted lambda evaluations per row (Catalyst
    higher-order array functions are not codegen'd) with 16×64 vectorized
    numpy ops per batch — ~20× faster at equal semantics."""
    import numpy as np

    if len(v) == 0:
        return pd.Series([], dtype="int64")
    arr = np.stack(v.to_numpy())  # rows × DIM, float64
    n = arr.shape[0]
    total = np.zeros(n, dtype=np.int64)
    for p in range(N_PLANES):
        acc = np.zeros(n, dtype=np.float64)
        for d in range(DIM):
            acc = acc + arr[:, d] * _plane_weight(p, d)
        total = total + np.where(acc >= 0, np.int64(2**p), np.int64(0))
    return pd.Series(total)


def _bucket_expr_spark() -> Column:
    """16-bit sign bucket of v against the integer hyperplanes (column v).
    The pandas_udf wrapper is built lazily — creating it parses the return
    type against the active SparkSession, which doesn't exist at module
    import time (the registry imports this module eagerly)."""
    return F.pandas_udf(_bucket_fn, "long")(F.col("v"))


def _bucket_sql_duck() -> str:
    terms = []
    for p in range(N_PLANES):
        weights = ", ".join(f"CAST({_plane_weight_sql(p, d)} AS DOUBLE)" for d in range(DIM))
        terms.append(
            f"(CASE WHEN list_dot_product(v, [{weights}]) >= 0 THEN {2**p} ELSE 0 END)"
        )
    return " + ".join(terms)


@query(
    "sim_lsh_bucket_stats",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, CAST({'{bucket}'} AS BIGINT) AS bucket FROM e)
    SELECT bucket, COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec_id
    FROM b GROUP BY bucket
    """.replace("{bucket}", _bucket_sql_duck()),
    tags=("northstar", "similarity"),
)
def sim_lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucketing: every vector lands in a 16-bit sign
    bucket; this query materializes bucket occupancy (the index build +
    health check of the ANN scale path). One narrow map + one groupBy on the
    bucket id — at 100 TB this is the partitioning key for the ANN index."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    b = emb.select("vec_id", _bucket_expr_spark().alias("bucket"))
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_vectors"), F.min("vec_id").alias("min_vec_id")
    )


@query(
    "sim_ann_lsh_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
                 CAST({'{bucket}'} AS BIGINT) AS bucket FROM e),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
      FROM n q JOIN n c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {TOP_K}
    """.replace("{bucket}", _bucket_sql_duck()),
    tags=("northstar", "similarity"),
)
def sim_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    then exact cosine rank within the bucket. The equi-join on ``bucket``
    replaces the brute-force cross join — at 100 TB this is a co-partitioned
    shuffle on bucket id (widen recall with multi-probe: also join the
    Hamming-1 neighbor buckets; single-probe here keeps the oracle simple)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # Persisted: the bucketed-vector index feeds BOTH join branches (query
    # side and candidate side); without it the full-corpus bucket UDF pass
    # runs twice per execution.
    n = emb.select(
        "vec_id", "v", F.sqrt(_dot(F.col("v"), F.col("v"))).alias("nrm"),
        _bucket_expr_spark().alias("bucket"),
    ).persist()
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("bucket").alias("qb"),
    )
    c = n.select(F.col("vec_id").alias("neighbor_id"), "v", "nrm", "bucket")
    scored = c.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qb")) & (F.col("neighbor_id") != F.col("query_id")),
    ).select(
        "query_id",
        "neighbor_id",
        F.round(_dot_udf(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# Fixed centroid count, INDEPENDENT of corpus size: the coarse quantizer's
# centroid table must stay O(K) so collecting it to the driver and closing
# over it in the assignment UDF is legitimate at any N (a real deployment
# learns K k-means centroids the same way — K is a config, not f(N)).
N_CENTROIDS = 64
IVF_NPROBE = 2  # multi-probe: each query also searches its runner-up cell

# Shared oracle CTEs: normalized vectors, fixed-K centroids, per-vector cell
# scores, argmax assignment, and the member index — identical text in both
# IVF oracles so the cells provably agree.
_IVF_INDEX_CTES = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    cents AS (
      SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n
      WHERE vec_id < {N_CENTROIDS}
    ),
    cscore AS (
      SELECT n.vec_id, cent_id,
             ROUND(list_dot_product(n.v, cv) / (n.nrm * cnrm), 6) AS cs
      FROM n CROSS JOIN cents
    ),
    assign AS (
      SELECT vec_id, cent_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY cs DESC, cent_id ASC) AS rn
        FROM cscore
      ) WHERE rn = 1
    ),
    members AS (
      SELECT a.vec_id, a.cent_id, n.v, n.nrm FROM assign a JOIN n USING (vec_id)
    )"""


def _ivf_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the IVF index: every vector assigned to its nearest fixed-K
    centroid cell, persisted (the index is built once and read by every
    probe branch). One ``mapInPandas`` pass over the corpus; the fixed-K
    centroid matrix is collected once (O(K·d)) and closed over — see
    :func:`sim_ivf_topk` for the full scale rationale."""
    import numpy as np

    n = _vectors(spark, sf_dir)
    cents = n.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    # Sorted by cent_id so np.argmax's first-max rule IS the (cs DESC,
    # cent_id ASC) tiebreak of the oracle's row_number.
    crows = sorted(cents.collect(), key=lambda r: r["cent_id"])
    cent_ids = np.array([r["cent_id"] for r in crows], dtype=np.int64)
    cm = np.stack([np.asarray(r["cv"], dtype=np.float64) for r in crows])
    cnrm = np.array([r["cnrm"] for r in crows], dtype=np.float64)

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            av = np.stack(pdf["v"].to_numpy())  # (b, d)
            acc = np.zeros((len(pdf), len(cent_ids)), dtype=np.float64)
            for d in range(av.shape[1]):  # dim-ordered fold = oracle's fold
                acc = acc + np.outer(av[:, d], cm[:, d])
            cs = acc / (pdf["nrm"].to_numpy()[:, None] * cnrm[None, :])
            # round-half-away-from-zero at 6 dp — DuckDB ROUND / Spark
            # F.round semantics (np.round would be half-even: a real,
            # assignment-flipping divergence on exact .5e-6 boundaries)
            cs = np.sign(cs) * np.floor(np.abs(cs) * 1e6 + 0.5) / 1e6
            best = np.argmax(cs, axis=1)  # first max ⇒ lowest cent_id wins ties
            out = pdf[["vec_id", "v", "nrm"]].copy()
            out["cent_id"] = cent_ids[best]
            yield out[["vec_id", "cent_id", "v", "nrm"]]

    return n.mapInPandas(
        assign, "vec_id long, cent_id long, v array<double>, nrm double"
    ).persist()


@query(
    "sim_ivf_topk",
    oracle=f"""{_IVF_INDEX_CTES},
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
      FROM members q JOIN members c
        ON q.cent_id = c.cent_id AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {TOP_K}
    """,
    tags=("northstar", "similarity", "ivf"),
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: a deterministic coarse quantizer (the K=64 lowest
    vec_ids stand in for learned centroids) assigns each vector to its
    nearest centroid cell; queries search only their own cell. The 100 TB
    shape of a vector index:

    * the centroid table is **fixed-K** (64 rows regardless of corpus size)
      → collecting it to the driver is O(K·d) bytes and the per-task closure
      is a 64×64 matrix; assignment is one map-side pass — O(N·K·d) flops,
      no N×N and no N-proportional driver state anywhere;
    * the cell search is an equi-join on cent_id — co-partitioned shuffle,
      candidates ∝ cell occupancy (multi-probe = also join runner-up cells
      for recall; single-probe keeps the oracle compact).

    Real IVF learns K k-means centroids (K a config like 2^16, never f(N));
    the deterministic vec_id<K rule stands in so both engines derive
    identical cells (no RNG portability hazard), with the same O(K) contract.

    Assignment is a single ``mapInPandas`` pass: the fixed-K centroid matrix
    is collected once and closed over, so no N×K row-set is ever
    materialized, no Arrow transfer of N×K vector pairs, and no 1M-row
    ``row_number`` shuffle — each batch scores all centroids with
    dim-ordered numpy folds (bit-identical to the oracle's
    ``list_dot_product`` sequential fold) and emits its argmax row. The old
    crossJoin+window form spent ~2× this plan's wall time at sf0.1.
    """
    # Persisted index: the cell assignment is built once and read by both
    # the query-side and candidate-side branches of the probe join.
    members = _ivf_members(spark, sf_dir)
    q = members.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("cent_id").alias("qcent"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    scored = members.join(
        F.broadcast(q),
        (F.col("cent_id") == F.col("qcent")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(_dot_udf(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


@query(
    "sim_ann_multiprobe_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
                 CAST({'{bucket}'} AS BIGINT) AS bucket FROM e),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
      FROM n q JOIN n c
        ON bit_count(xor(q.bucket, c.bucket)) <= 1 AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {TOP_K}
    """.replace("{bucket}", _bucket_sql_duck()),
    tags=("northstar", "similarity", "multiprobe"),
)
def sim_ann_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: each query searches its own bucket plus all 16
    Hamming-1 neighbor buckets — the standard recall lever for sign-bucket
    LSH (a vector near a hyperplane falls on the wrong side of exactly that
    bit). Spark shape: the query side explodes its 17 probe bucket ids and
    equi-joins members on the bucket — still a co-partitioned hash join
    (probes × Q rows, tiny), never a Hamming-distance theta join; the
    oracle states the same set declaratively via bit_count(xor) <= 1."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # Persisted: the bucketed-vector index feeds BOTH join branches (query
    # side and candidate side); without it the full-corpus bucket UDF pass
    # runs twice per execution.
    n = emb.select(
        "vec_id", "v", F.sqrt(_dot(F.col("v"), F.col("v"))).alias("nrm"),
        _bucket_expr_spark().alias("bucket"),
    ).persist()
    probes = F.array(
        F.col("qb"), *[F.col("qb").bitwiseXOR(F.lit(1 << p)) for p in range(N_PLANES)]
    )
    q = (
        n.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            F.col("bucket").alias("qb"),
        )
        .select("query_id", "qv", "qn", F.explode(probes).alias("probe"))
    )
    c = n.select(F.col("vec_id").alias("neighbor_id"), "v", "nrm", "bucket")
    scored = c.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("probe")) & (F.col("neighbor_id") != F.col("query_id")),
    ).select(
        "query_id",
        "neighbor_id",
        F.round(_dot_udf(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


@query(
    "sim_ivf_multiprobe_topk",
    oracle=f"""{_IVF_INDEX_CTES},
    qprobe AS (
      SELECT query_id, cent_id, qv, qn FROM (
        SELECT c.vec_id AS query_id, c.cent_id, n.v AS qv, n.nrm AS qn,
               row_number() OVER (
                 PARTITION BY c.vec_id ORDER BY c.cs DESC, c.cent_id ASC) AS rn
        FROM cscore c JOIN n ON c.vec_id = n.vec_id
        WHERE c.vec_id < {N_QUERIES}
      ) WHERE rn <= {IVF_NPROBE}
    ),
    scored AS (
      SELECT p.query_id, m.vec_id AS neighbor_id,
             ROUND(list_dot_product(p.qv, m.v) / (p.qn * m.nrm), 6) AS cosine
      FROM qprobe p JOIN members m
        ON p.cent_id = m.cent_id AND m.vec_id <> p.query_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {TOP_K}
    """,
    tags=("northstar", "similarity", "ivf", "multiprobe"),
)
def sim_ivf_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with nprobe=2 — the IVF recall lever (mirror of the LSH
    multi-probe): each query searches its nearest AND runner-up centroid
    cells, catching true neighbors that the quantizer assigned across the
    cell boundary. The standard accuracy/cost dial of every production IVF
    index (FAISS nprobe): candidates ≈ nprobe × average cell occupancy.

    Spark shape: the probe list is built from the tiny queries × fixed-K
    centroids cross score (Q·K rows, Catalyst-side) ranked per query; the
    cell search stays one equi-join of the probe list (broadcast) against
    the persisted member index on cent_id — identical join shape to
    single-probe, just Q·nprobe probe rows instead of Q. No candidate is
    double-counted: members belong to exactly one cell."""
    members = _ivf_members(spark, sf_dir)
    n = _vectors(spark, sf_dir)
    cents = n.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    qv = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cscore = qv.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "cent_id",
        "qv",
        "qn",
        F.round(_dot_udf(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cnrm")), 6).alias("cs"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("cs").desc(), F.col("cent_id").asc())
    probes = (
        cscore.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= IVF_NPROBE)
        .select("query_id", F.col("cent_id").alias("probe_cent"), "qv", "qn")
    )
    scored = members.join(
        F.broadcast(probes),
        (F.col("cent_id") == F.col("probe_cent")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(_dot_udf(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


KNN_K = 10


@query(
    "knn_label_vote",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    n AS (SELECT vec_id, v, label, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label,
             ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
      FROM n q JOIN n c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored
    ),
    votes AS (
      SELECT query_id, label, COUNT(*) AS votes
      FROM ranked WHERE rank <= {KNN_K}
      GROUP BY query_id, label
    )
    SELECT query_id, label AS predicted_label, votes FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY votes DESC, label ASC) AS vr
      FROM votes
    ) WHERE vr = 1
    """,
    tags=("northstar", "similarity", "classify", "bench"),
)
def knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KNN majority-vote classification over the embedding corpus: each
    query vector takes the modal label of its {KNN_K = 10} exact cosine
    neighbors — the embedding-space form of the quality/domain classifier
    pass (fastText-style labelers, seed-set expansion, weak labeling for
    curation) a data pipeline runs against a small labeled seed set.

    Spark shape: reuses the brute-force scoring recipe
    (``sim_topk_bruteforce``): broadcast query set, per-partition scoring
    with the Arrow dot-product fold, per-query rank window, then a
    votes-per-label rollup and a deterministic argmax (votes desc, label
    asc — both engines break ties identically). At 100 TB the exact scan
    swaps for the IVF probe (``sim_ivf_topk``) with the identical
    vote/argmax tail — the classifier head is index-agnostic."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        "label",
    )
    n = emb.select(
        "vec_id", "v", "label", F.sqrt(_dot(F.col("v"), F.col("v"))).alias("nrm")
    )
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    c = n.select(F.col("vec_id").alias("neighbor_id"), "v", "nrm", "label")
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        "label",
        F.round(
            _dot_udf(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    topk = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= KNN_K
    )
    votes = topk.groupBy("query_id", "label").agg(F.count(F.lit(1)).alias("votes"))
    wv = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("label").asc()
    )
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select("query_id", F.col("label").alias("predicted_label"), "votes")
    )


@query(
    "embedding_norm_stats",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    n AS (
      SELECT label,
             CAST(FLOOR(sqrt(list_dot_product(v, v)) * 1000000 + 0.5) AS BIGINT)
                 AS nrm6
      FROM e
    )
    SELECT label,
           COUNT(*) AS n_vecs,
           MIN(nrm6) AS min_norm6,
           MAX(nrm6) AS max_norm6,
           FLOOR(CAST(SUM(nrm6) AS BIGINT) * 1.0 / COUNT(*) / 100 + 0.5) / 10000
               AS avg_norm
    FROM n GROUP BY label
    """,
    tags=("northstar", "similarity", "embedding", "quality"),
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-corpus sanity report: per-label L2-norm distribution
    (count, min/max, mean) — the first diagnostic a pipeline runs on a new
    embedding drop. Collapsed or exploded norms flag encoder bugs and
    un-normalized batches BEFORE any ANN index or SemDeDup pass consumes
    them; per-label grouping localizes the damage to a shard or class.

    Spark shape: one narrow map-side pass computes each vector's norm with
    the Arrow dim-ordered fold (bit-identical to ``list_dot_product``),
    quantized to a 1e-6-grid integer so min/max/mean are exact cross-engine
    folds; one shuffle to |labels| rows with map-side partials. O(N·d)
    total, embarrassingly parallel — the cheapest query in the similarity
    family at any scale."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v"), "label"
    )
    nrm6 = F.floor(
        F.sqrt(_dot_udf(F.col("v"), F.col("v"))) * 1000000 + F.lit(0.5)
    ).cast("bigint")
    n = emb.select("label", nrm6.alias("nrm6"))
    return n.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.min("nrm6").alias("min_norm6"),
        F.max("nrm6").alias("max_norm6"),
        (
            F.floor(F.sum("nrm6") / F.count(F.lit(1)) / 100 + F.lit(0.5)) / 10000
        ).alias("avg_norm"),
    )


KMEANS_K = 8
KMEANS_ITERS = 2
_KM_DIST = "list_sum(list_transform(list_zip(e.x6, c.c6), s -> (s[1]-s[2])*(s[1]-s[2])))"


def _kmeans_state(spark: SparkSession, sf_dir: str, iters: int = KMEANS_ITERS):
    """Lloyd's k-means on the 1e-6 integer grid: returns (last assignment
    DataFrame (vec_id, cent_id, dist), last centroid-update DataFrame
    (cent_id, dim, c)) after ``iters`` assignment rounds. Shared by the
    registered query and the inertia-monotonicity unit test."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1000000 + F.lit(0.5)).cast("long"),
        ).alias("x6"),
    )
    e = emb.persist()
    # Deterministic init: the first K vec_ids (no RNG portability hazard).
    cents = sorted(
        (r["vec_id"], np.array(r["x6"], dtype=np.int64))
        for r in e.filter(F.col("vec_id") < KMEANS_K).collect()
    )

    def _assign_fn(cent_rows):
        cids = np.array([c[0] for c in cent_rows], dtype=np.int64)
        C = np.stack([c[1] for c in cent_rows])  # (K, d) int64

        def fn(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(pdf["x6"].to_numpy()).astype(np.int64)  # (n, d)
                # exact integer squared distances: (n, K)
                d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                j = d2.argmin(axis=1)  # first min → smallest cent_id (cids sorted)
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].values,
                        "cent_id": cids[j],
                        "dist": d2[np.arange(len(j)), j],
                    }
                )

        return fn

    assign = upd = None
    for it in range(iters):
        if it > 0:
            # O(K·d) centroid rows to the driver per iteration — the MLlib
            # k-means stance (centroids live on the driver between rounds).
            rows = upd.groupBy("cent_id").agg(
                F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("cs")
            ).collect()
            cents = sorted(
                (r["cent_id"], np.array([s["c"] for s in r["cs"]], dtype=np.int64))
                for r in rows
            )
        assign = e.mapInPandas(
            _assign_fn(cents), "vec_id bigint, cent_id bigint, dist bigint"
        )
        m = assign.join(e, "vec_id").select(
            "cent_id", F.posexplode("x6").alias("dim0", "x")
        )
        upd = m.groupBy("cent_id", (F.col("dim0") + 1).alias("dim")).agg(
            F.floor(F.sum("x") * 1.0 / F.count(F.lit(1))).cast("long").alias("c")
        )
    return assign, upd


@query(
    "kmeans_ivf_train",
    oracle=f"""
    WITH e AS (
      SELECT vec_id,
             [CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT)
              for x in embedding::DOUBLE[]] AS x6
      FROM embeddings
    ),
    c0 AS (SELECT vec_id AS cent_id, x6 AS c6 FROM e WHERE vec_id < {KMEANS_K}),
    d1 AS (
      SELECT e.vec_id, c.cent_id, {_KM_DIST} AS dist
      FROM e CROSS JOIN c0 c
    ),
    a1 AS (
      SELECT vec_id, cent_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY dist ASC, cent_id ASC) AS rn
        FROM d1
      ) WHERE rn = 1
    ),
    m1 AS (
      SELECT a1.cent_id, generate_subscripts(e.x6, 1) AS dim, unnest(e.x6) AS x
      FROM a1 JOIN e USING (vec_id)
    ),
    c1 AS (
      SELECT cent_id, list(m ORDER BY dim) AS c6 FROM (
        SELECT cent_id, dim, CAST(FLOOR(SUM(x) * 1.0 / COUNT(*)) AS BIGINT) AS m
        FROM m1 GROUP BY cent_id, dim
      ) GROUP BY cent_id
    ),
    d2 AS (
      SELECT e.vec_id, c.cent_id, {_KM_DIST} AS dist
      FROM e CROSS JOIN c1 c
    ),
    a2 AS (
      SELECT vec_id, cent_id, dist FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY dist ASC, cent_id ASC) AS rn
        FROM d2
      ) WHERE rn = 1
    ),
    m2 AS (
      SELECT a2.cent_id, generate_subscripts(e.x6, 1) AS dim, unnest(e.x6) AS x
      FROM a2 JOIN e USING (vec_id)
    ),
    c2 AS (
      SELECT cent_id, dim, CAST(FLOOR(SUM(x) * 1.0 / COUNT(*)) AS BIGINT) AS m
      FROM m2 GROUP BY cent_id, dim
    ),
    chk AS (
      SELECT cent_id, CAST(SUM(m * (dim % 7 + 1)) AS BIGINT) AS centroid_checksum
      FROM c2 GROUP BY cent_id
    )
    SELECT a.cent_id AS cluster,
           COUNT(*) AS n_members,
           CAST(SUM(a.dist) AS BIGINT) AS inertia,
           ANY_VALUE(chk.centroid_checksum) AS centroid_checksum
    FROM a2 a JOIN chk USING (cent_id)
    GROUP BY a.cent_id
    """,
    tags=("northstar", "similarity", "embedding", "iterative", "bench"),
)
def kmeans_ivf_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-means training for the IVF coarse quantizer — TWO
    Lloyd iterations (assign → update → assign → update) over the embedding
    corpus with K = 8 centroids. This closes the IVF loop: ``sim_ivf_topk``
    documents that "real deployments learn the K centroids with k-means";
    this operator IS that training run, made bit-exact cross-engine by
    working on the 1e-6 integer grid — squared distances, argmins, and
    floor-mean centroid updates are all exact int64 arithmetic, so both
    engines take the identical Lloyd trajectory (no RNG, no float-sum
    order hazard anywhere). Output: per final cluster, member count,
    inertia contribution (the convergence certificate — unit-pinned
    monotone non-increasing across iterations), and a dim-weighted
    centroid checksum (the embedding_quantize_int8 recipe — makes the
    K×d centroid table oracle-comparable without array columns).

    Spark shape, per iteration: ONE ``mapInPandas`` assignment pass with
    the K×d integer centroid matrix closed over (vectorized numpy
    distances; first-argmin = smallest cent_id, matching the oracle's
    rank tiebreak) — the same fixed-K broadcast-assignment recipe as
    ``_ivf_members`` — then a posexplode + (cent, dim)-keyed update with
    map-side partials. Centroids round-trip the driver between iterations
    at O(K·d) — the Spark-MLlib k-means stance, a config-sized payload
    like the bloom words and IVF centroid collects named in SCALE.md §12.
    Iteration count is FIXED (the unrolled-oracle contract), which is how
    production IVF training runs anyway (a fixed small iteration budget,
    not convergence-to-epsilon)."""
    assign, upd = _kmeans_state(spark, sf_dir, KMEANS_ITERS)
    chk = upd.groupBy("cent_id").agg(
        F.sum(F.col("c") * (F.col("dim") % 7 + 1)).alias("centroid_checksum")
    )
    roll = assign.groupBy("cent_id").agg(
        F.count(F.lit(1)).alias("n_members"), F.sum("dist").alias("inertia")
    )
    return roll.join(F.broadcast(chk), "cent_id").select(
        F.col("cent_id").alias("cluster"), "n_members", "inertia", "centroid_checksum"
    )


@query(
    "sim_ivf_recall_audit",
    oracle=f"""{_IVF_INDEX_CTES},
    b_scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
      FROM n q JOIN n c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    ),
    bt AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM b_scored
      ) WHERE rank <= {TOP_K}
    ),
    i_scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
      FROM members q JOIN members c
        ON q.cent_id = c.cent_id AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ),
    it AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM i_scored
      ) WHERE rank <= {TOP_K}
    )
    SELECT bt.query_id,
           COUNT(it.neighbor_id) AS n_hits,
           COUNT(it.neighbor_id) * 1000000 // {TOP_K} AS recall_ppm
    FROM bt LEFT JOIN it USING (query_id, neighbor_id)
    GROUP BY bt.query_id
    """,
    tags=("northstar", "similarity", "ivf", "bench"),
)
def sim_ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k audit of the IVF index against exact brute force — the
    measurement a production ANN deployment runs before picking
    nprobe/K: per query, how many of the true top-k the single-probe cell
    search actually returned (exact-ppm integer grid). This is the closed
    feedback loop over the index the engine itself built — same persisted
    cells, same rounded-cosine rank rule on both sides, so the audit
    measures INDEX recall, not float noise.

    Spark shape: composes the two existing plans verbatim (broadcast query
    sets, persisted member index, heap top-k) plus one co-shuffled left
    join on (query, neighbor) and a |Q|-row aggregate — audit cost is the
    cost of running both searches, nothing more. At 100 TB the brute-force
    side runs over a SAMPLED query panel (Q is a config, not f(N)) —
    exactly how recall dashboards are produced for production indexes."""
    bt = sim_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    it = sim_ivf_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        bt.join(it, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.count("hit").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            F.expr(f"n_hits * 1000000 div {TOP_K}").alias("recall_ppm"),
        )
    )


@query(
    "embedding_dim_stats",
    oracle="""
    WITH x AS (
      SELECT unnest(range(len(embedding))) AS dim,
             CAST(FLOOR(unnest(embedding::DOUBLE[]) * 1000000 + 0.5) AS BIGINT)
                 AS xi
      FROM embeddings
    ),
    a AS (
      SELECT dim, COUNT(*) AS n,
             CAST(SUM(xi) AS BIGINT) AS sx,
             CAST(SUM(xi * xi) AS BIGINT) AS sxx,
             MIN(xi) AS min_e6, MAX(xi) AS max_e6
      FROM x GROUP BY dim
    )
    SELECT dim, n, min_e6, max_e6,
           sx // n AS mean_e6,
           (sxx * n - sx * sx) // (n * n) AS var_e12
    FROM a
    """,
    tags=("northstar", "similarity", "embedding", "quality", "bench"),
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DIMENSION embedding health: mean, variance, and range of every
    coordinate across the corpus — the complement of the per-label norm
    report (``embedding_norm_stats``). A dead dimension (zero variance), a
    saturated one (range pinned), or a mean far off center flags encoder
    truncation/normalization bugs before any index consumes the drop, and
    feeds the min-max tables INT8 calibration uses.

    Exactness: coordinates quantize to a 1e-6 integer grid map-side; the
    moment sums and the variance identity n·Σx² − (Σx)² then run in pure
    BIGINT with floor division — order-free, bit-equal across engines.
    Spark shape: one ``posexplode`` projection (rows = N·d but only two
    BIGINTs wide) into a d-row aggregate with map-side partials — one tiny
    shuffle, embarrassingly parallel. At 10^10+ vectors the xi² sums
    approach BIGINT range; production widens the moments to DECIMAL(38,0)
    (Spark and DuckDB both support it) — same plan, wider lanes."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "xv"
        )
    )
    x = emb.select(
        "dim", F.floor(F.col("xv") * 1000000 + F.lit(0.5)).cast("bigint").alias("xi")
    )
    a = x.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xi").alias("sx"),
        F.sum(F.col("xi") * F.col("xi")).alias("sxx"),
        F.min("xi").alias("min_e6"),
        F.max("xi").alias("max_e6"),
    )
    return a.select(
        "dim",
        "n",
        "min_e6",
        "max_e6",
        F.expr("sx div n").alias("mean_e6"),
        F.expr("(sxx * n - sx * sx) div (n * n)").alias("var_e12"),
    )


# Product quantization: split each embedding into PQ_M contiguous subspaces
# and code each subvector against a PQ_K-entry codebook — the compression
# that makes billion-vector ANN serving fit in RAM (Jégou et al. 2011,
# "Product Quantization for Nearest Neighbor Search": 64 floats → 4 bytes
# here). Codebooks are the deterministic seed scheme of kmeans_ivf_train
# (subvectors of the first PQ_K vec_ids — no RNG portability hazard);
# production refinement runs that operator's Lloyd loop per subspace.
PQ_M = 4
PQ_K = 16
_PQ_SUBDIM = 64 // PQ_M


def _pq_dist_sql(m: int) -> str:
    lo, hi = m * _PQ_SUBDIM + 1, (m + 1) * _PQ_SUBDIM
    return (
        f"list_sum(list_transform(list_zip(e.x6[{lo}:{hi}], cb.x6[{lo}:{hi}]), "
        "s -> (s[1]-s[2])*(s[1]-s[2])))"
    )


def _pq_assign_ctes() -> str:
    """CTE prefix shared by the PQ-coding oracle and the ADC recall audit:
    grid embeddings (e), seed codebook (cb), per-subspace assignments
    (a0..a{M-1})."""
    assigns = ",\n".join(
        f"""a{m} AS (
      SELECT vec_id, code_id, d FROM (
        SELECT e.vec_id, cb.code_id, {_pq_dist_sql(m)} AS d,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_pq_dist_sql(m)} ASC, cb.code_id ASC) AS rn
        FROM e CROSS JOIN cb
      ) WHERE rn = 1
    )"""
        for m in range(PQ_M)
    )
    return f"""e AS (
      SELECT vec_id,
             [CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT)
              for x in embedding::DOUBLE[]] AS x6
      FROM embeddings
    ),
    cb AS (SELECT vec_id AS code_id, x6 FROM e WHERE vec_id < {PQ_K}),
    {assigns}"""


def _pq_oracle() -> str:
    return f"""
    WITH {_pq_assign_ctes()}
    SELECT a0.vec_id,
           a0.code_id AS code_0, a1.code_id AS code_1,
           a2.code_id AS code_2, a3.code_id AS code_3,
           CAST(a0.d + a1.d + a2.d + a3.d AS BIGINT) AS recon_d2
    FROM a0 JOIN a1 USING (vec_id) JOIN a2 USING (vec_id) JOIN a3 USING (vec_id)
    """


def _pq_grid_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings on the exact 1e-6 integer grid (vec_id, x6)."""
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1000000 + F.lit(0.5)).cast("long"),
        ).alias("x6"),
    )


def _pq_codebook(emb: DataFrame):
    """Seed codebook as a (K, M, subdim) int64 array — O(M·K·subdim) ≈ 4 KiB
    of driver state (one of SCALE.md §12's bounded collects)."""
    import numpy as np

    seed_rows = sorted(
        (r["vec_id"], np.array(r["x6"], dtype=np.int64))
        for r in emb.filter(F.col("vec_id") < PQ_K).collect()
    )
    return np.stack([v for _, v in seed_rows]).reshape(PQ_K, PQ_M, _PQ_SUBDIM)


def _pq_codes(emb: DataFrame, CB) -> DataFrame:
    """One vectorized mapInPandas coding pass: (vec_id, code_0..3, recon_d2)."""
    import numpy as np
    import pandas as pd

    def _code(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["x6"].to_numpy()).astype(np.int64)
            Xs = X.reshape(len(X), PQ_M, _PQ_SUBDIM)
            # (n, M, K) exact integer squared distances per subspace
            d2 = ((Xs[:, :, None, :] - CB.transpose(1, 0, 2)[None, :, :, :]) ** 2).sum(
                axis=3
            )
            codes = d2.argmin(axis=2)  # first min → smallest code id
            err = d2[
                np.arange(len(X))[:, None], np.arange(PQ_M)[None, :], codes
            ].sum(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].values,
                    "code_0": codes[:, 0],
                    "code_1": codes[:, 1],
                    "code_2": codes[:, 2],
                    "code_3": codes[:, 3],
                    "recon_d2": err,
                }
            )

    return emb.mapInPandas(
        _code,
        "vec_id bigint, code_0 bigint, code_1 bigint, code_2 bigint, "
        "code_3 bigint, recon_d2 bigint",
    )


@query(
    "embedding_pq_codes",
    oracle=_pq_oracle(),
    tags=("northstar", "similarity", "embedding", "quantization", "bench"),
)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization coding: every embedding splits into PQ_M(=4)
    16-dim subvectors, each coded as its nearest of PQ_K(=16) codebook
    entries, plus the exact reconstruction error — the vector-compression
    pass (Jégou et al. 2011) an ANN deployment runs over the full corpus
    before serving (IVF-PQ = ``sim_ivf_topk``'s cells + THIS coding inside
    them). All arithmetic on the 1e-6 integer grid: squared distances,
    argmins (first-min = smallest code id, matching the oracle's rank
    tiebreak), and the error sum are exact int64 — bit-equal across
    engines and partition counts.

    Spark shape: codebooks are O(M·K·subdim) = 4 KiB of driver state
    (seed-scheme collect, the same config-sized bound as the IVF/k-means
    centroid collects named in SCALE.md §12), closed over ONE vectorized
    ``mapInPandas`` pass — per Arrow batch, a (n, M, K) numpy distance
    tensor, argmin per subspace, zero shuffle (output inherits the scan's
    partitioning). At 100 TB this is the ideal coding pass: scan-bound,
    embarrassingly parallel, 32× output compression; codebook training
    refinement is kmeans_ivf_train's Lloyd loop per subspace."""
    emb = _pq_grid_emb(spark, sf_dir)
    return _pq_codes(emb, _pq_codebook(emb))


PQ_NQ = 10  # audit query count (first N vec_ids, the recall-audit stance)
PQ_TOP_K = 5


def _pq_lut_dist_sql(m: int) -> str:
    lo, hi = m * _PQ_SUBDIM + 1, (m + 1) * _PQ_SUBDIM
    return (
        f"list_sum(list_transform(list_zip(q.x6[{lo}:{hi}], cb.x6[{lo}:{hi}]), "
        "s -> (s[1]-s[2])*(s[1]-s[2])))"
    )


def _pq_adc_oracle() -> str:
    luts = ",\n".join(
        f"""lut{m} AS (
      SELECT q.qid, cb.code_id, {_pq_lut_dist_sql(m)} AS d
      FROM q CROSS JOIN cb
    )"""
        for m in range(PQ_M)
    )
    return f"""
    WITH {_pq_assign_ctes()},
    q AS (SELECT vec_id AS qid, x6 FROM e WHERE vec_id < {PQ_NQ}),
    {luts},
    codes AS (
      SELECT a0.vec_id, a0.code_id AS c0, a1.code_id AS c1,
             a2.code_id AS c2, a3.code_id AS c3
      FROM a0 JOIN a1 USING (vec_id) JOIN a2 USING (vec_id) JOIN a3 USING (vec_id)
    ),
    adc AS (
      SELECT l0.qid, c.vec_id,
             CAST(l0.d + l1.d + l2.d + l3.d AS BIGINT) AS d2
      FROM codes c
      JOIN lut0 l0 ON l0.code_id = c.c0
      JOIN lut1 l1 ON l1.qid = l0.qid AND l1.code_id = c.c1
      JOIN lut2 l2 ON l2.qid = l0.qid AND l2.code_id = c.c2
      JOIN lut3 l3 ON l3.qid = l0.qid AND l3.code_id = c.c3
      WHERE c.vec_id <> l0.qid
    ),
    at AS (
      SELECT qid, vec_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY qid ORDER BY d2 ASC, vec_id ASC) AS rk FROM adc
      ) WHERE rk <= {PQ_TOP_K}
    ),
    ex AS (
      SELECT q.qid, e.vec_id,
             list_sum(list_transform(list_zip(q.x6, e.x6),
                                     s -> (s[1]-s[2])*(s[1]-s[2]))) AS d2
      FROM q JOIN e ON e.vec_id <> q.qid
    ),
    et AS (
      SELECT qid, vec_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY qid ORDER BY d2 ASC, vec_id ASC) AS rk FROM ex
      ) WHERE rk <= {PQ_TOP_K}
    )
    SELECT et.qid AS query_id,
           COUNT(at.vec_id) AS n_hits,
           CAST(COUNT(at.vec_id) * 1000000 // {PQ_TOP_K} AS BIGINT) AS recall_ppm
    FROM et LEFT JOIN at USING (qid, vec_id)
    GROUP BY et.qid
    """


@query(
    "sim_pq_adc_recall_audit",
    oracle=_pq_adc_oracle(),
    tags=("northstar", "similarity", "quantization", "eval", "bench"),
)
def sim_pq_adc_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k audit of PQ asymmetric-distance search against exact L2 —
    the measurement that decides PQ_M/PQ_K before a compressed index
    ships (the quantized sibling of ``sim_ivf_recall_audit``). ADC is the
    real serving math (Jégou et al. 2011): per query, a (M × K) lookup
    table of exact subvector distances to every codeword; a corpus
    vector's distance is then M table lookups summed — the corpus's full
    vectors are never touched, only its 4-code rows.

    Spark shape: the LUT is O(NQ·M·K) ints — driver-built from the
    bounded query/codebook collects and closed over ONE vectorized
    ``mapInPandas`` over the CODES table (the 32×-compressed relation, not
    the embeddings); per batch, numpy gathers LUT[q, m, code_m] and sums.
    Both top-k sides rank (d2 asc, vec_id asc) on exact int64 grids; the
    exact side is the same broadcast-queries brute-force shape as
    ``sim_topk_bruteforce``. Audit output is |queries| rows of exact ppm.
    At 100 TB the audit runs on a sample of queries (NQ is a config), and
    the ADC pass over codes IS the production query path being measured."""
    import numpy as np
    import pandas as pd

    emb = _pq_grid_emb(spark, sf_dir)
    CB = _pq_codebook(emb)
    codes = _pq_codes(emb, CB)
    q_rows = sorted(
        (r["vec_id"], np.array(r["x6"], dtype=np.int64))
        for r in emb.filter(F.col("vec_id") < PQ_NQ).collect()
    )
    qids = np.array([k for k, _ in q_rows], dtype=np.int64)
    Q = np.stack([v for _, v in q_rows])  # (NQ, d)
    Qs = Q.reshape(len(Q), PQ_M, _PQ_SUBDIM)
    # (NQ, M, K) exact integer LUT: query subvector vs every codeword
    LUT = ((Qs[:, :, None, :] - CB.transpose(1, 0, 2)[None, :, :, :]) ** 2).sum(axis=3)

    def _adc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cm = pdf[["code_0", "code_1", "code_2", "code_3"]].to_numpy(np.int64)
            vids = pdf["vec_id"].to_numpy(np.int64)
            frames = []
            for qi in range(len(qids)):
                d2 = sum(LUT[qi, m, cm[:, m]] for m in range(PQ_M))
                keep = vids != qids[qi]
                frames.append(
                    pd.DataFrame(
                        {"qid": qids[qi], "vec_id": vids[keep], "d2": d2[keep]}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    adc = codes.mapInPandas(_adc, "qid bigint, vec_id bigint, d2 bigint")

    def _exact(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["x6"].to_numpy()).astype(np.int64)
            vids = pdf["vec_id"].to_numpy(np.int64)
            frames = []
            for qi in range(len(qids)):
                d2 = ((X - Q[qi][None, :]) ** 2).sum(axis=1)
                keep = vids != qids[qi]
                frames.append(
                    pd.DataFrame(
                        {"qid": qids[qi], "vec_id": vids[keep], "d2": d2[keep]}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    ex = emb.mapInPandas(_exact, "qid bigint, vec_id bigint, d2 bigint")

    w = Window.partitionBy("qid").orderBy(F.col("d2").asc(), F.col("vec_id").asc())
    at = adc.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= PQ_TOP_K
    ).select("qid", "vec_id")
    et = ex.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= PQ_TOP_K
    ).select("qid", "vec_id")
    hit = at.withColumn("hit", F.lit(1))
    return (
        et.join(hit, ["qid", "vec_id"], "left")
        .groupBy(F.col("qid").alias("query_id"))
        .agg(
            F.count("hit").alias("n_hits"),
            F.expr(f"cast(count(hit) * 1000000 div {PQ_TOP_K} as bigint)").alias(
                "recall_ppm"
            ),
        )
    )


# Matryoshka (MRL) truncation audit: how much ANN recall survives when the
# index keys on only the leading MRL_DIM coordinates (Kusupati et al. 2022
# train embeddings so nested prefixes stay usable; serving stacks exploit
# that by retrieving on a prefix and re-ranking on the full vector). The
# audit quantifies the retrieval half of that trade on THIS corpus.
MRL_DIM = 16


@query(
    "sim_matryoshka_recall_audit",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    t AS (
      SELECT vec_id, v[1:{MRL_DIM}] AS tv,
             sqrt(list_dot_product(v[1:{MRL_DIM}], v[1:{MRL_DIM}])) AS tnrm
      FROM e
    ),
    full_scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
      FROM n q JOIN n c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    ),
    bt AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM full_scored
      ) WHERE rank <= {TOP_K}
    ),
    tr_scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.tv, c.tv) / (q.tnrm * c.tnrm), 6)
                 AS cosine
      FROM t q JOIN t c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    ),
    tt AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM tr_scored
      ) WHERE rank <= {TOP_K}
    )
    SELECT bt.query_id,
           COUNT(tt.neighbor_id) AS n_hits,
           COUNT(tt.neighbor_id) * 1000000 // {TOP_K} AS recall_ppm
    FROM bt LEFT JOIN tt USING (query_id, neighbor_id)
    GROUP BY bt.query_id
    """,
    tags=("northstar", "similarity", "embedding", "bench"),
)
def sim_matryoshka_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation recall audit: per query, how many of the exact
    full-dimension cosine top-k survive when retrieval keys on only the
    leading {MRL_DIM} of {DIM} coordinates — the measurement behind the
    MRL-style serving pattern (retrieve on a cheap prefix, re-rank on the
    full vector): prefix recall IS the quantity that decides whether the
    4× dot-product saving is free or lossy on a given corpus.

    Spark shape: two instances of the brute-force panel scorer —
    broadcast Q-row query sets, candidates never shuffle, per-query heap
    ranks — the truncated side just slices the array BEFORE scoring, so
    its dot products cost DIM/{MRL_DIM}-fold less (exactly the saving the
    audit prices); one co-shuffled left join on (query, neighbor) and a
    |Q|-row exact-ppm aggregate close the loop. Both sides rank on
    ROUND(cosine, 6) with neighbor-id tiebreaks, so rank boundaries are
    engine-deterministic. At 100 TB: sampled query panel (Q is config),
    same as every recall dashboard here."""
    n = _vectors(spark, sf_dir)
    tr = n.select(
        "vec_id",
        F.slice("v", 1, MRL_DIM).alias("tv"),
    ).select(
        "vec_id", "tv", F.sqrt(_dot(F.col("tv"), F.col("tv"))).alias("tnrm")
    )
    bt = sim_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    q = tr.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("tv").alias("qv"),
        F.col("tnrm").alias("qn"),
    )
    c = tr.select(F.col("vec_id").alias("neighbor_id"), "tv", "tnrm")
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot_udf(F.col("qv"), F.col("tv")) / (F.col("qn") * F.col("tnrm")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    tt = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    )
    return (
        bt.join(tt, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.count("hit").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            F.expr(f"n_hits * 1000000 div {TOP_K}").alias("recall_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Covariance / Gram matrix — the PCA-whitening pre-step
# ---------------------------------------------------------------------------


# Shared covariance CTE chain (upper triangle on the exact grids) — the
# oracle body of ``embedding_covariance_matrix`` and the seed relation of
# ``embedding_pca_power_iteration``'s oracle.
_COV_CTES = """
    x AS (
      SELECT vec_id,
             unnest(range(len(embedding))) AS dim,
             CAST(FLOOR(unnest(embedding::DOUBLE[]) * 1000000 + 0.5) AS BIGINT)
                 AS xi
      FROM embeddings
    ),
    s AS (SELECT dim, CAST(SUM(xi) AS BIGINT) AS sx FROM x GROUP BY dim),
    nn AS (SELECT COUNT(*) AS n FROM embeddings),
    p AS (
      SELECT a.dim AS i, b.dim AS j, CAST(SUM(a.xi * b.xi) AS BIGINT) AS sxy
      FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.dim <= b.dim
      GROUP BY 1, 2
    ),
    cov AS (
      SELECT CAST(p.i AS BIGINT) AS i, CAST(p.j AS BIGINT) AS j,
             CAST((nn.n * p.sxy - si.sx * sj.sx) // (nn.n * nn.n) AS BIGINT)
                 AS cov_e12
      FROM p
      JOIN s si ON si.dim = p.i
      JOIN s sj ON sj.dim = p.j
      CROSS JOIN nn
    )"""


@query(
    "embedding_covariance_matrix",
    oracle=f"""
    WITH {_COV_CTES}
    SELECT i, j, cov_e12 FROM cov
    """,
    tags=("northstar", "similarity", "embedding", "quality", "bench"),
)
def embedding_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus covariance matrix over the embedding dimensions — the input
    every PCA / ZCA-whitening / Mahalanobis pipeline stage needs before an
    ANN index or SemDeDup pass consumes a new embedding drop (the
    cross-dim complement of ``embedding_dim_stats``' per-dim moments: a
    near-rank-deficient covariance flags an encoder collapse that per-dim
    variance alone cannot see). Output: the d(d+1)/2 upper triangle as
    (i, j, cov_e12) with the covariance numerator identity
    (n·Σxᵢxⱼ − Σxᵢ·Σxⱼ) // n² on the 1e-6 coordinate grid — order-free
    integer folds, bit-equal across engines and partition counts.

    Spark shape: ONE Arrow ``mapInPandas`` pass computes a per-batch
    (d × d) int64 Gram block with a single numpy matmul plus the per-dim
    sums and row count, emitting only the d(d+1)/2 + d partial rows per
    batch — the raw N·d² products NEVER materialize as rows (a
    posexplode self-join — the oracle's shape — would shuffle N·d rows
    and join-explode to N·d²; here the shuffle carries #batches·2 144
    rows regardless of N). The diagonal partials carry (Σxᵢ, n) so one
    2 080-row aggregate plus a broadcast join-back of its own diagonal
    assembles the centered numerator — no second scan. At 100 TB this is
    the canonical distributed Gram accumulation: scan-bound,
    embarrassingly parallel, O(d²) state per task. Headroom: n·Σxᵢxⱼ and
    Σxᵢ·Σxⱼ stay inside int64 while n·(max|x|·1e6)² < 9.2e18 — ~9 M
    unit-normalized vectors; beyond that widen the final numerator to
    DECIMAL(38,0) in both engines (same plan, wider lanes — the
    ``embedding_dim_stats`` convention).

    Eigendecomposition of the returned d×d matrix is O(d³) driver/client
    work on config-sized data — deliberately out of plan scope (the
    SCALE.md O(config)-collect stance, same class as the IVF centroid
    collects)."""
    return _covariance_upper(spark, sf_dir)


def gram_partials(emb: DataFrame) -> DataFrame:
    """Per-batch Gram partials over a ``v array<double>`` column: one Arrow
    pass emitting (i, j, sxy, sx, cnt) rows — d(d+1)/2 upper-triangle
    products per batch, with the per-dim sums and row count carried on the
    diagonal rows. Works identically on a batch OR streaming DataFrame
    (stateless map), which is what makes the streaming twin a one-liner:
    the running groupBy(i, j) SUM of these partials IS the incremental
    Gram state. Partition-invariance (any batch split folds to the same
    aggregate) is property-pinned by
    test_covariance_partials_are_partition_invariant."""
    import numpy as np

    d = DIM

    def gram_blocks(batches):
        iu, ju = np.triu_indices(d)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            xv = np.stack(pdf["v"].to_numpy())  # (b, d) float64
            xi = np.floor(xv * 1e6 + 0.5).astype(np.int64)
            g = xi.T @ xi  # (d, d) int64 Gram block
            # cnt rides EVERY row (round 13): the aggregated cnt is then a
            # strictly-monotone emission marker for every (i, j) cell, so
            # the streaming twin's max-cnt reduce is well-founded off the
            # diagonal too (cnt=0 there made the pick arbitrary under
            # multi-batch replay — the split-replay audit caught it). The
            # batch assembly reads n from the diagonal rows only, where
            # the value is unchanged.
            out = pd.DataFrame(
                {"i": iu, "j": ju, "sxy": g[iu, ju], "sx": 0, "cnt": len(pdf)}
            )
            diag = out["i"] == out["j"]
            out.loc[diag, "sx"] = xi.sum(axis=0)
            yield out

    return emb.mapInPandas(
        gram_blocks, "i long, j long, sxy long, sx long, cnt long"
    )


def gram_agg(partials: DataFrame) -> DataFrame:
    """Fold Gram partials to the d(d+1)/2-row aggregate (sxy, sx, cnt per
    (i, j)) — the mergeable state both the batch covariance and the
    streaming twin's running fold maintain."""
    return partials.groupBy("i", "j").agg(
        F.sum("sxy").alias("sxy"),
        F.sum("sx").alias("sx"),
        F.sum("cnt").alias("cnt"),
    )


def assemble_covariance(agg: DataFrame) -> DataFrame:
    """(i, j, cov_e12) from the Gram aggregate: broadcast-join the
    aggregate's own diagonal for the centering sums."""
    diag = agg.filter(F.col("i") == F.col("j")).select(
        F.col("i").alias("dim"), F.col("sx").alias("dim_sx"), F.col("cnt").alias("n")
    )
    di = diag.select(
        F.col("dim").alias("di_dim"), F.col("dim_sx").alias("sx_i"), "n"
    )
    dj = diag.select(F.col("dim").alias("dj_dim"), F.col("dim_sx").alias("sx_j"))
    return (
        agg.join(F.broadcast(di), agg["i"] == F.col("di_dim"))
        .join(F.broadcast(dj), agg["j"] == F.col("dj_dim"))
        .select(
            "i",
            "j",
            # integer `div` (truncating, pure int64) — matches DuckDB's
            # `//`, which also truncates toward zero; a FLOOR(a / b) here
            # would route through double division and lose exactness past
            # 2^53 numerators (and floor≠truncate on negative covariances)
            F.expr("(n * sxy - sx_i * sx_j) div (n * n)")
            .cast("bigint")
            .alias("cov_e12"),
        )
    )


def _covariance_upper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(i, j, cov_e12) upper triangle via the single-pass Gram accumulation
    (see ``embedding_covariance_matrix``); shared with the power-iteration
    query."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    return assemble_covariance(gram_agg(gram_partials(emb)).persist())


PCA_ITERS = 3  # fixed unrolled power-iteration rounds (plan-build-time)


def _pca_iter_ctes() -> str:
    ctes = [
        """covf AS (
      SELECT i, j, cov_e12 // 1000000 AS c6 FROM cov
      UNION ALL
      SELECT j, i, cov_e12 // 1000000 FROM cov WHERE i < j
    ),
    v0 AS (SELECT unnest(range(64)) AS dim, CAST(1000000 AS BIGINT) AS v)"""
    ]
    for t in range(1, PCA_ITERS + 1):
        ctes.append(
            f"""w{t} AS (
      SELECT covf.i AS dim, CAST(SUM(covf.c6 * v{t-1}.v) AS BIGINT) AS w
      FROM covf JOIN v{t-1} ON v{t-1}.dim = covf.j GROUP BY 1
    ),
    m{t} AS (SELECT MAX(ABS(w)) AS ma FROM w{t}),
    v{t} AS (
      -- w*1e6 rides HUGEINT: |w| can reach d*|c6|*1e6 ~ 2.6e14 on coarse
      -- coordinate grids, and *1e6 passes 2^63 (round-11 adversarial
      -- sweep found the INT64 overflow); the quotient is <= 1e6 so the
      -- result cast back to BIGINT is always safe
      SELECT dim, CAST((CAST(w AS HUGEINT) * 1000000) // ma AS BIGINT) AS v
      FROM w{t} CROSS JOIN m{t}
    )"""
        )
    return ",\n    ".join(ctes)


@query(
    "embedding_pca_power_iteration",
    oracle=f"""
    WITH {_COV_CTES},
    {_pca_iter_ctes()}
    SELECT CAST(dim AS BIGINT) AS dim, v AS v_e6 FROM v{PCA_ITERS}
    """,
    tags=("northstar", "similarity", "embedding", "bench"),
)
def embedding_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the embedding corpus by {PCA_ITERS}
    exact integer-grid power-iteration rounds over the distributed
    covariance — the first eigenvector every PCA-whitening / spectral
    drift check needs, with zero driver-side linear algebra: the whole
    iteration tail runs IN-CLUSTER as one Arrow task over the coalesced
    O(d²) covariance relation (matvec = int64 matmul, rescale = max|w|
    with truncation-toward-zero integer division — DuckDB's `//` and
    Spark's `div` semantics, replicated exactly in numpy as
    sign·(|a|//b); starting vector is the uniform 1e6 grid). Output: the
    64-row direction estimate (dim, v_e6), max-abs-normalized to ±1e6.

    Spark shape: the covariance comes from the same single-pass Gram
    accumulation as ``embedding_covariance_matrix`` (one fact scan, O(d²)
    partials per batch); the tail is ONE coalesce(1) + mapInPandas stage
    over d(d+1)/2 rows — a single job, no per-round shuffles (a first cut
    ran each round as join + groupBy + broadcast-scalar DataFrame ops:
    correct, but ~3.5 s of pure scheduling for 4 096 rows at sf0.1; the
    one-task tail is the right shape because the relation is CONFIG-sized
    — same O(d²)-bounded stance as the IVF/PQ codebook collects, except
    the data never even leaves the cluster). The rescale uses the e6
    covariance grid (cov_e12 trunc-div 1e6); since round 11 the
    w·1e6 rescale product rides HUGEINT / Python ints in the two
    engines (the adversarial embeddings sweep overflowed the INT64 form
    at coordinate scale ~2 — loud in DuckDB, silent-wrap in numpy), so
    the remaining int64 headroom is the MATVEC: d · max|c6| · 1e6 <
    2⁶³ ⇔ |cov| ≲ 1.4e12, i.e. coordinates to ~10³ in magnitude —
    beyond any normalized-embedding corpus, stated instead of assumed. Fixed iteration count at plan-build time (the
    ``kmeans_ivf_train`` precedent); convergence tracks the eigengap —
    (λ2/λ1)^{PCA_ITERS} — so on a corpus with a real dominant direction
    {PCA_ITERS} rounds recover it (unit-pinned on planted anisotropic
    data: test_power_iterate_recovers_planted_direction), while on a
    near-isotropic spectrum (the synthetic fixtures: λ2/λ1 ≈ 0.93) the
    output is one refinement STEP whose exactness — not convergence — is
    what the oracle checks; production raises the round count or chains
    the query, and Rayleigh-quotient deltas over the 64-row output are
    the client-side stop rule."""
    cov = _covariance_upper(spark, sf_dir)
    d = DIM

    def iterate(batches):
        chunks = [pdf for pdf in batches if len(pdf)]
        if not chunks:
            return
        up = pd.concat(chunks, ignore_index=True)
        yield power_iterate_int(up, d, PCA_ITERS)

    return cov.coalesce(1).mapInPandas(iterate, "dim long, v_e6 long")


def power_iterate_int(up: pd.DataFrame, d: int, iters: int) -> pd.DataFrame:
    """The exact integer power-iteration tail over an (i, j, cov_e12)
    upper-triangle frame: e6-grid covariance, int64 matvec, max-abs
    rescale with truncation-toward-zero division (numpy sign·(|a|//b) —
    DuckDB `//` / Spark `div` semantics). Factored out of the query so
    the eigenvector-recovery unit can drive it on planted spectra."""
    import numpy as np

    c6mat = np.zeros((d, d), dtype=np.int64)
    ii = up["i"].to_numpy(dtype=np.int64)
    jj = up["j"].to_numpy(dtype=np.int64)
    cc = up["cov_e12"].to_numpy(dtype=np.int64)
    c6 = np.sign(cc) * (np.abs(cc) // 1000000)  # trunc toward zero
    c6mat[ii, jj] = c6
    c6mat[jj, ii] = c6  # mirror the upper triangle
    v = np.full(d, 1000000, dtype=np.int64)
    for _ in range(iters):
        w = c6mat @ v
        # rescale in PYTHON ints: |w|*1e6 passes 2^63 once coordinates
        # leave the unit-ish grid (|w| <= d*|c6|*1e6 ~ 2.6e14 on the
        # adversarial 1/64-grid fixture) and np.int64 would wrap
        # SILENTLY where the oracle's HUGEINT stays exact; the d-sized
        # loop is O(64) per round. Quotient <= 1e6 fits int64 again.
        wl = [int(x) for x in w]
        ma = max(abs(x) for x in wl)
        v = np.array(
            [(1 if x >= 0 else -1) * ((abs(x) * 1000000) // ma) for x in wl],
            dtype=np.int64,
        )
    return pd.DataFrame({"dim": np.arange(d, dtype=np.int64), "v_e6": v})


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (round 7)
# ---------------------------------------------------------------------------

# Project DIM=64 → PROJ_DIM=16 with integer pseudo-random weights (the LSH
# hyperplane recipe, index-offset so the weight family is independent of the
# bucketing planes). Inputs quantize to a 1e-6 integer grid BEFORE the
# contraction, so every projected coordinate is an exact BIGINT sum —
# order-free across engines and partitions (the LP_GRID convention applied
# to linear algebra). Overflow headroom: |xq|<=2^20, |w|<2^30, 64 terms →
# <2^56, inside int64.
PROJ_DIM = 16
PROJ_SEED_OFF = 4096  # keep (j,d) weight indices disjoint from LSH planes


@query(
    "embedding_random_projection",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    d AS (
      SELECT vec_id, generate_subscripts(v, 1) - 1 AS d,
             CAST(FLOOR(unnest(v) * 1000000 + 0.5) AS BIGINT) AS xq
      FROM e
    ),
    w AS (
      SELECT j.range AS j, dd.range AS d,
             ((j.range * {DIM} + dd.range + {PROJ_SEED_OFF}) * {KNUTH})
                 % 2147483648 - 1073741824 AS w
      FROM range({PROJ_DIM}) j, range({DIM}) dd
    )
    SELECT d.vec_id, w.j, CAST(SUM(d.xq * w.w) AS BIGINT) AS proj
    FROM d JOIN w USING (d)
    GROUP BY d.vec_id, w.j
    """,
    tags=("northstar", "similarity", "embedding", "bench"),
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64→16 dims — the dimension
    contraction a vector pipeline runs before sketching/clustering when the
    full embedding is too wide (JL: pairwise distances survive a random
    linear map within (1±ε)). Weights are the integer Knuth-hash planes of
    the LSH family (seed-offset → independent family), inputs snap to the
    1e-6 grid, so each projected coordinate is an exact integer
    contraction — reproducible across engines, partitions, and reruns,
    which is what makes the projected index REBUILDABLE (a production
    system re-derives identical projections when backfilling).

    Spark shape: posexplode → map-side join against the O(PROJ_DIM·DIM)=
    1024-row broadcast weight table (built with ``spark.range`` — no
    driver-side literal shipping) → one (vec_id, j) shuffle with map-side
    partial integer sums. One corpus pass, narrow rows; at 100 TB this is
    the standard pre-ANN contraction and shuffles 16 ints per vector."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    d = e.select(
        "vec_id", F.posexplode("v").alias("d", "x")
    ).select(
        "vec_id",
        "d",
        F.floor(F.col("x") * 1000000 + F.lit(0.5)).cast("bigint").alias("xq"),
    )
    w = (
        spark.range(PROJ_DIM * DIM)
        .select(
            (F.col("id") / DIM).cast("bigint").alias("j"),
            (F.col("id") % DIM).alias("d"),
            (
                (F.col("id") + PROJ_SEED_OFF) * KNUTH % 2147483648 - 1073741824
            ).alias("w"),
        )
    )
    return (
        d.join(F.broadcast(w), "d")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("xq") * F.col("w")).alias("proj"))
    )


# ---------------------------------------------------------------------------
# IVF-PQ combined search (cells prune, ADC scores)
# ---------------------------------------------------------------------------


def _ivfpq_ranked_ctes() -> str:
    """The IVF-PQ candidate/ADC/rank CTE chain up to ``ranked`` — shared
    by the ADC top-k oracle and the refine-stage oracle."""
    # PQ CTEs re-aliased (g = grid embeddings) so they compose with the
    # IVF index CTEs, whose `e` is the double-vector relation.
    def dist(m: int, left: str) -> str:
        lo, hi = m * _PQ_SUBDIM + 1, (m + 1) * _PQ_SUBDIM
        return (
            f"list_sum(list_transform(list_zip({left}.x6[{lo}:{hi}],"
            f" cb.x6[{lo}:{hi}]), s -> (s[1]-s[2])*(s[1]-s[2])))"
        )

    assigns = ",\n".join(
        f"""a{m} AS (
      SELECT vec_id, code_id FROM (
        SELECT g.vec_id, cb.code_id,
               row_number() OVER (
                 PARTITION BY g.vec_id
                 ORDER BY {dist(m, 'g')} ASC, cb.code_id ASC) AS rn
        FROM g CROSS JOIN cb
      ) WHERE rn = 1
    )"""
        for m in range(PQ_M)
    )
    adc = " + ".join(
        f"""(SELECT list_sum(list_transform(
            list_zip(qg.x6[{m * _PQ_SUBDIM + 1}:{(m + 1) * _PQ_SUBDIM}],
                     cbm.x6[{m * _PQ_SUBDIM + 1}:{(m + 1) * _PQ_SUBDIM}]),
            s -> (s[1]-s[2])*(s[1]-s[2])))
         FROM cb cbm WHERE cbm.code_id = a{m}.code_id)"""
        for m in range(PQ_M)
    )
    return f"""{_IVF_INDEX_CTES},
    g AS (
      SELECT vec_id,
             [CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT)
              for x in embedding::DOUBLE[]] AS x6
      FROM embeddings
    ),
    cb AS (SELECT vec_id AS code_id, x6 FROM g WHERE vec_id < {PQ_K}),
    {assigns},
    cand AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM members q JOIN members c
        ON q.cent_id = c.cent_id AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {PQ_NQ}
    ),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             CAST({adc} AS BIGINT) AS adc_d2
      FROM cand
      JOIN g qg ON qg.vec_id = cand.query_id
      JOIN a0 ON a0.vec_id = cand.neighbor_id
      JOIN a1 ON a1.vec_id = cand.neighbor_id
      JOIN a2 ON a2.vec_id = cand.neighbor_id
      JOIN a3 ON a3.vec_id = cand.neighbor_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY adc_d2 ASC, neighbor_id ASC) AS rank
      FROM scored
    )"""


def _ivfpq_oracle() -> str:
    return f"""{_ivfpq_ranked_ctes()}
    SELECT query_id, neighbor_id, adc_d2, rank
    FROM ranked WHERE rank <= {PQ_TOP_K}
    """


@query(
    "sim_ivfpq_adc_topk",
    oracle=_ivfpq_oracle(),
    tags=("northstar", "similarity", "ivf", "quantization", "bench"),
)
def sim_ivfpq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search — the production ANN index (Jégou et al. 2011; what
    faiss serves as IndexIVFPQ) assembled from the registry's two proven
    halves: the IVF coarse quantizer prunes candidates to the query's
    cell, and Asymmetric Distance Computation scores each survivor as
    Σ_m ‖query-subvector_m − codebook[code_m(candidate)]‖² — the query
    side stays EXACT (uncompressed), only candidates are compressed,
    which is the 'asymmetric' that makes PQ recall usable. Exact integer
    grid end-to-end: codes and LUT distances are int64, ranking ties
    break toward the smaller neighbor id.

    Spark shape: composes the two persisted substrates (cell assignments
    from ``_ivf_members``; codes from the ``embedding_pq_codes`` pass)
    with ONE cent_id equi-join for candidates — co-partitioned, never
    all-pairs — and a vectorized Arrow pass that evaluates the ADC sum
    from the closed-over 4 KiB codebook (the per-batch work is a numpy
    gather, no per-row Python). Per-query top-k is a window partitioned
    by query. At 100 TB: candidate volume ∝ cell occupancy (nprobe
    scales it), the scan side streams codes (32× smaller than vectors),
    and the only driver state is O(K·d + M·K·subdim) — config-sized.
    This is the query path whose recall ``sim_pq_adc_recall_audit`` and
    ``sim_ivf_recall_audit`` price separately."""
    import numpy as np
    import pandas as pd

    members = _ivf_members(spark, sf_dir).select("vec_id", "cent_id")
    emb = _pq_grid_emb(spark, sf_dir)
    CB = _pq_codebook(emb)
    codes = _pq_codes(emb, CB).select(
        "vec_id", "code_0", "code_1", "code_2", "code_3"
    )
    q = (
        members.filter(F.col("vec_id") < PQ_NQ)
        .join(emb, "vec_id")
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("cent_id").alias("q_cent"),
            F.col("x6").alias("qx6"),
        )
    )
    c = members.join(codes, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        "cent_id",
        "code_0",
        "code_1",
        "code_2",
        "code_3",
    )
    # The probe side is request-sized (PQ_NQ queries) — broadcast it; the
    # un-hinted join sort-merged the corpus code table against it (r14
    # final-plan audit: SMJ on q_cent survived AQE). Flip to cent_id
    # co-shuffle only if the query batch ever outgrows broadcast.
    cand = F.broadcast(q).join(c, q.q_cent == c.cent_id).filter(
        F.col("neighbor_id") != F.col("query_id")
    )

    def adc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            Xq = np.stack(pdf["qx6"].to_numpy()).astype(np.int64)
            Xqs = Xq.reshape(len(Xq), PQ_M, _PQ_SUBDIM)
            codes_m = np.stack(
                [pdf[f"code_{m}"].to_numpy() for m in range(PQ_M)], axis=1
            ).astype(np.int64)
            d = np.zeros(len(pdf), dtype=np.int64)
            for m in range(PQ_M):
                diff = Xqs[:, m, :] - CB[codes_m[:, m], m, :]
                d += (diff * diff).sum(axis=1)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].values,
                    "neighbor_id": pdf["neighbor_id"].values,
                    "adc_d2": d,
                }
            )

    scored = cand.select(
        "query_id", "qx6", "neighbor_id", "code_0", "code_1", "code_2", "code_3"
    ).mapInPandas(adc, "query_id long, neighbor_id long, adc_d2 long")
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PQ_TOP_K)
        .select("query_id", "neighbor_id", "adc_d2", "rank")
    )


# ---------------------------------------------------------------------------
# IVF-PQ + refine: exact re-rank of the ADC shortlist
# ---------------------------------------------------------------------------

REFINE_R = 10  # ADC shortlist size handed to the exact refine stage


def _ivfpq_refine_oracle() -> str:
    return f"""{_ivfpq_ranked_ctes()},
    shortlist AS (SELECT query_id, neighbor_id, adc_d2 FROM ranked
                  WHERE rank <= {REFINE_R}),
    refined AS (
      SELECT s.query_id, s.neighbor_id, s.adc_d2,
             CAST(list_sum(list_transform(list_zip(qg.x6, ng.x6),
                  t -> (t[1]-t[2])*(t[1]-t[2]))) AS BIGINT) AS exact_d2
      FROM shortlist s
      JOIN g qg ON qg.vec_id = s.query_id
      JOIN g ng ON ng.vec_id = s.neighbor_id
    ),
    rr AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY exact_d2 ASC, neighbor_id ASC)
          AS rank
      FROM refined
    )
    SELECT query_id, neighbor_id, adc_d2, exact_d2, rank
    FROM rr WHERE rank <= {PQ_TOP_K}
    """


@query(
    "sim_ivfpq_refine_topk",
    oracle=_ivfpq_refine_oracle(),
    tags=("northstar", "similarity", "ivf", "quantization", "bench"),
)
def sim_ivfpq_refine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search WITH the refine stage — the full production serving
    path (faiss ``IndexRefineFlat`` over ``IndexIVFPQ``): the ADC pass
    ranks compressed candidates cheaply, the top-R shortlist joins back
    the EXACT vectors (only R rows per query ever touch full-width
    data), and the final top-k re-ranks on exact integer L2 — this is
    what recovers the recall the PQ compression gave up, priced
    separately by ``sim_pq_adc_recall_audit``. Both distances ride in
    the output so a consumer sees exactly where ADC ordering and exact
    ordering disagree.

    Spark shape: the ADC stage is ``sim_ivfpq_adc_topk``'s plan verbatim
    (cell-pruned candidates, Arrow codebook gather) kept to rank <=
    REFINE_R; the refine join touches R x |queries| rows — the full
    vectors never ride the candidate shuffle, which is the entire
    economics of refine at 100 TB (scan codes at 32x compression,
    fetch exact vectors for a bounded shortlist); exact L2 runs in the
    same vectorized Arrow pass shape as the audit's brute-force side."""
    import numpy as np
    import pandas as pd

    members = _ivf_members(spark, sf_dir).select("vec_id", "cent_id")
    emb = _pq_grid_emb(spark, sf_dir)
    CB = _pq_codebook(emb)
    codes = _pq_codes(emb, CB).select(
        "vec_id", "code_0", "code_1", "code_2", "code_3"
    )
    q = (
        members.filter(F.col("vec_id") < PQ_NQ)
        .join(emb, "vec_id")
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("cent_id").alias("q_cent"),
            F.col("x6").alias("qx6"),
        )
    )
    c = members.join(codes, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        "cent_id",
        "code_0",
        "code_1",
        "code_2",
        "code_3",
    )
    # The probe side is request-sized (PQ_NQ queries) — broadcast it; the
    # un-hinted join sort-merged the corpus code table against it (r14
    # final-plan audit: SMJ on q_cent survived AQE). Flip to cent_id
    # co-shuffle only if the query batch ever outgrows broadcast.
    cand = F.broadcast(q).join(c, q.q_cent == c.cent_id).filter(
        F.col("neighbor_id") != F.col("query_id")
    )

    def adc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            Xq = np.stack(pdf["qx6"].to_numpy()).astype(np.int64)
            Xqs = Xq.reshape(len(Xq), PQ_M, _PQ_SUBDIM)
            codes_m = np.stack(
                [pdf[f"code_{m}"].to_numpy() for m in range(PQ_M)], axis=1
            ).astype(np.int64)
            d = np.zeros(len(pdf), dtype=np.int64)
            for m in range(PQ_M):
                diff = Xqs[:, m, :] - CB[codes_m[:, m], m, :]
                d += (diff * diff).sum(axis=1)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].values,
                    "neighbor_id": pdf["neighbor_id"].values,
                    "adc_d2": d,
                }
            )

    scored = cand.select(
        "query_id", "qx6", "neighbor_id", "code_0", "code_1", "code_2", "code_3"
    ).mapInPandas(adc, "query_id long, neighbor_id long, adc_d2 long")
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2").asc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= REFINE_R)
        .select("query_id", "neighbor_id", "adc_d2")
    )
    withvecs = (
        shortlist.join(
            emb.select(F.col("vec_id").alias("query_id"), F.col("x6").alias("qx6")),
            "query_id",
        )
        .join(
            emb.select(
                F.col("vec_id").alias("neighbor_id"), F.col("x6").alias("nx6")
            ),
            "neighbor_id",
        )
    )

    def refine(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            Xq = np.stack(pdf["qx6"].to_numpy()).astype(np.int64)
            Xn = np.stack(pdf["nx6"].to_numpy()).astype(np.int64)
            d = ((Xq - Xn) ** 2).sum(axis=1)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].values,
                    "neighbor_id": pdf["neighbor_id"].values,
                    "adc_d2": pdf["adc_d2"].values,
                    "exact_d2": d,
                }
            )

    refined = withvecs.select(
        "query_id", "neighbor_id", "adc_d2", "qx6", "nx6"
    ).mapInPandas(
        refine, "query_id long, neighbor_id long, adc_d2 long, exact_d2 long"
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("exact_d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        refined.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= PQ_TOP_K)
        .select("query_id", "neighbor_id", "adc_d2", "exact_d2", "rank")
    )


# ---------------------------------------------------------------------------
# k-center coreset (farthest-first traversal)
# ---------------------------------------------------------------------------

KCENTER_K = 8


def _kcenter_oracle() -> str:
    d2 = (
        "list_sum(list_transform(list_zip({a}.x6, {b}.x6),"
        " t -> (t[1]-t[2])*(t[1]-t[2])))"
    )
    # AS MATERIALIZED is load-bearing: each d_r references d_{r-1}, and
    # DuckDB re-inlines non-materialized CTEs per consumer — the chain
    # re-evaluates exponentially in K (measured 189 s plain vs 0.1 s
    # materialized at K=8, 500 vectors).
    sql = """
    WITH e AS MATERIALIZED (
      SELECT vec_id,
             [CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT)
              for x in embedding::DOUBLE[]] AS x6
      FROM embeddings
    ),
    c0 AS MATERIALIZED (SELECT vec_id, x6 FROM e ORDER BY vec_id LIMIT 1),
    d0 AS MATERIALIZED (
      SELECT e.vec_id, e.x6, {d_e_c0} AS dmin FROM e, c0
    )""".format(d_e_c0=d2.format(a="e", b="c0"))
    picked = ["SELECT CAST(0 AS BIGINT) AS round, vec_id,"
              " CAST(0 AS BIGINT) AS sel_d2 FROM c0"]
    for r in range(1, KCENTER_K):
        prev_ids = " UNION ALL ".join(
            f"SELECT vec_id FROM c{i}" for i in range(r)
        )
        sql += """,
    c{r} AS MATERIALIZED (
      SELECT vec_id, x6, dmin FROM d{prev}
      WHERE vec_id NOT IN ({prev_ids})
      ORDER BY dmin DESC, vec_id ASC LIMIT 1
    ),
    d{r} AS MATERIALIZED (
      SELECT d.vec_id, d.x6, LEAST(d.dmin, {d_d_c}) AS dmin
      FROM d{prev} d, c{r}
    )""".format(r=r, prev=r - 1, prev_ids=prev_ids,
                d_d_c=d2.format(a="d", b=f"c{r}"))
        picked.append(
            f"SELECT CAST({r} AS BIGINT), vec_id, CAST(dmin AS BIGINT) FROM c{r}"
        )
    return sql + "\n    " + "\n    UNION ALL ".join(picked)


@query(
    "sample_kcenter_coreset",
    oracle=_kcenter_oracle(),
    tags=("northstar", "similarity", "sampling", "bench"),
)
def sample_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-center coreset by farthest-first traversal (Gonzalez 1985; the
    greedy 2-approximation of the k-center cover) — the diverse-subset
    selection a data-pruning pass runs over embeddings when it wants
    COVERAGE rather than quality rank: start from the smallest vec_id,
    then repeatedly take the point farthest from every chosen center.
    ``sel_d2`` at each round IS the coverage-radius curve — where it
    flattens tells you how many exemplars the corpus geometry supports
    (the same curve coreset papers plot). Exact integer L2 on the 1e-6
    grid, ties toward the smaller vec_id — bit-deterministic, so the
    selected set replays across engines (oracle = the K-level chained-CTE
    unroll of the same greedy).

    Spark shape: the min-distance column updates INCREMENTALLY — each
    round is one vectorized Arrow pass against the single new center
    (closure-captured 64-int vector, never a join) followed by a
    TakeOrderedAndProject argmax whose 1-row result is the only driver
    traffic (K-1 single-row collects, O(K·d) driver state — the BPE
    top-1-collect pattern, documented in SCALE.md §12). Distances to
    already-chosen centers are never recomputed: total work is K scans,
    the textbook distributed farthest-first schedule. At 100 TB the
    per-round scan dominates; K is config-sized."""
    import numpy as np
    import pandas as pd

    emb = _pq_grid_emb(spark, sf_dir).persist()

    def dist_pass(center_vec):
        c = np.asarray(center_vec, dtype=np.int64)

        def gen(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(pdf["x6"].to_numpy()).astype(np.int64)
                d = ((X - c[None, :]) ** 2).sum(axis=1)
                out = pd.DataFrame(
                    {"vec_id": pdf["vec_id"].values, "d2": d}
                )
                if "dmin" in pdf.columns:
                    out["dmin"] = np.minimum(pdf["dmin"].values, d)
                else:
                    out["dmin"] = d
                out["x6"] = pdf["x6"].values
                yield out[["vec_id", "x6", "dmin"]]

        return gen

    seed = emb.orderBy("vec_id").limit(1).collect()[0]
    centers = [(0, int(seed["vec_id"]), 0)]
    chosen = {int(seed["vec_id"])}
    cur = emb.mapInPandas(
        dist_pass(seed["x6"]), "vec_id long, x6 array<long>, dmin long"
    ).localCheckpoint(eager=True)
    for r in range(1, KCENTER_K):
        nxt = (
            cur.filter(~F.col("vec_id").isin(list(chosen)))
            .orderBy(F.col("dmin").desc(), F.col("vec_id").asc())
            .limit(1)
            .collect()[0]
        )
        centers.append((r, int(nxt["vec_id"]), int(nxt["dmin"])))
        chosen.add(int(nxt["vec_id"]))
        if r < KCENTER_K - 1:
            cur = cur.mapInPandas(
                dist_pass(nxt["x6"]), "vec_id long, x6 array<long>, dmin long"
            ).localCheckpoint(eager=True)
    emb.unpersist()
    return spark.createDataFrame(
        centers, "round long, vec_id long, sel_d2 long"
    )


# ---------------------------------------------------------------------------
# NN-descent round (graph-based ANN construction, round 8)
# ---------------------------------------------------------------------------

# One round of NN-Descent (Dong, Moses & Li 2011, "Efficient k-nearest
# neighbor graph construction for generic similarity measures", WWW):
# starting from a cheap seed k-NN graph, each node's candidate set is its
# neighbors plus its neighbors' neighbors (over the SYMMETRIZED graph —
# the paper's "local join"), scored and pruned back to top-k. The seed
# stands in for the paper's random initial graph with a deterministic
# id-adjacency ring so both engines derive identical inputs.
NND_SEED_DEG = 4  # directed out-degree of the seed ring graph
NND_K = 5  # neighbors kept per node after the round


@query(
    "sim_nndescent_round",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    nn AS (SELECT COUNT(*) AS n_vec FROM e),
    seed AS (
      SELECT vec_id AS src, (vec_id + gs.i) % nn.n_vec AS dst
      FROM e, nn, generate_series(1, {NND_SEED_DEG}) gs(i)
    ),
    sym AS (
      SELECT src, dst FROM seed
      UNION
      SELECT dst AS src, src AS dst FROM seed
    ),
    cand AS (
      SELECT a.src, b.dst FROM sym a JOIN sym b ON a.dst = b.src
      UNION
      SELECT src, dst FROM sym
    ),
    cd AS (SELECT src, dst FROM cand WHERE src <> dst),
    scored AS (
      SELECT cd.src AS vec_id, cd.dst AS neighbor_id,
             ROUND(list_dot_product(u.v, w.v) / (u.nrm * w.nrm), 6) AS cosine,
             CAST(CASE WHEN s.src IS NULL THEN 1 ELSE 0 END AS INT)
                 AS discovered
      FROM cd
      JOIN n u ON u.vec_id = cd.src
      JOIN n w ON w.vec_id = cd.dst
      LEFT JOIN seed s ON s.src = cd.src AND s.dst = cd.dst
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    SELECT vec_id, neighbor_id, cosine, discovered, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {NND_K}
    """,
    tags=("northstar", "similarity", "ann", "graph", "bench"),
)
def sim_nndescent_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One NN-Descent round — the graph-based ANN index family (HNSW /
    NSG / NN-descent) next to the partition-based one (IVF / IVF-PQ
    elsewhere in this module): symmetrize the seed k-NN graph, expand
    each node's candidates with its neighbors' neighbors (the paper's
    local join), score the candidate pairs by exact cosine, keep top-k
    per node, and flag which survivors were DISCOVERED by the round
    (absent from the directed seed list) — the per-round improvement
    signal NN-descent iterates on until it converges.

    Spark shape: the seed ring and the two graph joins carry (id, id)
    pairs ONLY — candidate generation never shuffles a vector. Full-width
    vectors join in exactly once per SURVIVING candidate pair, bounded by
    N·deg·(deg+1) rows (degree-squared, not corpus-squared — the reason
    NN-descent scales where all-pairs cannot), scored by the Arrow dot
    UDF, pruned by a per-node rank window partitioned on vec_id. The
    1-row corpus-count aggregate broadcasts (bounded-scalar stance). At
    100 TB each round is: ids-only self-join co-shuffled on the middle
    node, vector fetch co-partitioned on each endpoint, per-node top-k —
    all linear in N·deg²; iterate to convergence, exactly as a
    distributed HNSW-build substitute runs in production.

    Extends the reference's join surface (KafkaStreamsApp.scala:155-189
    is its only join) with the self-join graph-expansion shape."""
    n = _vectors(spark, sf_dir)
    nvec = load_table(spark, sf_dir, "embeddings").agg(
        F.count(F.lit(1)).alias("n_vec")
    )
    seed = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id")
        .crossJoin(F.broadcast(nvec))  # 1-row scalar broadcast
        .select(
            F.col("vec_id").alias("src"),
            F.explode(F.sequence(F.lit(1), F.lit(NND_SEED_DEG))).alias("i"),
            "n_vec",
        )
        .select("src", ((F.col("src") + F.col("i")) % F.col("n_vec")).alias("dst"))
    )
    sym = seed.union(
        seed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    cand = (
        sym.alias("a")
        .join(sym.alias("b"), F.col("a.dst") == F.col("b.src"))
        .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
        .union(sym)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    flagged = cand.join(
        seed.withColumn("in_seed", F.lit(1)), ["src", "dst"], "left"
    )
    u = n.select(
        F.col("vec_id").alias("src"), F.col("v").alias("uv"), F.col("nrm").alias("un")
    )
    w = n.select(
        F.col("vec_id").alias("dst"), F.col("v").alias("wv"), F.col("nrm").alias("wn")
    )
    scored = (
        flagged.join(u, "src")
        .join(w, "dst")
        .select(
            F.col("src").alias("vec_id"),
            F.col("dst").alias("neighbor_id"),
            F.round(
                _dot_udf(F.col("uv"), F.col("wv")) / (F.col("un") * F.col("wn")), 6
            ).alias("cosine"),
            F.when(F.col("in_seed").isNull(), 1).otherwise(0).cast("int").alias(
                "discovered"
            ),
        )
    )
    rk = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(rk).cast("bigint"))
        .filter(F.col("rank") <= NND_K)
        .select("vec_id", "neighbor_id", "cosine", "discovered", "rank")
    )


# ---------------------------------------------------------------------------
# Per-label centroid-distance outliers (mislabeled-example detection)
# ---------------------------------------------------------------------------

OUTLIER_TOPK = 5

_CENT_OUT_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, label,
             [CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT)
              for x in embedding::DOUBLE[]] AS x6
      FROM embeddings
    ),
    ex AS (
      SELECT vec_id, label, unnest(x6) AS x,
             generate_subscripts(x6, 1) AS d
      FROM e
    ),
    s AS (
      SELECT label, d, CAST(SUM(x) AS BIGINT) AS sd, COUNT(*) AS n
      FROM ex GROUP BY 1, 2
    ),
    m AS (
      SELECT label, d,
             (sd - ((sd % n + n) % n)) // n AS md
      FROM s
    ),
    dist AS (
      SELECT ex.vec_id, ex.label,
             CAST(SUM((x - md) * (x - md)) AS BIGINT) AS dist12
      FROM ex JOIN m USING (label, d)
      GROUP BY 1, 2
    )
    SELECT label, vec_id, dist12, rk FROM (
      SELECT label, vec_id, dist12,
             ROW_NUMBER() OVER (PARTITION BY label
                                ORDER BY dist12 DESC, vec_id) AS rk
      FROM dist
    ) WHERE rk <= {OUTLIER_TOPK}
"""


def centroid_dist12_udf():
    """Arrow-batched exact grid distance²: Σ(x6−m6)² as BIGINT (built
    lazily — pandas_udf type parsing needs an active session)."""

    @F.pandas_udf("long")
    def dist12(x6: pd.Series, m6: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for x, m in zip(x6, m6):
            dx = np.asarray(x, dtype="int64") - np.asarray(m, dtype="int64")
            out.append(int((dx * dx).sum()))
        return pd.Series(out, dtype="int64")

    return dist12


def quantize_embedding_x6(df: DataFrame) -> DataFrame:
    """Quantize an embeddings relation (batch scan OR ingest stream) to the
    1e-6 integer grid — the ONE rounding rule shared by the batch centroid
    audit and its score-at-ingest streaming twin, so a grid change can
    never desync the two."""
    return df.select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1000000 + F.lit(0.5)).cast("long"),
        ).alias("x6"),
    )


def _emb_x6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings with coordinates quantized to the 1e-6 integer grid."""
    return quantize_embedding_x6(load_table(spark, sf_dir, "embeddings"))


def label_centroids_x6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label grid-floored centroid arrays (label, m6) — the O(labels·d)
    broadcast table shared by the batch outlier audit and its score-at-
    ingest streaming twin."""
    s = (
        _emb_x6(spark, sf_dir)
        .select("label", F.posexplode("x6").alias("d", "x"))
        .groupBy("label", "d")
        .agg(F.sum("x").alias("sd"), F.count(F.lit(1)).alias("n"))
    )
    return (
        s.select(
            "label",
            "d",
            F.expr("(sd - ((sd % n + n) % n)) div n").alias("md"),
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "md"))),
                lambda st: st["md"],
            ).alias("m6")
        )
    )


@query(
    "embedding_centroid_outliers",
    oracle=_CENT_OUT_ORACLE,
    tags=("northstar", "similarity", "embedding", "bench"),
)
def embedding_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mislabeled-example detection: per label, the OUTLIER_TOPK vectors
    farthest from their label's centroid — the cheap first-pass audit
    (Northcutt et al.'s confident-learning intuition in embedding space)
    run before any label-conditioned training or hard-negative mining
    consumes the labels; a wrong label lands a vector in the wrong
    cluster, and centroid distance ranks exactly those first.

    Exactness: coordinates on the 1e-6 integer grid; the centroid is the
    GRID-FLOORED per-dimension mean (sign-safe shared floor division —
    both engines' operators truncate toward zero on negatives while the
    grid wants the mathematical floor, so the mod-adjusted form is
    spelled identically in both engines, the Theil-Sen stance), and
    distance² to it is an exact BIGINT sum of squared grid deltas
    (~(1e6·spread)²·d ≈ 1e14 — n-independent headroom, unlike the
    n-scaled ||n·x − s||² form which overflows BIGINT once n exceeds
    ~10⁴). Ranking runs on exact integers with a (dist, vec_id) total
    order.

    Spark shape: per-dimension label sums via one posexplode + (label,
    dim)-keyed aggregate with map-side partials (N·d rows through one
    shuffle — the embedding_covariance precedent materializes d² blocks,
    this needs only d); the |labels|·d sum table reassembles into
    |labels| centroid arrays (struct-sorted collect_list, an O(config)
    relation) and BROADCASTS onto the vectors; per-vector distance is one
    Arrow pass (dimension-ordered numpy fold, the _dot_udf stance); top-k
    per label is the two-phase partial-window schedule (no |labels|-key
    skew wall)."""
    emb = _emb_x6(spark, sf_dir)
    cent = label_centroids_x6(spark, sf_dir)
    dist12 = centroid_dist12_udf()
    scored = emb.join(F.broadcast(cent), "label").select(
        "label", "vec_id", dist12(F.col("x6"), F.col("m6")).alias("dist12")
    )
    order = [F.col("dist12").desc(), F.col("vec_id")]
    partial = Window.partitionBy("label", "pid").orderBy(*order)
    survivors = (
        scored.withColumn("pid", F.spark_partition_id())
        .withColumn("prk", F.row_number().over(partial))
        .filter(F.col("prk") <= OUTLIER_TOPK)
        .drop("pid", "prk")
    )
    final = Window.partitionBy("label").orderBy(*order)
    return (
        survivors.withColumn("rk", F.row_number().over(final))
        .filter(F.col("rk") <= OUTLIER_TOPK)
        .select("label", "vec_id", "dist12", "rk")
    )
