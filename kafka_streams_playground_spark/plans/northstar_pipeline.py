"""Training-data pipeline operators (north star): the corpus-level passes a
large-scale LLM data pipeline runs between raw crawl and tokenized batches —
benchmark-contamination checking, sequence packing, near-dup *cluster*
identification (connected components over LSH edges), deterministic
stratified sampling, and the composed keep/reject filter pipeline.

Every query carries a DuckDB oracle built from the same literals as the
Spark plan (see plans/registry.py conventions). Where a query consumes the
MinHash-LSH near-dup edges, both engines share the exact pair pipeline
(``northstar_dedup.minhash_verified_pairs`` / ``MINHASH_PAIRS_CTES``) so the
edge sets provably agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_playground_spark.functions import text as T
from kafka_streams_playground_spark.plans.northstar_dedup import (
    MINHASH_PAIRS_CTES,
    minhash_verified_pairs,
)
from kafka_streams_playground_spark.plans.registry import query
from kafka_streams_playground_spark.sources.parquet import load_table

# Benchmark membership: every 50th doc is the "held-out eval set" stand-in.
# Deterministic and tiny (N/50 docs, but the *distinct shingle-hash set* is
# what ships to executors — bounded by benchmark size, not corpus size).
BENCH_MOD = 50
CONTAM_FLAG_RATIO = 0.2

# Sequence packing: context-window token budget and the range-bucket width of
# the distributed prefix-sum (each bucket's cumsum runs in parallel; only the
# per-bucket totals — N/PACK_BUCKET rows — see a single-partition pass).
PACK_BUDGET = 1024
PACK_BUCKET = 1000

# Quality-filter pipeline gates (chosen so every reject reason is non-empty
# on the fixtures: 23 short docs, 10 long, 25 near-dup pairs at sf0.01).
MIN_TOKENS = 16
MAX_TOKENS = 96
MIN_QUALITY = 0.26

# Cogroup bucketing: keyed Python logic runs once per BUCKET (vectorized
# inside), not once per key — sized so each Arrow batch fits executor memory.
COGROUP_BUCKETS = 64


# Shingle → benchmark-overlap aggregation CTE chain, shared by the
# contamination check's oracle and the decontamination (removal) oracle so
# both engines' flag sets provably agree.
CONTAM_AGG_CTES = f"""{T.duck_shingles_cte()},
    hv AS (
      SELECT doc_id, list_distinct({T.duck_shingle_hashes()}) AS hs FROM sh
    ),
    bench AS (
      SELECT DISTINCT unnest(hs) AS h FROM hv WHERE doc_id % {BENCH_MOD} = 0
    ),
    corpus AS (
      SELECT doc_id, unnest(hs) AS h FROM hv WHERE doc_id % {BENCH_MOD} <> 0
    ),
    agg AS (
      SELECT c.doc_id,
             COUNT(*) AS n_shingles,
             COUNT(b.h) AS n_contaminated
      FROM corpus c LEFT JOIN bench b USING (h)
      GROUP BY c.doc_id
    )"""


@query(
    "text_contamination_check",
    oracle=f"""
    WITH {CONTAM_AGG_CTES}
    SELECT doc_id, n_shingles, n_contaminated,
           ROUND(n_contaminated * 1.0 / n_shingles, 4) AS contamination_ratio,
           CAST(n_contaminated * 1.0 / n_shingles >= {CONTAM_FLAG_RATIO} AS INT)
               AS flagged
    FROM agg
    """,
    tags=("northstar", "pipeline", "text", "bench"),
)
def text_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: per corpus document, the fraction of
    its distinct 3-gram shingles that also occur anywhere in the held-out
    benchmark set (every ``BENCH_MOD``-th doc) — the n-gram-overlap decontam
    pass every pretraining pipeline runs against its eval suites.

    Scale shape: the benchmark's distinct shingle-hash set is bounded by
    *benchmark* size (eval suites are MBs, the corpus is TBs), so it
    broadcasts; the corpus side explodes to (doc_id, hash) and aggregates
    back map-side-partial — one narrow shuffle on doc_id, no corpus-side
    distinct. Hashes are the md5-32bit ints of functions/text.py (shared
    with MinHash), so the shingle text never rides the shuffle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ss = F.pandas_udf(T.shingle_sig_fn(1), "hs: array<bigint>, sig: array<bigint>")
    hv = docs.select("doc_id", ss("text").alias("ss")).select("doc_id", "ss.hs")
    bench = (
        hv.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select(F.explode("hs").alias("h"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus = hv.filter(F.col("doc_id") % BENCH_MOD != 0).select(
        "doc_id", F.explode("hs").alias("h")
    )
    agg = (
        corpus.join(F.broadcast(bench), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("hit").alias("n_contaminated"),
        )
    )
    ratio = F.col("n_contaminated") / F.col("n_shingles")
    return agg.select(
        "doc_id",
        "n_shingles",
        "n_contaminated",
        F.round(ratio, 4).alias("contamination_ratio"),
        (ratio >= CONTAM_FLAG_RATIO).cast("int").alias("flagged"),
    )


@query(
    "pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
      FROM t
    )
    SELECT doc_id, n_tokens,
           CAST(prev // {PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST(prev % {PACK_BUDGET} AS BIGINT) AS pack_offset
    FROM c
    """,
    tags=("northstar", "pipeline", "text", "bench"),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-and-chunk): documents are laid end-to-end in
    doc_id order and sliced into {PACK_BUDGET}-token context windows; each
    doc reports the pack it starts in and its offset inside that pack — the
    GPT-style packing map a tokenized-batch writer consumes.

    The recurrence is a global prefix sum, which a single window over a
    global ORDER BY would compute on ONE partition — the classic scale
    trap. Instead: two-phase distributed prefix sum. Docs fall into
    contiguous range buckets (``doc_id DIV {PACK_BUCKET}``); phase 1 runs
    the cumsum *within* each bucket in parallel (one hash shuffle); phase 2
    prefix-sums only the per-bucket totals (N/{PACK_BUCKET} rows — at 100 TB
    with ~10^10 docs that is ~10^7 tiny rows, the only single-partition
    pass) and broadcasts the bucket offsets back. Token counts stay
    integers end-to-end, so the sums are order-independent and
    cross-engine exact."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.expr(f"doc_id DIV {PACK_BUCKET}").alias("bucket"),
    )
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = t.withColumn(
        "local_prev", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    )
    totals = t.groupBy("bucket").agg(F.sum("n_tokens").alias("tot"))
    w_bucket = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "bucket", F.coalesce(F.sum("tot").over(w_bucket), F.lit(0)).alias("bucket_offset")
    )
    joined = local.join(F.broadcast(offsets), "bucket")
    prev = F.col("bucket_offset") + F.col("local_prev")
    return joined.select(
        "doc_id",
        "n_tokens",
        prev.alias("prev"),
    ).select(
        "doc_id",
        "n_tokens",
        F.expr(f"prev DIV {PACK_BUDGET}").alias("pack_id"),
        (F.col("prev") % PACK_BUDGET).alias("pack_offset"),
    )


def min_label_propagation(edges: DataFrame, max_rounds: int = 64):
    """Connected components by alternating LARGE-STAR / SMALL-STAR rounds
    (Kiveris et al. 2014, "Connected Components in MapReduce and Beyond")
    over a SYMMETRIC edge list ``(src, dst)``; nodes are the distinct
    ``src`` values (symmetry makes that every edge-touched node).

    One round = one large-star pass (every node hooks its larger neighbors
    onto its neighborhood minimum) followed by one small-star pass (every
    node hooks its not-larger neighbors and itself onto the minimum) —
    each a groupBy-min + join + distinct over the CURRENT edge set, which
    contracts geometrically. Convergence takes O(log n) rounds on any
    topology, vs the cluster DIAMETER for plain min-label propagation (a
    path graph needs diameter rounds under label-prop but log rounds
    here — the r5 verdict's 100 TB lever, where a long chain of near-dup
    docs would otherwise serialize the loop). Fixpoints of the alternation
    are star forests centered at component minima (the paper's invariant),
    so at convergence every edge IS the (node → component-min) label.

    Returns ``(labels, rounds)``: ``labels(node, comp)`` with ``comp`` the
    minimum node id of the node's component, and the number of
    large+small round pairs executed (pinned by tests/test_northstar.py::
    test_cc_clique_chain_labels_and_rounds, which requires BEATING the
    diameter bound on a chain). Per round there is exactly ONE eager
    materialization (``localCheckpoint`` of the round's output — also the
    lineage truncation) and one (count, distinct-source) aggregate over
    its blocks. Convergence is the star-forest test applied DIRECTLY:
    every node appears as source at most once (free from the per-round
    aggregate) and no center has an outgoing edge (one small semi-join,
    attempted only when the first condition holds). A star forest is
    itself a joint fixpoint of both passes, and the alternation preserves
    connectivity with centers below their members under the (hi → lo)
    canonical orientation — so the test needs no signature comparison
    across rounds and no confirm round: the loop stops the moment the
    stars form (one round earlier than a stability check would).
    Intermediate large-star output is ``persist()``-reused within the
    round (both the min table and the hook join read it), never
    separately materialized."""
    nodes = edges.select(F.col("src").alias("node")).distinct().localCheckpoint()
    # canonical directed (hi → lo) edge set; self-loops contribute nothing
    cur = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )

    def _stats(df):
        # one aggregate: edge count + the star-forest half-condition
        # (each source exactly once)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("u").alias("nd"),
        ).first()
        return row["n"], row["n"] == row["nd"]

    def _is_star_forest(df, one_edge_per_node):
        if not one_edge_per_node:
            return False
        # no center may have an outgoing edge
        return (
            df.alias("a")
            .join(df.alias("b"), F.col("a.v") == F.col("b.u"), "left_semi")
            .limit(1)
            .count()
            == 0
        )

    n0, one0 = _stats(cur)
    if n0 == 0:
        return nodes.select("node", F.col("node").alias("comp")), 0
    if _is_star_forest(cur, one0):
        labels = nodes.join(cur, nodes["node"] == cur["u"], "left").select(
            "node", F.coalesce("v", "node").alias("comp")
        )
        return labels, 0
    for rounds in range(1, max_rounds + 1):
        # LARGE-STAR: key every node u on its full neighborhood; hook each
        # larger neighbor v onto m = min(N(u) ∪ {u}). v > u ≥ m keeps the
        # (hi → lo) canonical orientation with no self-loops. No dedup
        # here — small-star's distinct absorbs duplicates one stage later.
        sym = cur.union(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        big_m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        ls = (
            sym.join(big_m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .persist()
        )
        # SMALL-STAR: key on the larger endpoint (ls is already hi → lo);
        # hook every smaller neighbor and u itself onto m = min(N(u) ∪ {u}).
        # groupBy-min + join, NOT a min-over-window: partial aggregation
        # pre-collapses hot star centers map-side and AQE splits skewed
        # probe keys — a window would pin a giant component's center to
        # one task.
        small_m = ls.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            ls.join(small_m, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(small_m.select("u", F.col("m").alias("v")))
            .distinct()
            .localCheckpoint()
        )
        ls.unpersist()
        _n, one_edge_per_node = _stats(ss)
        cur = ss
        if _is_star_forest(cur, one_edge_per_node):
            labels = nodes.join(cur, nodes["node"] == cur["u"], "left").select(
                "node", F.coalesce("v", "node").alias("comp")
            )
            return labels, rounds
    raise RuntimeError(f"connected components did not converge in {max_rounds} rounds")


@query(
    "dedup_cluster_components",
    oracle=f"""
    WITH RECURSIVE {MINHASH_PAIRS_CTES},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM verified
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM verified
    ),
    reach(node, c) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.c FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (
      SELECT node AS doc_id, MIN(c) AS component FROM reach GROUP BY node
    )
    SELECT doc_id, component,
           COUNT(*) OVER (PARTITION BY component) AS cluster_size,
           CAST(doc_id = component AS INT) AS is_canonical
    FROM comp
    """,
    tags=("northstar", "dedup", "graph", "bench"),
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup *cluster* identification: connected components over the
    MinHash-LSH verified pair edges, labeling every document with the
    minimum doc_id of its duplicate cluster — the step that turns pairwise
    near-dup hits into keep/drop decisions (keep the canonical, drop the
    rest). Pairwise output alone can't do this: near-dup is not transitive,
    but dedup policy must be (A≈B, B≈C ⇒ one cluster).

    Spark shape: iterative min-label propagation (the Pregel kernel),
    restricted to nodes that actually TOUCH an edge — every other document
    is trivially its own singleton component and never enters the loop, so
    per-round state is O(|near-dup set|), not O(|corpus|): at 100 TB the
    loop iterates over the (small) duplicate graph while the corpus is
    visited exactly once by the final left join. Per round: one join of the
    label table with the symmetrized edge list, a min-aggregate per
    destination, and a convergence count (the count per round is inherent
    to iterative CC; the whole loop executes at plan-BUILD time, so this
    query's bench timing includes it). Rounds are bounded by cluster
    *diameter*, tiny for near-dup clusters (cliques-ish by construction —
    LSH hits most pairs directly). ``localCheckpoint`` truncates lineage
    each round; superseded label tables are dropped each iteration (their
    checkpoint blocks are freed by Spark's ContextCleaner once
    dereferenced). At 100 TB: same loop with the alternating
    large-star/small-star optimization (Kiveris et al.) halves round count.

    The DuckDB oracle computes the same fixpoint declaratively with a
    recursive CTE (min reachable id per node), so the iterative engine is
    checked against a closed-form ground truth."""
    pairs = minhash_verified_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.union(pairs.select(F.col("doc_b"), F.col("doc_a")))
        .toDF("src", "dst")
        .persist()
    )
    labels, _rounds = min_label_propagation(edges)
    edges.unpersist()
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # labels is the near-dup node set. It is dup-density-bounded — a
    # FRACTION of the corpus, which still grows linearly with data — so a
    # forced broadcast (r14) would OOM the driver at scale with no
    # automatic fallback (a hint has none). Un-hinted, the size gate is
    # mechanical: the planner/AQE broadcasts from measured runtime stats
    # when the label table is genuinely small, and falls back to the
    # doc_id co-shuffle when it is not (VERDICT r14 item 1).
    comp = docs.join(
        labels, docs["doc_id"] == labels["node"], "left"
    ).select("doc_id", F.coalesce("comp", "doc_id").alias("component"))
    w = Window.partitionBy("component")
    return comp.select(
        "doc_id",
        "component",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        (F.col("doc_id") == F.col("component")).cast("int").alias("is_canonical"),
    )


@query(
    "sample_stratified_by_lang",
    oracle="""
    WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
    m AS (SELECT MIN(cnt) AS mincnt FROM c)
    SELECT d.doc_id, d.lang
    FROM documents d JOIN c USING (lang) CROSS JOIN m
    WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT * c.cnt
          < m.mincnt * 4294967296
    """,
    tags=("northstar", "pipeline", "sampling", "bench"),
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: down-sample every language to the
    size of the rarest one (expected), the class-balancing pass of corpus
    curation. Membership is a pure function of doc_id — md5-uniform u32
    compared against the per-language rate — so the sample is reproducible
    across engines, runs, and cluster sizes (no RNG, no seed plumbing, and
    re-runs on grown corpora keep previously-sampled docs stable modulo the
    rate change).

    The comparison is integer-exact: ``hash_u32 · lang_count <
    min_count · 2^32`` avoids the float division both engines would round
    differently. Scale: per-language counts are a tiny aggregate
    (broadcast); the filter is map-side — zero shuffle on the corpus."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
    mincnt = counts.agg(F.min("cnt").alias("mincnt"))
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    return (
        docs.join(F.broadcast(counts), "lang")
        .crossJoin(F.broadcast(mincnt))
        .filter(h * F.col("cnt") < F.col("mincnt") * F.lit(4294967296))
        .select("doc_id", "lang")
    )


@query(
    "pipeline_quality_filter",
    oracle=f"""
    WITH {MINHASH_PAIRS_CTES},
    dupset AS (SELECT DISTINCT doc_b AS doc_id FROM verified),
    feat AS (
      SELECT doc_id, len(toks) AS n_tokens,
             len(list_distinct(toks)) * 1.0 / len(toks) AS ttr,
             len([x for x in toks if list_contains(['the','a','of','and','to','in'], x)])
                 * 1.0 / len(toks) AS stop_ratio
      FROM tok
    )
    SELECT f.doc_id,
           CASE WHEN d.doc_id IS NOT NULL THEN 'near_duplicate'
                WHEN f.n_tokens < {MIN_TOKENS} THEN 'too_short'
                WHEN f.n_tokens > {MAX_TOKENS} THEN 'too_long'
                WHEN ROUND(0.5 * f.ttr + 0.3 * f.stop_ratio
                           + 0.2 * LEAST(f.n_tokens / 256.0, 1.0), 4)
                     < {MIN_QUALITY} THEN 'low_quality'
                ELSE 'kept' END AS reason,
           CAST(d.doc_id IS NULL AND f.n_tokens >= {MIN_TOKENS}
                AND f.n_tokens <= {MAX_TOKENS}
                AND ROUND(0.5 * f.ttr + 0.3 * f.stop_ratio
                          + 0.2 * LEAST(f.n_tokens / 256.0, 1.0), 4)
                    >= {MIN_QUALITY} AS INT) AS keep
    FROM feat f LEFT JOIN dupset d ON f.doc_id = d.doc_id
    """,
    tags=("northstar", "pipeline", "bench"),
)
def pipeline_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pre-training filter: near-dup removal (MinHash-LSH
    verified pairs, keep the lower doc_id), token-length gates, and the
    heuristic quality score — one pass emitting keep/reject with the first
    failing reason, the audit record a curation pipeline must produce.

    Composition is the point: the dup set comes from the same
    ``minhash_verified_pairs`` pipeline as the dedup queries, the quality
    formula is ``text_quality_score``'s (identical literals), and the
    gates run as one Catalyst projection + one left join on doc_id. The
    dup-id set is dup-density-bounded — a fraction of the corpus that still
    grows linearly with data — so it carries NO broadcast hint (a hint has
    no fallback and would OOM at scale, VERDICT r14 item 1): AQE broadcasts
    it from measured runtime stats when it is genuinely small and keeps the
    doc_id co-shuffle otherwise — everything else stays map-side."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dupset = (
        minhash_verified_pairs(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in ("the", "a", "of", "and", "to", "in")])
    feat = docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("ttr"),
        (F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))) / F.size(toks)).alias(
            "stop_ratio"
        ),
    )
    qs = F.round(
        0.5 * F.col("ttr")
        + 0.3 * F.col("stop_ratio")
        + 0.2 * F.least(F.col("n_tokens") / 256.0, F.lit(1.0)),
        4,
    )
    merged = feat.join(dupset, "doc_id", "left")
    return merged.select(
        "doc_id",
        F.when(F.col("is_dup").isNotNull(), "near_duplicate")
        .when(F.col("n_tokens") < MIN_TOKENS, "too_short")
        .when(F.col("n_tokens") > MAX_TOKENS, "too_long")
        .when(qs < MIN_QUALITY, "low_quality")
        .otherwise("kept")
        .alias("reason"),
        (
            F.col("is_dup").isNull()
            & (F.col("n_tokens") >= MIN_TOKENS)
            & (F.col("n_tokens") <= MAX_TOKENS)
            & (qs >= MIN_QUALITY)
        )
        .cast("int")
        .alias("keep"),
    )


@query(
    "cogroup_order_reconciliation",
    oracle="""
    WITH li AS (
      SELECT l_orderkey,
             COUNT(*) AS n_items,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS li_sum_cents
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderkey,
           CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS o_total_cents,
           COALESCE(li.n_items, 0) AS n_items,
           COALESCE(li.li_sum_cents, 0) AS li_sum_cents,
           CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)
               - COALESCE(li.li_sum_cents, 0) AS diff_cents
    FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey
    """,
    tags=("extension", "cogroup", "bench"),
)
def cogroup_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KGroupedStream.cogroup analogue: two keyed relations co-shuffled once
    and processed in a single Arrow-batched function
    (``groupBy().cogroup().applyInPandas``) — here reconciling each order's
    header total against the sum of its line items.

    This aggregate IS expressible as a join-of-aggs (the oracle does
    exactly that), and a production pipeline should prefer that Catalyst
    form; cogroup is the general surface for per-key logic the built-ins
    can't express (sessionized merges, per-key model scoring, ordered
    diffing) — the plumbing under test is the co-partitioned two-sided
    shuffle and the Arrow batch shape.

    Scale shape: the cogroup key is a BUCKET of {COGROUP_BUCKETS} hash
    cells, not the raw order key. Cogrouping on the raw key invokes the
    Python function once per key — ~150k interpreter round trips at sf0.1
    (measured 42 s); bucketing it invokes it {COGROUP_BUCKETS} times with
    ~1/{COGROUP_BUCKETS} of each relation per Arrow batch and does the
    per-key work vectorized in pandas (measured sub-second — ~70× faster).
    Per-key semantics are unchanged (orders of one key land in exactly one
    bucket). At 100 TB the bucket count scales with data volume so each
    Arrow batch stays executor-memory-sized; this is the general recipe for
    keyed Python logic over high-cardinality keys. Cents are floored per
    row before the integer sum, so the result is order-independent and
    matches the oracle bit-for-bit."""
    import numpy as np
    import pandas as pd

    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .withColumn("bucket", F.pmod("o_orderkey", F.lit(COGROUP_BUCKETS)))
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_extendedprice")
        .withColumn("bucket", F.pmod("l_orderkey", F.lit(COGROUP_BUCKETS)))
    )

    def recon(key: tuple, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:
            # lineitem buckets whose orders are absent: not part of the
            # oracle's orders-driven contract (cannot happen under TPC-H FK
            # integrity). Explicit int64 dtypes: a default empty frame is
            # object-typed and would fail the Arrow cast to the long schema.
            return pd.DataFrame(
                {
                    c: pd.Series(dtype="int64")
                    for c in (
                        "o_orderkey",
                        "o_total_cents",
                        "n_items",
                        "li_sum_cents",
                        "diff_cents",
                    )
                }
            )
        res = pd.DataFrame(
            {
                "o_orderkey": left["o_orderkey"].to_numpy(dtype=np.int64),
                "o_total_cents": np.floor(
                    left["o_totalprice"].to_numpy(dtype=np.float64) * 100 + 0.5
                ).astype(np.int64),
            }
        )
        if len(right):
            cents = np.floor(
                right["l_extendedprice"].to_numpy(dtype=np.float64) * 100 + 0.5
            ).astype(np.int64)
            agg = (
                pd.DataFrame(
                    {"k": right["l_orderkey"].to_numpy(dtype=np.int64), "c": cents}
                )
                .groupby("k", sort=False)["c"]
                .agg(n_items="size", li_sum_cents="sum")
            )
            res = res.merge(agg, left_on="o_orderkey", right_index=True, how="left")
            res["n_items"] = res["n_items"].fillna(0).astype(np.int64)
            res["li_sum_cents"] = res["li_sum_cents"].fillna(0).astype(np.int64)
        else:
            res["n_items"] = np.int64(0)
            res["li_sum_cents"] = np.int64(0)
        res["diff_cents"] = res["o_total_cents"] - res["li_sum_cents"]
        return res

    return (
        orders.groupBy("bucket")
        .cogroup(li.groupBy("bucket"))
        .applyInPandas(
            recon,
            "o_orderkey long, o_total_cents long, n_items long, "
            "li_sum_cents long, diff_cents long",
        )
    )


@query(
    "decontaminate_corpus",
    oracle=f"""
    WITH {CONTAM_AGG_CTES}
    SELECT d.doc_id, d.lang, d.source,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
    FROM documents d JOIN agg USING (doc_id)
    WHERE n_contaminated * 1.0 / n_shingles < {CONTAM_FLAG_RATIO}
    """,
    tags=("northstar", "pipeline", "text", "bench"),
)
def decontaminate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination — the REMOVAL step on top of the contamination check:
    the surviving training manifest (doc_id, lang, source, token count) after
    dropping every corpus document whose benchmark shingle overlap reaches
    ``CONTAM_FLAG_RATIO`` (benchmark members themselves never enter the
    manifest). ``text_contamination_check`` is the audit report; THIS is the
    pass whose output feeds the tokenizer.

    Spark shape: composes the check verbatim (same broadcast
    benchmark-shingle set, same one narrow corpus shuffle), then one
    co-shuffled inner join back to the documents scan projecting only the
    manifest columns — the flag side carries (doc_id, flagged) alone. At
    100 TB the join keys on doc_id with no skew (one row per doc each
    side), and the manifest projection prunes ``text`` from the output
    scan."""
    flags = text_contamination_check(spark, sf_dir).select("doc_id", "flagged")
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.join(flags, "doc_id")
        .filter(F.col("flagged") == 0)
        .select(
            "doc_id",
            "lang",
            "source",
            F.size(T.tokens("text")).cast("bigint").alias("n_tokens"),
        )
    )


PAGERANK_ITERS = 3
PR_SCALE = 1_000_000  # PageRank mass on a 1e-6 integer grid
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as an exact rational
PPR_SEED_MOD = 50  # personalized teleport set: part_id % 50 == 0


def _copurchase_degreed_edges(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Persisted degreed edge table (src, dst, d) of the part co-purchase
    graph PLUS the persisted |nodes|-row degree table (src, d) — shared by
    the PageRank family. Edge build: ONE scan + ONE orderkey shuffle into
    per-order part sets (collect_set dedups within the order), pairs
    expanded by chained explodes — measurably cheaper than the orderkey
    self-join (which scans lineitem twice and sorts both sides); per-order
    set size is bounded by order width (≤7 in TPC-H), so no explode blowup.
    The degree table attaches by broadcast (no edge re-shuffle; same
    >10^8-node flip as the rank vector).

    Returning ``deg`` lets callers derive their node/seed sets from the
    |nodes|-row aggregate instead of re-running DISTINCT over the |E|-row
    edge list (r14: one full exchange removed from each of pagerank/PPR).
    Only the small tables are persisted; the degreed join is a map-side
    broadcast probe over the cached edge list, so materializing it bought
    nothing but a second |E|-row cache write (r14 measurement)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e = (
        li.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
        .select(F.explode("parts").alias("src"), "parts")
        .select("src", F.explode("parts").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d")).persist()
    return e.join(F.broadcast(deg), "src"), deg

_PR_ITER_SQL = """
    {out} AS (
      SELECT e.dst AS node,
             CAST({base} + (SUM({prev}.pr // deg.d) * {dnum}) // {dden} AS BIGINT) AS pr
      FROM e JOIN {prev} ON e.src = {prev}.node JOIN deg ON e.src = deg.src
      GROUP BY e.dst
    )"""


def _pagerank_oracle() -> str:
    base = PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN  # 150000
    its = ",".join(
        _PR_ITER_SQL.format(
            out=f"it{i + 1}",
            prev=("pr0" if i == 0 else f"it{i}"),
            base=base,
            dnum=PR_DAMP_NUM,
            dden=PR_DAMP_DEN,
        )
        for i in range(PAGERANK_ITERS)
    )
    return f"""
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
    pr0 AS (
      SELECT DISTINCT src AS node, CAST({PR_SCALE} AS BIGINT) AS pr FROM e
    ),
    {its}
    SELECT node AS part_id, pr AS pagerank_e6 FROM it{PAGERANK_ITERS}
    """


@query(
    "graph_copurchase_pagerank",
    oracle=_pagerank_oracle(),
    tags=("northstar", "graph", "iterative", "bench"),
)
def graph_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph (parts sharing an order are
    neighbors) — the canonical iterative graph computation, and the
    centrality signal a recommender / curation pass ranks items by. Three
    damped iterations on an EXACT integer grid: mass lives in 1e-6 units,
    per-edge contributions are BIGINT floor-division ``pr div deg``, and the
    damping is the rational 85/100 applied with integer multiply-then-divide
    — every iteration is bit-equal across engines and partition counts (the
    float formulation would drift with summation order; the grid is the same
    exact-fold stance as LP_GRID and the Zipf fit).

    Spark shape: the edge list (distinct, both directions, built from
    per-order part sets in one scan + one orderkey shuffle, pair expansion
    bounded by order width) is JOINED ONCE with the broadcast out-degree
    table and persisted — each iteration is then one
    broadcast-able join of the |nodes|-row rank vector against the
    persisted edge table plus one dst-keyed shuffle with map-side partial
    sums. Fixed 3 iterations ⇒ lineage stays shallow (no checkpoint
    needed; the open-ended CC loop next door uses ``localCheckpoint``).
    At 100 TB this is exactly Pregel-on-DataFrames: per-iteration cost =
    one co-partitioned join + one aggregate keyed on node, skew bounded by
    max co-purchase degree (salt hot nodes with the agg_salted_skew recipe
    if a product goes viral). Isolated parts (never co-purchased) carry no
    edges and are excluded — document-level choice matching the oracle."""
    ed, deg = _copurchase_degreed_edges(spark, sf_dir)
    # pr0 = every node with an out-edge — exactly deg's key set, already
    # aggregated and persisted; the former DISTINCT over the |E|-row edge
    # list paid a full exchange for the same relation (guide §2.4).
    pr = deg.select(
        F.col("src").alias("node"), F.lit(PR_SCALE).cast("bigint").alias("pr")
    )
    base = PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    for _ in range(PAGERANK_ITERS):
        # The rank vector is |nodes| rows — broadcast it against the
        # persisted edge table (a derived aggregate, so Catalyst's size
        # estimate would pick SMJ and re-shuffle BOTH sides every
        # iteration). Above broadcast budget (~10^8 nodes) flip this one
        # hint to a co-partitioned shuffle join — the Pregel default.
        pr = (
            ed.join(F.broadcast(pr), ed["src"] == pr["node"])
            .select("dst", F.expr("pr div d").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
            .select(
                F.col("dst").alias("node"),
                F.expr(f"cast({base} + (s * {PR_DAMP_NUM}) div {PR_DAMP_DEN} as bigint)").alias(
                    "pr"
                ),
            )
        )
    return pr.select(F.col("node").alias("part_id"), F.col("pr").alias("pagerank_e6"))


# Triangle counting runs on the SUPPORT-thresholded co-purchase graph: keep
# an edge only when the two parts co-occur in >= TRI_MIN_SUPPORT distinct
# orders. On a random co-purchase graph the raw edge set is near-complete
# (sf0.01: 115k edges over 2k parts) and the wedge set — the quadratic
# middle of any triangle algorithm — blows up as sum(deg^2); the support
# threshold is the standard association-rule prune (a one-off co-purchase
# is noise, not affinity) and collapses the graph to the ~3% of edges with
# repeat evidence before any pairing happens.
TRI_MIN_SUPPORT = 2


def _support_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support-thresholded co-purchase edges, oriented ``s < t`` and
    PERSISTED — the shared graph substrate of ``graph_triangle_count`` and
    ``graph_related_parts_jaccard`` (one scan, one orderkey shuffle into
    per-order part sets, in-set pair expansion bounded by order width,
    one pair-keyed count with map-side partials)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return (
        li.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
        .select(F.explode("parts").alias("s"), "parts")
        .select("s", F.explode("parts").alias("t"))
        .filter(F.col("s") < F.col("t"))
        .groupBy("s", "t")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= TRI_MIN_SUPPORT)
        .select("s", "t")
        .persist()
    )


# CTE chain ending in deg(part_id, degree) + node_tri(part_id, n) over the
# support graph — shared verbatim by the triangle-count and
# clustering-coefficient oracles so the two engines' (and two queries')
# triangle enumerations provably agree.
TRI_DEG_CTES = f"""
    e AS (
      SELECT a.l_partkey AS s, b.l_partkey AS t
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(DISTINCT a.l_orderkey) >= {TRI_MIN_SUPPORT}
    ),
    tri AS (
      SELECT e1.s AS a, e1.t AS b, e2.t AS c
      FROM e e1
      JOIN e e2 ON e2.s = e1.t
      JOIN e e3 ON e3.s = e1.s AND e3.t = e2.t
    ),
    node_tri AS (
      SELECT x AS part_id, COUNT(*) AS n FROM (
        SELECT a AS x FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY 1
    ),
    deg AS (
      SELECT x AS part_id, COUNT(*) AS degree FROM (
        SELECT s AS x FROM e UNION ALL SELECT t FROM e
      ) GROUP BY 1
    )"""


def node_triangle_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(part_id, degree, n_triangles) over the support graph — the shared
    Spark substrate of ``graph_triangle_count`` and
    ``graph_clustering_coefficient``.

    Wedges form under the DEGREE ORIENTATION (Suri & Vassilvitskii 2011,
    "Counting Triangles and the Curse of the Last Reducer",
    MR-Node-Iterator++): every undirected edge points from its lower-rank
    to its higher-rank endpoint, rank = (degree, part_id) — ties broken by
    the unique node id so the order is total. Each triangle {x, y, z} with
    rank(x) < rank(y) < rank(z) then materializes EXACTLY once: as the
    wedge centered at x (x's two out-edges x→y, x→z, pair ordered by rank)
    closed by the oriented edge y→z. Same output as the plain node-id
    ordering this replaces — the oracle CTE chain (``TRI_DEG_CTES``) is
    unchanged and pins equality.

    Why it scales where id-ordering doesn't: a node's wedge fan-out is
    C(outdeg, 2), and under degree orientation max outdeg is O(√|E|)
    (every out-neighbor has rank ≥ the center's, so a node of out-degree k
    forces k nodes of degree ≥ k) even on power-law graphs where a raw hub
    degree is O(|V|). The wedge set drops from Σ deg² to O(|E|^1.5)
    worst-case — the difference between one stuck hub reducer and a
    balanced shuffle at 100 TB. Plan: one persisted edge materialization
    (degrees + two wedge legs + closing probe all read it); the
    |nodes|-row degree table broadcasts onto both endpoints to orient
    map-side (co-shuffle above broadcast budget); the wedge join keys on
    the center, the closing probe on the ordered (b, c) pair — both
    co-partitioned shuffles with map-side partial counts. The rank carries
    as (d_hi, hi) ints on each oriented edge so pair-ordering inside a
    wedge needs no extra degree join.

    Measured trade at sf0.1 (quiet-machine, min-of-2, the SNM
    checkpoint-vs-recompute precedent — VERDICT r10 item 3): identical
    post-orientation code measured 1.63 s (r11 full-bench run), 2.51 s
    (r11 targeted run), and 2.86 s (r10 driver run) against 1.46 s under
    r9's plain id-ordering — i.e. the orientation's fixed overhead on the
    small support graph is real but SMALLER than the per-run variance
    (≈0.2–1.4 s depending on JIT/page-cache warmth; sub-second precision
    is unattainable on this box — README documents the 169.7–219.7 s
    same-binary span for the full map). Pure overhead at this scale —
    sf0.1's hubs are too small for the Σ deg² term to bite — and exactly
    the price paid for the O(|E|^1.5) wedge bound that keeps the last
    reducer unstuck on a power-law graph at 100 TB."""
    e = _support_edges(spark, sf_dir)
    # Persisted: the |nodes|-row degree table feeds BOTH orientation
    # broadcasts and the final join — without it Spark re-aggregates the
    # edge table once per reference (measured 2x on the sf0.1 bench).
    deg = (
        e.select(F.explode(F.array("s", "t")).alias("part_id"))
        .groupBy("part_id")
        .agg(F.count(F.lit(1)).alias("degree"))
        .persist()
    )
    ds = deg.select(F.col("part_id").alias("s"), F.col("degree").alias("d_s"))
    dt = deg.select(F.col("part_id").alias("t"), F.col("degree").alias("d_t"))
    s_first = (F.col("d_s") < F.col("d_t")) | (
        (F.col("d_s") == F.col("d_t")) & (F.col("s") < F.col("t"))
    )
    # Persisted: the oriented edge list is read three times (two wedge legs
    # + the closing probe); materializing it once keeps the orientation
    # broadcasts out of the per-leg pipelines. |E| rows of three ints.
    oriented = (
        e.join(F.broadcast(ds), "s")
        .join(F.broadcast(dt), "t")
        .select(
            F.when(s_first, F.col("s")).otherwise(F.col("t")).alias("lo"),
            F.when(s_first, F.col("t")).otherwise(F.col("s")).alias("hi"),
            F.when(s_first, F.col("d_t")).otherwise(F.col("d_s")).alias("d_hi"),
        )
        .persist()
    )
    w1 = oriented.select(
        F.col("lo").alias("a"), F.col("hi").alias("b"), F.col("d_hi").alias("d_b")
    )
    w2 = oriented.select(
        F.col("lo").alias("a"), F.col("hi").alias("c"), F.col("d_hi").alias("d_c")
    )
    b_first = (F.col("d_b") < F.col("d_c")) | (
        (F.col("d_b") == F.col("d_c")) & (F.col("b") < F.col("c"))
    )
    tri = (
        w1.join(w2, "a")
        .filter(b_first)
        .select("a", "b", "c")
        .join(oriented.select(F.col("lo").alias("b"), F.col("hi").alias("c")), ["b", "c"])
        .select("a", "b", "c")
    )
    node_tri = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("part_id"))
        .groupBy("part_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return deg.join(node_tri, "part_id", "left").select(
        "part_id", "degree", F.coalesce("n", F.lit(0)).alias("n_triangles")
    )


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH {{TRI_DEG_CTES}}
    SELECT d.part_id, d.degree, COALESCE(node_tri.n, 0) AS n_triangles
    FROM deg d LEFT JOIN node_tri USING (part_id)
    """.format(TRI_DEG_CTES=TRI_DEG_CTES),
    tags=("northstar", "graph", "bench"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counting over the support-thresholded co-purchase
    graph — the clustering/community signal (a part in many triangles sits
    in a dense co-purchase pocket) next to PageRank's centrality signal,
    and the second canonical graph computation a curation pipeline runs on
    item graphs.

    Spark shape: edges build exactly like ``graph_copurchase_pagerank``
    (one scan → per-order part sets → in-set pair expansion, bounded by
    order width) but canonicalized ``s < t`` and support-filtered, then
    persisted — the edge table is read for degrees, both wedge sides, and
    the closing probe off one materialization. Counting is the
    DEGREE-ORIENTED wedge-close join (Suri & Vassilvitskii
    MR-Node-Iterator++, see ``node_triangle_degrees``): each edge points
    low-rank→high-rank by (degree, id), each triangle materializes exactly
    once at its lowest-rank corner, and per-node wedge fan-out is bounded
    by C(outdeg, 2) with outdeg ≤ O(√|E|) — so power-law hubs cannot
    produce a stuck last reducer. Both joins key on edge endpoints —
    co-partitioned shuffles, map-side partial counts. Support raises with
    scale (affinity needs more evidence in bigger data), keeping |E|
    sub-quadratic by construction."""
    return node_triangle_degrees(spark, sf_dir)


# Related-items similarity needs a common-neighbor floor for the same
# reason triangles need edge support: one shared neighbor is noise on a
# dense co-occurrence graph.
RELATED_MIN_COMMON = 2


@query(
    "graph_related_parts_jaccard",
    oracle=f"""
    WITH e AS (
      SELECT a.l_partkey AS s, b.l_partkey AS t
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(DISTINCT a.l_orderkey) >= {TRI_MIN_SUPPORT}
    ),
    adj AS (SELECT s AS v, t AS u FROM e UNION ALL SELECT t, s FROM e),
    deg AS (SELECT u, COUNT(*) AS d FROM adj GROUP BY u),
    cn AS (
      SELECT a1.u AS part_a, a2.u AS part_b, COUNT(*) AS common
      FROM adj a1 JOIN adj a2 ON a1.v = a2.v AND a1.u < a2.u
      GROUP BY 1, 2 HAVING COUNT(*) >= {RELATED_MIN_COMMON}
    )
    SELECT cn.part_a, cn.part_b, cn.common,
           CAST(cn.common * 1000000 // (da.d + db.d - cn.common) AS BIGINT)
               AS jaccard_ppm
    FROM cn
    JOIN deg da ON da.u = cn.part_a
    JOIN deg db ON db.u = cn.part_b
    """,
    tags=("northstar", "graph", "similarity", "bench"),
)
def graph_related_parts_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Related-items mining: part pairs ranked by neighborhood Jaccard
    |N(a)∩N(b)| / |N(a)∪N(b)| on the support-thresholded co-purchase graph
    — the item-item collaborative-filtering signal ("customers who bought
    X also bought the things Y's buyers bought") that complements direct
    co-purchase edges with second-order structure. Exact integer ppm — no
    float division.

    Spark shape: SHARES the persisted ``_support_edges`` materialization
    with ``graph_triangle_count``; the common-neighbor count is one
    center-keyed self-join over the doubled adjacency followed by a
    pair-keyed count with map-side partials; degrees attach via two joins
    against the |nodes|-row degree table (broadcast-sized here; co-shuffle
    above broadcast budget). Unlike the triangle substrate, the
    degree-orientation prune does NOT apply here: every common neighbor
    is evidence the output must witness, so the full Σ deg² wedge set IS
    the answer's support — the scale levers are the support prune (which
    bounds degrees before any pairing) and the salted-agg recipe for
    residual hub centers."""
    e = _support_edges(spark, sf_dir)
    adj = e.select(F.col("s").alias("v"), F.col("t").alias("u")).unionAll(
        e.select(F.col("t").alias("v"), F.col("s").alias("u"))
    )
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    cn = (
        adj.select(F.col("v"), F.col("u").alias("part_a"))
        .join(adj.select("v", F.col("u").alias("part_b")), "v")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("common"))
        .filter(F.col("common") >= RELATED_MIN_COMMON)
    )
    da = deg.select(F.col("u").alias("part_a"), F.col("d").alias("da"))
    db = deg.select(F.col("u").alias("part_b"), F.col("d").alias("db"))
    return (
        cn.join(F.broadcast(da), "part_a")
        .join(F.broadcast(db), "part_b")
        .select(
            "part_a",
            "part_b",
            "common",
            F.expr("cast(common * 1000000 div (da + db - common) as bigint)").alias(
                "jaccard_ppm"
            ),
        )
    )


@query(
    "pipeline_expectation_checks",
    oracle="""
    SELECT 'orders_custkey_fk' AS check_name,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_checked,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS n_violations
    UNION ALL
    SELECT 'lineitem_orderkey_fk',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'lineitem_price_nonneg',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
             WHERE l_extendedprice < 0 OR l_extendedprice IS NULL)
    UNION ALL
    SELECT 'customer_custkey_unique',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM customer),
           (SELECT CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) FROM
             (SELECT COUNT(*) AS c FROM customer GROUP BY c_custkey) t
             WHERE c > 1)
    UNION ALL
    SELECT 'documents_text_nonempty',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
             WHERE text IS NULL OR length(text) = 0)
    UNION ALL
    SELECT 'events_value_present',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM events),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM events WHERE value IS NULL)
    """,
    tags=("northstar", "pipeline", "quality", "bench"),
)
def pipeline_expectation_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-Expectations/dbt-test-style data-validation report: one row
    per expectation — referential integrity (orders→customer,
    lineitem→orders orphans), uniqueness (customer key), domain rules
    (non-negative prices, non-empty text, non-null values) — with checked
    and violation counts. This is the contract gate a pipeline runs on
    every ingest BEFORE any curation operator consumes the batch; the
    dedup/quality/mixture stages above all assume these invariants.

    Spark shape (r14 rewrite): ONE scan per checked table, fully lazy. The
    former form ran 13 sequential driver actions (a .count()/.first() pair
    per expectation — 33 Spark jobs, every one a blocking driver round
    trip, guide §5/§2.6); now each fact table contributes a single
    conditional aggregate — the FK checks ride the same pass as their
    table's domain rules via a left join against the DISTINCT broadcast
    key set (distinct guarantees the join cannot duplicate fact rows, so
    n_checked stays COUNT(*); a missing match IS the violation, same set
    the left-anti counted) — and the six one-row aggregates union into one
    deferred plan whose independent stages the scheduler overlaps. At
    100 TB each check is still one scan-bound pass. The FK key sets
    (customer keys, orders keys) scale linearly with the corpus, so they
    carry NO broadcast hint (ADVICE r14: a hint has no fallback and OOMs
    above budget): AQE broadcasts them from measured runtime stats when
    small, else the key-partitioned co-shuffle stands. Violation sums are
    coalesced to 0 so an empty checked table reports 0 violations (the
    oracle's COUNT(*) semantics), not NULL. The report shape (name,
    checked, violations) is what lands in the run's quality dashboard."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    docs = load_table(spark, sf_dir, "documents")
    events = load_table(spark, sf_dir, "events")

    def report(name, n_checked, n_violations):
        return [
            F.lit(name).alias("check_name"),
            n_checked.cast("bigint").alias("n_checked"),
            n_violations.cast("bigint").alias("n_violations"),
        ]

    def viol(cond):
        # COALESCE: SUM over an empty table is NULL; the oracle's COUNT(*)
        # (and the pre-r14 .count() form) reports 0 (ADVICE r14).
        return F.coalesce(F.sum(cond.cast("long")), F.lit(0))

    orders_fk = orders.join(
        cust.select("c_custkey").distinct(),
        orders["o_custkey"] == F.col("c_custkey"),
        "left",
    ).agg(
        *report(
            "orders_custkey_fk",
            F.count(F.lit(1)),
            viol(F.col("c_custkey").isNull()),
        )
    )
    # lineitem: FK orphan check and the price domain rule share one pass.
    li_joined = li.join(
        orders.select("o_orderkey").distinct(),
        li["l_orderkey"] == F.col("o_orderkey"),
        "left",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        viol(F.col("o_orderkey").isNull()).alias("fk_viol"),
        viol(
            (F.col("l_extendedprice") < 0) | F.col("l_extendedprice").isNull()
        ).alias("price_viol"),
    )
    # Both lineitem report rows explode out of the ONE single-row aggregate
    # (rather than two selects over it, which would leave the scan's
    # re-execution to exchange-reuse luck).
    li_checks = li_joined.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("lineitem_orderkey_fk").alias("check_name"),
                    F.col("n").cast("bigint").alias("n_checked"),
                    F.col("fk_viol").cast("bigint").alias("n_violations"),
                ),
                F.struct(
                    F.lit("lineitem_price_nonneg").alias("check_name"),
                    F.col("n").cast("bigint").alias("n_checked"),
                    F.col("price_viol").cast("bigint").alias("n_violations"),
                ),
            )
        ).alias("r")
    ).select("r.*")
    cust_unique = (
        cust.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            *report(
                "customer_custkey_unique",
                F.coalesce(F.sum("c"), F.lit(0)),
                F.coalesce(
                    F.sum(F.when(F.col("c") > 1, F.col("c") - 1)), F.lit(0)
                ),
            )
        )
    )
    docs_nonempty = docs.agg(
        *report(
            "documents_text_nonempty",
            F.count(F.lit(1)),
            viol(F.col("text").isNull() | (F.length("text") == 0)),
        )
    )
    events_present = events.agg(
        *report(
            "events_value_present",
            F.count(F.lit(1)),
            viol(F.col("value").isNull()),
        )
    )
    return (
        orders_fk.unionByName(li_checks)
        .unionByName(cust_unique)
        .unionByName(docs_nonempty)
        .unionByName(events_present)
    )


_PPR_ITER_SQL = """
    {out} AS (
      SELECT COALESCE(c.node, s.node) AS node,
             CAST(COALESCE(c.m, 0) + COALESCE(s.b, 0) AS BIGINT) AS pr
      FROM (
        SELECT e.dst AS node,
               (SUM({prev}.pr // deg.d) * {dnum}) // {dden} AS m
        FROM e JOIN {prev} ON e.src = {prev}.node JOIN deg ON e.src = deg.src
        GROUP BY e.dst
      ) c FULL OUTER JOIN seeds s ON c.node = s.node
    )"""


def _ppr_oracle() -> str:
    base = PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN  # 150000
    its = ",".join(
        _PPR_ITER_SQL.format(
            out=f"it{i + 1}",
            prev=("pr0" if i == 0 else f"it{i}"),
            dnum=PR_DAMP_NUM,
            dden=PR_DAMP_DEN,
        )
        for i in range(PAGERANK_ITERS)
    )
    return f"""
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
    seeds AS (
      SELECT DISTINCT src AS node, CAST({base} AS BIGINT) AS b FROM e
      WHERE src % {PPR_SEED_MOD} = 0
    ),
    pr0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS pr FROM seeds),
    {its}
    SELECT node AS part_id, pr AS ppr_e6 FROM it{PAGERANK_ITERS} WHERE pr > 0
    """


@query(
    "graph_personalized_pagerank",
    oracle=_ppr_oracle(),
    tags=("northstar", "graph", "iterative", "bench"),
)
def graph_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from a seed set — the neighborhood-relevance
    score recommenders and graph-based retrieval rank by ("items related to
    THESE products", the random walk that restarts at the seeds instead of
    everywhere). Teleport mass lands ONLY on the seed parts
    (part_id % PPR_SEED_MOD = 0); after 3 damped iterations mass has
    diffused ≤3 hops, so the output is the seeds' relevance neighborhood —
    nodes the walk never reached carry nothing and drop (pr > 0 in both
    engines). Same exact 1e-6 integer grid, BIGINT floor-division
    contributions, and 85/100 rational damping as
    ``graph_copurchase_pagerank``: iterations are bit-equal across engines
    and partition counts.

    Spark shape: SHARES the persisted degreed edge table
    (``_copurchase_degreed_edges``); per iteration = one broadcast of the
    (sparse!) rank vector against the edges, one dst-keyed partial-sum
    shuffle, and a full-outer merge with the broadcast seed teleports —
    the sparse-frontier Pregel shape, and the reason PPR is CHEAPER than
    global PageRank at scale: the rank vector starts |seeds|-sized and
    only grows with the reached neighborhood, not |V|. At 10^8+ nodes the
    broadcast flips to a co-partitioned join exactly as documented on the
    global variant."""
    ed, deg = _copurchase_degreed_edges(spark, sf_dir)
    base = PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    # Seed set from the persisted |nodes|-row degree table — the former
    # DISTINCT over the |E|-row edge list paid a full exchange (guide §2.4).
    seeds = (
        deg.filter(F.col("src") % PPR_SEED_MOD == 0)
        .select(F.col("src").alias("node"), F.lit(base).cast("bigint").alias("b"))
        .persist()  # bounded: |seeds| rows, read every iteration
    )
    pr = seeds.select("node", F.lit(PR_SCALE).cast("bigint").alias("pr"))
    zero = F.lit(0).cast("bigint")
    for _ in range(PAGERANK_ITERS):
        # Merge the seed teleports INTO the contribution aggregate: union
        # the per-edge contributions (c, b=0) with the seed rows (c=0, b)
        # and fold both columns in ONE hash aggregate per iteration —
        # pr(node) = (Σc · 85) div 100 + Σb, exactly the former
        # COALESCE(m,0)+COALESCE(b,0) since seeds contribute nothing to Σc
        # and are unique per node (Σb = b). The r13 form was a full-outer
        # join whose broadcast hint Spark silently ignored (full-outer
        # sides cannot broadcast), costing a SortMergeJoin FullOuter — two
        # exchanges + two sorts — per iteration; a first r14 cut as a
        # post-aggregate UNION still paid a second exchange per iteration.
        # This form matches global PageRank's one-exchange-per-iteration
        # schedule (guide §2.4/§3.1).
        contrib = ed.join(F.broadcast(pr), ed["src"] == pr["node"]).select(
            F.col("dst").alias("node"), F.expr("pr div d").alias("c"), zero.alias("b")
        )
        pr = (
            contrib.unionByName(seeds.select("node", zero.alias("c"), "b"))
            .groupBy("node")
            .agg(
                F.expr(
                    f"cast((sum(c) * {PR_DAMP_NUM}) div {PR_DAMP_DEN} + sum(b) as bigint)"
                ).alias("pr")
            )
        )
    return pr.filter(F.col("pr") > 0).select(
        F.col("node").alias("part_id"), F.col("pr").alias("ppr_e6")
    )


# ---------------------------------------------------------------------------
# Community detection: synchronous label propagation (LPA)
# ---------------------------------------------------------------------------

LPA_ROUNDS = 2


def _lpa_oracle() -> str:
    sym = """
    SELECT a.l_partkey AS s, b.l_partkey AS t
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(DISTINCT a.l_orderkey) >= {m}
    """.format(m=TRI_MIN_SUPPORT)
    sql = f"""
    WITH half AS ({sym}),
    e AS (
      SELECT s AS u, t AS v FROM half
      UNION ALL SELECT t, s FROM half
    ),
    l0 AS (SELECT DISTINCT u AS node, u AS label FROM e)
    """
    prev = "l0"
    for r in range(1, LPA_ROUNDS + 1):
        sql += f""",
    c{r} AS (
      SELECT e.u AS node, l.label, COUNT(*) AS c
      FROM e JOIN {prev} l ON l.node = e.v
      GROUP BY 1, 2
    ),
    l{r} AS (
      SELECT node, label FROM (
        SELECT node, label,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY c DESC, label ASC) AS rn
        FROM c{r}
      ) WHERE rn = 1
    )
    """
        prev = f"l{r}"
    sql += f"""
    SELECT l.node AS part_id, l.label AS community
    FROM {prev} l
    """
    return sql


@query(
    "graph_lpa_communities",
    oracle=_lpa_oracle(),
    tags=("northstar", "graph", "bench"),
)
def graph_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007) over the support-thresholded co-purchase graph: every node
    starts labeled with its own id, and each round adopts the most
    frequent label among its neighbors, ties broken toward the SMALLEST
    label — the deterministic variant (classic LPA breaks ties randomly;
    random ties don't replay across engines or retries, so a distributed
    pipeline wants this form). Fixed LPA_ROUNDS rounds, plan-build-time
    loop (the kmeans_ivf_train precedent). Complements
    ``dedup_cluster_components``: CC finds connected components (the
    coarsest partition); LPA splits dense components into communities.

    Spark shape: SHARES the persisted ``_support_edges`` substrate with
    triangle count / Jaccard / PageRank. Per round: one join of the label
    table against the symmetric edge list (both keyed by node — AQE
    co-shuffles; at 100 TB both sides bucket by node and the per-round
    join is shuffle-free), one (node, label)-keyed count with map-side
    partials, and a per-node top-1 window (partitioned by node, never
    global). Label state is one row per node per round — the same O(V)
    frontier economics as PageRank; hub-node label skew pre-collapses in
    the partial aggregate exactly like the hot-line dedup case."""
    half = _support_edges(spark, sf_dir)
    e = half.select(F.col("s").alias("u"), F.col("t").alias("v")).unionByName(
        half.select(F.col("t").alias("u"), F.col("s").alias("v"))
    )
    labels = e.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(LPA_ROUNDS):
        cnt = (
            e.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy(F.col("u").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
    return labels.select(
        F.col("node").alias("part_id"), F.col("label").alias("community")
    )



# ---------------------------------------------------------------------------
# Bounded k-core peeling
# ---------------------------------------------------------------------------

KCORE_K = 4
KCORE_ROUNDS = 2


def _kcore_oracle() -> str:
    sym = """
    SELECT a.l_partkey AS s, b.l_partkey AS t
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(DISTINCT a.l_orderkey) >= {m}
    """.format(m=TRI_MIN_SUPPORT)
    sql = f"""
    WITH half AS ({sym}),
    e0 AS (
      SELECT s AS u, t AS v FROM half
      UNION ALL SELECT t, s FROM half
    ),
    n0 AS (SELECT DISTINCT u FROM e0)
    """
    removed = []
    for r in range(1, KCORE_ROUNDS + 1):
        sql += f""",
    d{r} AS (SELECT u, COUNT(*) AS deg FROM e{r - 1} GROUP BY 1),
    rm{r} AS (
      SELECT n.u FROM n{r - 1} n LEFT JOIN d{r} USING (u)
      WHERE COALESCE(d{r}.deg, 0) < {KCORE_K}
    ),
    n{r} AS (SELECT u FROM n{r - 1} WHERE u NOT IN (SELECT u FROM rm{r})),
    e{r} AS (
      SELECT e.u, e.v FROM e{r - 1} e
      WHERE e.u NOT IN (SELECT u FROM rm{r})
        AND e.v NOT IN (SELECT u FROM rm{r})
    )
    """
        removed.append(f"SELECT u AS part_id, {r} AS peeled_round FROM rm{r}")
    removed.append(
        f"SELECT u AS part_id, 0 AS peeled_round FROM n{KCORE_ROUNDS}"
    )
    sql += "\n    SELECT part_id, peeled_round FROM (\n    "
    sql += "\n    UNION ALL ".join(removed)
    sql += "\n    )"
    return sql


@query(
    "graph_kcore_peel",
    oracle=_kcore_oracle(),
    tags=("northstar", "graph", "bench"),
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core decomposition: KCORE_ROUNDS synchronous peel rounds
    — each round removes every node whose CURRENT degree is below
    KCORE_K, then re-derives the induced subgraph — labeling nodes with
    the round that removed them (0 = still standing after all rounds ≈
    the k-core). The peel order is the classic graph-quality signal:
    low-round nodes are tendrils/noise, the surviving core is the
    densely co-purchased backbone (same role as k-core in web-spam and
    community pipelines; Matula & Beck 1983). Rounds are synchronous so
    the result is deterministic and engine-independent — sequential
    peeling visits nodes in an arbitrary order, synchronous peeling is
    the distributed-safe formulation and converges to the same core.

    Spark shape: SHARES the persisted ``_support_edges`` substrate. Per
    round: one node-keyed degree count (map-side partials) and two
    broadcast anti-joins of the edge list against the round's removed
    set (removed sets are the SMALL side by construction — peeled
    tendrils; at 10⁸⁺-node scale they flip to co-partitioned anti-joins,
    same flip note as PageRank's rank vector). Fixed plan-build-time
    rounds (kmeans_ivf_train precedent); full k-core needs
    data-dependent iteration count — at 100 TB the same loop runs
    driver-side with a convergence check per round, plans unchanged."""
    half = _support_edges(spark, sf_dir)
    e = half.select(F.col("s").alias("u"), F.col("t").alias("v")).unionByName(
        half.select(F.col("t").alias("u"), F.col("s").alias("v"))
    )
    # The initial node set is exactly round 1's degree-table key set (every
    # node of e has an edge), so the former DISTINCT over the doubled edge
    # list paid a full exchange for a relation the first peel round
    # aggregates anyway (guide §2.4). nodes is None until round 1 sets it.
    nodes = None
    out = None
    cached = []
    for r in range(1, KCORE_ROUNDS + 1):
        deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        if nodes is None:
            nodes = deg.select("u")
            rm = deg.filter(F.col("deg") < KCORE_K).select("u").persist()
        else:
            rm = (
                nodes.join(deg, "u", "left")
                .filter(F.coalesce("deg", F.lit(0)) < KCORE_K)
                .select("u")
                .persist()
            )
        cached.append(rm)
        lab = rm.select(
            F.col("u").alias("part_id"), F.lit(r).alias("peeled_round")
        )
        out = lab if out is None else out.unionByName(lab)
        nodes = nodes.join(F.broadcast(rm), "u", "left_anti")
        # persist the peeled edge set so later rounds (and the final
        # union's many branches) never re-derive earlier rounds' lineage
        e = (
            e.join(F.broadcast(rm), "u", "left_anti")
            .join(F.broadcast(rm.withColumnRenamed("u", "v")), "v", "left_anti")
            .persist()
        )
        cached.append(e)
    core = nodes.select("u").select(
        F.col("u").alias("part_id"), F.lit(0).alias("peeled_round")
    )
    result = out.unionByName(core)
    # materialize before unpersisting the per-round caches (replica runs
    # invoke many queries per session — the ADVICE r6 cache-pressure note)
    result = result.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    return result


# ---------------------------------------------------------------------------
# End-to-end pretraining curation manifest
# ---------------------------------------------------------------------------

E2E_SHARDS = 8


def _e2e_oracle() -> str:
    from kafka_streams_playground_spark.plans.northstar_scoring import (
        _STOP_SQL,
        QC_BIAS_E6,
        QC_TH_E6,
        QC_W_LEN_E6,
        QC_W_STOP_E6,
        QC_W_TTR_E6,
    )

    return f"""
    WITH {CONTAM_AGG_CTES},
    toks AS (
      SELECT doc_id, text,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
      FROM documents
    ),
    qf AS (
      SELECT doc_id,
             CAST(({QC_W_TTR_E6} * CAST(len(list_distinct(toks)) AS BIGINT))
                      // CAST(len(toks) AS BIGINT)
                  - ({QC_W_STOP_E6}
                     * CAST(len([x for x in toks
                                 if list_contains([{_STOP_SQL}], x)]) AS BIGINT))
                      // CAST(len(toks) AS BIGINT)
                  + ({QC_W_LEN_E6} * LEAST(CAST(len(toks) AS BIGINT), 256)) // 256
                  + {QC_BIAS_E6} >= {QC_TH_E6} AS INT) AS keep
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    ),
    s1 AS (
      SELECT toks.* FROM toks JOIN qf USING (doc_id) WHERE qf.keep = 1
    ),
    s2 AS (
      SELECT s1.* FROM s1
      JOIN (SELECT md5(text) AS h, MIN(doc_id) AS k FROM s1 GROUP BY 1) f
        ON md5(s1.text) = f.h AND s1.doc_id = f.k
    ),
    s3 AS (
      SELECT s2.* FROM s2 JOIN agg USING (doc_id)
      WHERE agg.n_contaminated * 1.0 / agg.n_shingles < {CONTAM_FLAG_RATIO}
    ),
    shd AS (
      SELECT doc_id, nt,
             ('0x' || substr(md5('e2e:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % {E2E_SHARDS} AS shard
      FROM s3
    )
    SELECT 'raw' AS stage, COUNT(*) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS sum_tokens FROM toks
    UNION ALL
    SELECT 'quality', COUNT(*), CAST(SUM(nt) AS BIGINT) FROM s1
    UNION ALL
    SELECT 'dedup', COUNT(*), CAST(SUM(nt) AS BIGINT) FROM s2
    UNION ALL
    SELECT 'decontam', COUNT(*), CAST(SUM(nt) AS BIGINT) FROM s3
    UNION ALL
    SELECT 'shard_' || CAST(shard AS VARCHAR), COUNT(*),
           CAST(SUM(nt) AS BIGINT)
    FROM shd GROUP BY shard
    """


@query(
    "pipeline_pretrain_e2e_manifest",
    oracle=_e2e_oracle(),
    tags=("northstar", "pipeline", "e2e", "bench"),
)
def pipeline_pretrain_e2e_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END pretraining curation chain as ONE dataflow: raw →
    quality-classifier gate → exact dedup (first occurrence per content
    hash) → eval-set decontamination → deterministic shard assignment,
    reporting per-stage attrition (docs, tokens) plus the final per-shard
    manifest — the run report every corpus build publishes (C4, RefinedWeb,
    Dolma all report exactly this funnel). Every stage REUSES the
    registry's single-stage rule verbatim (quality_classifier_filter's
    integer logit, dedup_exact's min-doc_id-per-md5,
    text_contamination_check's shingle flags, the md5-salt shard law), so
    the composition is auditable against the already-proven parts.

    Spark shape: stages chain as narrow joins on doc_id against flag
    relations that each ride their own proven plan (quality: one
    token-stats pass; dedup: one content-hash groupBy; contamination: the
    broadcast benchmark-shingle set); attrition rows are 1-row aggregates
    of each intermediate (Spark computes the four stage frames once each —
    lineage shares the scans), and the shard rollup is an 8-group
    aggregate. At 100 TB the chain is the same as running the stages
    back-to-back with materialized intermediates — here the optimizer sees
    the whole funnel and prunes ``text`` out of every post-dedup stage."""
    from kafka_streams_playground_spark.plans.northstar_scoring import (
        quality_classifier_filter,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.size(F.split("text", " ")).cast("bigint").alias("nt"),
    )
    qf = quality_classifier_filter(spark, sf_dir).select("doc_id", "keep")
    s1 = docs.join(qf.filter(F.col("keep") == 1).drop("keep"), "doc_id").persist()
    firsts = (
        s1.groupBy(F.md5("text").alias("h")).agg(F.min("doc_id").alias("k"))
    )
    s2 = s1.join(
        firsts,
        (F.md5(s1.text) == firsts.h) & (s1.doc_id == firsts.k),
    ).select(s1.doc_id, "nt").persist()
    flags = text_contamination_check(spark, sf_dir).select("doc_id", "flagged")
    s3 = s2.join(flags, "doc_id").filter(F.col("flagged") == 0).persist()
    shd = s3.select(
        "nt",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("e2e:"), F.col("doc_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % E2E_SHARDS
        ).alias("shard"),
    )

    def att(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("bigint").alias("sum_tokens"),
        ).select("stage", "n_docs", "sum_tokens")

    shards = (
        shd.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("bigint").alias("sum_tokens"),
        )
        .select(
            F.concat(F.lit("shard_"), F.col("shard").cast("string")).alias("stage"),
            "n_docs",
            "sum_tokens",
        )
    )
    result = (
        att("raw", docs)
        .unionByName(att("quality", s1))
        .unionByName(att("dedup", s2))
        .unionByName(att("decontam", s3))
        .unionByName(shards)
    )
    result = result.localCheckpoint(eager=True)
    for df in (s1, s2, s3):
        df.unpersist()
    return result


# ---------------------------------------------------------------------------
# Community quality: Newman modularity of the LPA partition
# ---------------------------------------------------------------------------


def _modularity_oracle() -> str:
    lpa = _lpa_oracle()
    # reuse the LPA chain up to its final SELECT; keep its CTE prefix
    prefix = lpa[: lpa.rindex("SELECT l.node AS part_id")]
    return f"""{prefix},
    lab AS (SELECT node, label AS community FROM l{LPA_ROUNDS}),
    m AS (SELECT COUNT(*) AS m FROM half),
    deg AS (SELECT u, COUNT(*) AS d FROM e GROUP BY 1),
    internal AS (
      SELECT la.community, COUNT(*) AS e_c
      FROM half h
      JOIN lab la ON la.node = h.s
      JOIN lab lb ON lb.node = h.t
      WHERE la.community = lb.community
      GROUP BY 1
    ),
    comm AS (
      SELECT lab.community, COUNT(*) AS n_nodes,
             CAST(SUM(deg.d) AS BIGINT) AS degree_sum
      FROM lab JOIN deg ON deg.u = lab.node
      GROUP BY 1
    ),
    per AS (
      SELECT c.community, c.n_nodes,
             COALESCE(i.e_c, 0) AS internal_edges, c.degree_sum,
             CAST(4 * m.m * COALESCE(i.e_c, 0)
                  - c.degree_sum * c.degree_sum AS BIGINT) AS contrib_4m2
      FROM comm c LEFT JOIN internal i USING (community) CROSS JOIN m
    )
    SELECT community, n_nodes, internal_edges, degree_sum, contrib_4m2 FROM per
    UNION ALL
    SELECT -1, CAST(SUM(n_nodes) AS BIGINT), CAST(SUM(internal_edges) AS BIGINT),
           CAST(SUM(degree_sum) AS BIGINT), CAST(SUM(contrib_4m2) AS BIGINT)
    FROM per
    """


@query(
    "graph_lpa_modularity_audit",
    oracle=_modularity_oracle(),
    tags=("northstar", "graph", "bench"),
)
def graph_lpa_modularity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity audit of the LPA partition — the 'did the
    communities mean anything' check that must follow ANY community
    detector before its labels feed a downstream pipeline. Division-free:
    4m²·Q = Σ_c (4m·e_c − d_c²), so each community contributes an exact
    integer (possibly negative — a community worse than random) and the
    community = −1 TOTAL row carries 4m²·Q itself; Q > 0 ⇔ the partition
    beats the configuration-model null.

    Spark shape: re-derives the label table (same fixed-round plan as
    ``graph_lpa_communities``; at 100 TB the labels are the STORED output
    of that pass — this audit is one join-and-aggregate over them), then:
    internal edges = the half-edge relation joined twice against the
    BROADCAST label table (labels are |V| rows — node-keyed co-shuffle at
    web scale, same flip note as PageRank), degree sums = one node-keyed
    count, and the per-community rollup is community-count-sized. Squared
    degree sums stay in int64 until d_c ≈ 3·10⁹ — the DECIMAL flip is
    noted here for the graph where one community swallows the corpus."""
    half = _support_edges(spark, sf_dir)
    # materialize the LPA fixed point once — it feeds THREE consumers below
    # (both sides of the internal-edge join plus the degree rollup), and
    # without truncation each would re-run all LPA_ROUNDS join rounds
    labels = (
        graph_lpa_communities(spark, sf_dir)
        .withColumnsRenamed({"part_id": "node", "community": "community"})
        .localCheckpoint(eager=True)
    )
    e = half.select(F.col("s").alias("u"), F.col("t").alias("v")).unionByName(
        half.select(F.col("t").alias("u"), F.col("s").alias("v"))
    )
    m = half.agg(F.count(F.lit(1)).alias("m"))
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    la = labels.withColumnRenamed("node", "s").withColumnRenamed(
        "community", "ca"
    )
    lb = labels.withColumnRenamed("node", "t").withColumnRenamed(
        "community", "cb"
    )
    internal = (
        half.join(F.broadcast(la), "s")
        .join(F.broadcast(lb), "t")
        .filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count(F.lit(1)).alias("e_c"))
    )
    comm = (
        labels.join(deg, labels.node == deg.u)
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("d").cast("bigint").alias("degree_sum"),
        )
    )
    per = (
        comm.join(internal, "community", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "community",
            "n_nodes",
            F.coalesce("e_c", F.lit(0)).alias("internal_edges"),
            "degree_sum",
            (
                F.lit(4) * F.col("m") * F.coalesce("e_c", F.lit(0))
                - F.col("degree_sum") * F.col("degree_sum")
            )
            .cast("bigint")
            .alias("contrib_4m2"),
        )
    )
    # community-count-sized; materialize so the TOTAL row's aggregate does
    # not re-execute the whole join lineage a second time in the union
    per = per.localCheckpoint(eager=True)
    total = per.agg(
        F.lit(-1).cast("bigint").alias("community"),
        F.sum("n_nodes").cast("bigint").alias("n_nodes"),
        F.sum("internal_edges").cast("bigint").alias("internal_edges"),
        F.sum("degree_sum").cast("bigint").alias("degree_sum"),
        F.sum("contrib_4m2").cast("bigint").alias("contrib_4m2"),
    ).select("community", "n_nodes", "internal_edges", "degree_sum", "contrib_4m2")
    return per.unionByName(total)


# ---------------------------------------------------------------------------
# HITS hubs & authorities over the customer→supplier purchase graph
# ---------------------------------------------------------------------------

HITS_TOPK = 10

_HITS_ORACLE = f"""
    WITH e AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    a1 AS (SELECT s, COUNT(*) AS a FROM e GROUP BY s),
    h1 AS (SELECT c, SUM(a) AS h FROM e JOIN a1 USING (s) GROUP BY c),
    a2 AS (SELECT s, SUM(h) AS a FROM e JOIN h1 USING (c) GROUP BY s),
    h2 AS (SELECT c, SUM(a) AS h FROM e JOIN a2 USING (s) GROUP BY c),
    tops AS (
      SELECT 'authority' AS side, node_id, score FROM (
        SELECT s AS node_id, CAST(a AS BIGINT) AS score FROM a2
        ORDER BY a DESC, s LIMIT {HITS_TOPK}
      )
      UNION ALL
      SELECT 'hub' AS side, node_id, score FROM (
        SELECT c AS node_id, CAST(h AS BIGINT) AS score FROM h2
        ORDER BY h DESC, c LIMIT {HITS_TOPK}
      )
    )
    SELECT side, node_id, score,
           ROW_NUMBER() OVER (PARTITION BY side
                              ORDER BY score DESC, node_id) AS rk
    FROM tops
"""


@query(
    "graph_hits_hubs_authorities",
    oracle=_HITS_ORACLE,
    tags=("northstar", "graph", "iterative", "bench"),
)
def graph_hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg, JACM'99) over the DIRECTED bipartite purchase graph
    customer → supplier (an edge when a customer ever bought from the
    supplier): hub scores rank customers whose baskets concentrate on
    authoritative suppliers, authority scores rank suppliers bought by the
    strongest hubs. Two full mutual-reinforcement rounds (a1 = indegree,
    h1 = Σ a1, a2 = Σ h1, h2 = Σ a2), reported as the top-HITS_TOPK of
    each side. The directed-graph complement to graph_copurchase_pagerank
    — on a bipartite graph PageRank mixes the two roles, HITS keeps them
    separate, which is why it is the classic recommender/centrality pair.

    Exactness: scores are UNNORMALIZED exact integers (the usual L2
    normalization only rescales each side, so per-side ranks are
    identical) — every iteration is a BIGINT sum, bit-equal across
    engines and partition counts, no float drift ever. Headroom: score
    bounds multiply by (max degree) per round, ~(10^4)^4 = 1e16 < 2^63 at
    100 TB fan-outs; widen to DECIMAL(38,0) per the OLS precedent if a
    marketplace exceeds that.

    Spark shape: the distinct edge list builds with one join + one
    distinct and is PERSISTED; each half-iteration is a broadcast of the
    |one-side|-row score vector against the persisted edges plus one
    keyed shuffle with map-side partial sums (the Pregel schedule, same
    >10^8-node broadcast→co-partitioned flip note as PageRank). Both
    top-k legs are TakeOrderedAndProject — per-partition bottom-k, K-row
    merge, never a full sort; the final rank window runs over 2·K
    surviving rows."""
    ord_ = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e = (
        ord_.join(li, ord_["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .persist()
    )
    a = e.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("a"))
    h = (
        e.join(F.broadcast(a), "s")
        .groupBy("c")
        .agg(F.sum("a").alias("h"))
    )
    a = (
        e.join(F.broadcast(h), "c")
        .groupBy("s")
        .agg(F.sum("h").alias("a"))
    )
    # a2 feeds BOTH h2's broadcast build and the authority top-k; as one
    # lazy plan the whole a1→h1→a2 chain re-executed under the top-k leg
    # (exchange/stage reuse does not dedup it — r15 final-plan audit).
    # Materialize the |suppliers|-row relation once (§2.4); measured
    # 3.89 → 2.97 s min-of-6 order-alternating at sf0.1.
    a = a.localCheckpoint(eager=True)
    h = (
        e.join(F.broadcast(a), "s")
        .groupBy("c")
        .agg(F.sum("a").alias("h"))
    )
    top_auth = (
        a.orderBy(F.col("a").desc(), F.col("s"))
        .limit(HITS_TOPK)
        .select(
            F.lit("authority").alias("side"),
            F.col("s").alias("node_id"),
            F.col("a").cast("long").alias("score"),
        )
    )
    top_hub = (
        h.orderBy(F.col("h").desc(), F.col("c"))
        .limit(HITS_TOPK)
        .select(
            F.lit("hub").alias("side"),
            F.col("c").alias("node_id"),
            F.col("h").cast("long").alias("score"),
        )
    )
    from pyspark.sql import Window

    rk_w = Window.partitionBy("side").orderBy(F.col("score").desc(), F.col("node_id"))
    return (
        top_auth.unionByName(top_hub)
        .withColumn("rk", F.row_number().over(rk_w))
    )


_AA_ORACLE = f"""
    WITH e AS (
      SELECT a.l_partkey AS s, b.l_partkey AS t
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(DISTINCT a.l_orderkey) >= {TRI_MIN_SUPPORT}
    ),
    adj AS (SELECT s AS v, t AS u FROM e UNION ALL SELECT t, s FROM e),
    deg AS (SELECT v, COUNT(*) AS d FROM adj GROUP BY v),
    ctr AS (
      SELECT adj.v, adj.u,
             CAST(FLOOR(1000000000 / ln(d) + 0.5) AS BIGINT) AS aa9
      FROM adj JOIN deg ON adj.v = deg.v
      WHERE d >= 2
    )
    SELECT a1.u AS part_a, a2.u AS part_b,
           COUNT(*) AS common,
           CAST(SUM(a1.aa9) AS BIGINT) AS adamic_adar_e9
    FROM ctr a1 JOIN ctr a2 ON a1.v = a2.v AND a1.u < a2.u
    GROUP BY 1, 2 HAVING COUNT(*) >= {RELATED_MIN_COMMON}
"""


@query(
    "graph_adamic_adar_links",
    oracle=_AA_ORACLE,
    tags=("northstar", "graph", "similarity", "bench"),
)
def graph_adamic_adar_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction (Adamic & Adar 2003) on the
    support-thresholded co-purchase graph: candidate pair score =
    Σ_{z ∈ CN(a,b)} 1/ln(deg(z)) — common neighbors weighted DOWN by how
    promiscuous they are, the standard "predict the missing edge"
    baseline that outranks raw common-neighbor counts (a hub connecting
    everyone carries almost no evidence; a rare shared neighbor carries a
    lot). Complements ``graph_related_parts_jaccard``: Jaccard normalizes
    by the PAIR's degrees, Adamic-Adar by each WITNESS's degree.

    Exactness: each center node's contribution snaps ONCE to the 1e-9
    integer grid (floor(1e9/ln d + 0.5) — F.log vs DuckDB ln agree well
    under a grid step, the BM25-idf/reservoir precedent) and the per-pair
    score is then an order-free exact BIGINT sum — deterministic across
    engines and partition counts. Centers need d ≥ 2 to form a wedge, so
    ln d ≥ ln 2 and the weight is bounded by ~1.44e9; a 100 TB pair score
    stays far under 2^63.

    Spark shape: SHARES the persisted ``_support_edges`` materialization
    with triangles/Jaccard/LPA/k-core; the per-center weight attaches to
    the doubled adjacency by a broadcast of the |nodes|-row degree table
    BEFORE the wedge self-join, so the join carries (v, u, aa9) only and
    the pair aggregate is one shuffle with map-side partial sums — the
    same full wedge set as the Jaccard sibling (every common neighbor is
    a scored witness, so degree orientation cannot prune it; the levers
    are the support prune and salting, see
    ``graph_related_parts_jaccard``)."""
    e = _support_edges(spark, sf_dir)
    adj = e.select(F.col("s").alias("v"), F.col("t").alias("u")).unionAll(
        e.select(F.col("t").alias("v"), F.col("s").alias("u"))
    )
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    ctr = adj.join(F.broadcast(deg.filter(F.col("d") >= 2)), "v").select(
        "v",
        "u",
        F.floor(F.lit(1_000_000_000) / F.log(F.col("d")) + 0.5)
        .cast("long")
        .alias("aa9"),
    )
    return (
        ctr.select("v", F.col("u").alias("part_a"), F.col("aa9"))
        .join(ctr.select("v", F.col("u").alias("part_b")), "v")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum("aa9").alias("adamic_adar_e9"),
        )
        .filter(F.col("common") >= RELATED_MIN_COMMON)
    )


@query(
    "graph_clustering_coefficient",
    oracle="""
    WITH {TRI_DEG_CTES}
    SELECT d.part_id, d.degree, COALESCE(node_tri.n, 0) AS n_triangles,
           CAST(COALESCE(node_tri.n, 0) * 2 * 1000000
                // (d.degree * (d.degree - 1)) AS BIGINT) AS cc_ppm
    FROM deg d LEFT JOIN node_tri USING (part_id)
    WHERE d.degree >= 2
    """.format(TRI_DEG_CTES=TRI_DEG_CTES),
    tags=("northstar", "graph", "bench"),
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node (Watts & Strogatz 1998):
    cc(v) = triangles(v) / C(deg(v), 2) — the fraction of v's neighbor
    pairs that are themselves connected, the canonical "is this node in a
    dense pocket or a hub-of-strangers" signal that turns raw triangle
    counts into a comparable 0..1 score (a 100-triangle hub with degree
    200 is SPARSER than a 3-triangle node of degree 3). Curation reads it
    on item/co-citation graphs to separate organic communities from
    spam-hub fan-outs, which inflate degree but not closure.

    Exactness: 2·triangles·10⁶ and deg·(deg−1) are exact BIGINTs; one
    integer floor division (both nonnegative — no sign trick needed)
    lands cc on the ppm grid. Degree-1 nodes have no neighbor pair —
    excluded (C(1,2) = 0), matching the textbook convention.

    Spark shape: SHARES the persisted ``_support_edges`` substrate and
    the DEGREE-ORIENTED wedge-close join with ``graph_triangle_count``
    (Suri & Vassilvitskii MR-Node-Iterator++, see
    ``node_triangle_degrees``: hub fan-out bounded by C(outdeg, 2) with
    outdeg ≤ O(√|E|)); co-partitioned endpoint-keyed joins, map-side
    partial counts; the coefficient is a projection on the |nodes|-row
    join of the degree and triangle tables."""
    return node_triangle_degrees(spark, sf_dir).filter(F.col("degree") >= 2).select(
        "part_id",
        "degree",
        "n_triangles",
        F.expr(
            "CAST(n_triangles * 2 * 1000000"
            " div (degree * (degree - 1)) AS BIGINT)"
        ).alias("cc_ppm"),
    )
