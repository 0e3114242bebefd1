"""Exact-threshold boundary probes (the round-11 lesson): when two
implementations claim identical semantics — a Spark plan and its DuckDB
oracle, or a batch pass and its streaming twin — the only rows that can
disagree are measure-zero boundary cases the random fixtures never
produce. Each test here materializes a tiny synthetic events table that
SITS on a boundary and runs BOTH engines on it with the replica's own
type-strict compare (the session-gap mismatch was found exactly this
way; see test_streaming.test_session_gap_boundary_semantics_*)."""

import os
import sys
from datetime import datetime, timedelta

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.check_correctness import _norm_rows  # noqa: E402


def _events_fixture_dir(spark, tmp_path, rows):
    """Write rows as <dir>/events.parquet in the fixture schema."""
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _spark_vs_oracle(spark, sf_dir, name, table="events"):
    """Run a registered query and its DuckDB oracle on the same fixture
    dir and return (normalized_spark_rows, normalized_oracle_rows)."""
    import duckdb

    from kafka_streams_playground_spark.plans import REGISTRY

    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    spdf = sdf.toPandas()
    s = _norm_rows(
        sorted(sdf.columns), [tuple(t) for t in spdf.itertuples(index=False, name=None)]
    )
    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY (the real fixtures are single
    # files); glob the part files for DuckDB
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, f'{table}.parquet', '*.parquet')}')"
    )
    ddf = con.execute(spec.oracle).df()
    d = _norm_rows(
        sorted(ddf.columns), [tuple(t) for t in ddf.itertuples(index=False, name=None)]
    )
    assert sorted(sdf.columns) == sorted(ddf.columns), (sdf.columns, list(ddf.columns))
    return s, d


def test_asof_nearest_boundary_cases(spark, tmp_path):
    """asof_nearest_click at every boundary the fixtures can't hit:
    a click at EXACTLY the purchase timestamp (backward-inclusive, dist
    0), an exact equidistant tie (backward must win in both engines),
    multiple clicks at the same timestamp (largest id wins backward),
    sub-second floor asymmetry (distances computed on FLOORED epochs),
    and a nearest click exactly AT the tolerance (kept) vs one second
    past it (dropped)."""
    from kafka_streams_playground_spark.plans.temporal import NEAREST_TOL_S

    t = datetime(2024, 5, 1, 12, 0, 0)
    s = timedelta(seconds=1)
    rows = [
        # u1: click at exactly purchase ts + a later click -> back, dist 0
        (10, 1, "click", t, 1.0),
        (11, 1, "purchase", t, 1.0),
        (12, 1, "click", t + 5 * s, 1.0),
        # u2: exact equidistant tie (10 s both sides) -> backward wins
        (20, 2, "click", t - 10 * s, 1.0),
        (21, 2, "purchase", t, 1.0),
        (22, 2, "click", t + 10 * s, 1.0),
        # u3: two clicks at the SAME ts before the purchase -> largest id
        (30, 3, "click", t, 1.0),
        (31, 3, "click", t, 1.0),
        (32, 3, "purchase", t + 3 * s, 1.0),
        # u4: sub-second floor asymmetry: purchase at t+0.9 s, click at t
        # (precise dist 0.9, FLOORED dist 0), fwd click at t+1.2 s
        # (precise dist 0.3 — nearer! — but FLOORED dist 1): the floored
        # contract must pick BACKWARD in both engines
        (40, 4, "click", t, 1.0),
        (41, 4, "purchase", t + timedelta(microseconds=900_000), 1.0),
        (42, 4, "click", t + timedelta(seconds=1, microseconds=200_000), 1.0),
        # u5: click exactly AT the tolerance -> kept; u6: one past -> dropped
        (50, 5, "click", t - NEAREST_TOL_S * s, 1.0),
        (51, 5, "purchase", t, 1.0),
        (60, 6, "click", t - (NEAREST_TOL_S + 1) * s, 1.0),
        (61, 6, "purchase", t, 1.0),
    ]
    sf_dir = _events_fixture_dir(spark, tmp_path, rows)
    s_rows, d_rows = _spark_vs_oracle(spark, sf_dir, "asof_nearest_click")
    assert s_rows == d_rows and len(s_rows) == 6
    # spot-check the semantics, not just cross-engine agreement
    got = {
        r["event_id"]: (r["nearest_click_id"], r["nearest_dist_s"], r["direction"])
        for r in __import__(
            "kafka_streams_playground_spark.plans", fromlist=["REGISTRY"]
        ).REGISTRY["asof_nearest_click"].fn(spark, sf_dir).collect()
    }
    assert got[11] == (10, 0, 1)  # equal-ts click, backward, dist 0
    assert got[21] == (20, 10, 1)  # exact tie -> backward
    assert got[32] == (31, 3, 1)  # same-ts clicks -> largest id
    assert got[41] == (40, 0, 1)  # floored contract -> backward dist 0
    assert got[51] == (50, NEAREST_TOL_S, 1)  # at tolerance: kept
    assert got[61] == (None, None, 0)  # past tolerance: dropped


def test_asof_backward_equal_ts_inclusive(spark, tmp_path):
    """asof_purchase_last_click: a click at EXACTLY the purchase timestamp
    is a valid backward match in both engines (<= semantics), with
    same-ts ties resolved to the largest click id."""
    t = datetime(2024, 5, 1, 12, 0, 0)
    rows = [
        (10, 1, "click", t, 1.0),
        (11, 1, "click", t, 1.0),
        (12, 1, "purchase", t, 1.0),
        # u2: no click at or before -> null match survives in both engines
        (20, 2, "purchase", t, 1.0),
        (21, 2, "click", t + timedelta(seconds=1), 1.0),
    ]
    sf_dir = _events_fixture_dir(spark, tmp_path, rows)
    s_rows, d_rows = _spark_vs_oracle(spark, sf_dir, "asof_purchase_last_click")
    assert s_rows == d_rows and len(s_rows) == 2


def test_asof_forward_equal_ts_inclusive(spark, tmp_path):
    """asof_forward_next_purchase: a purchase at EXACTLY the view
    timestamp is a valid forward match in both engines (>= semantics),
    ties to the smallest purchase id."""
    t = datetime(2024, 5, 1, 12, 0, 0)
    rows = [
        (10, 1, "view", t, 1.0),
        (11, 1, "purchase", t, 1.0),
        (12, 1, "purchase", t, 1.0),
        # u2: purchase strictly before the view only -> null forward match
        (20, 2, "purchase", t - timedelta(seconds=1), 1.0),
        (21, 2, "view", t, 1.0),
    ]
    sf_dir = _events_fixture_dir(spark, tmp_path, rows)
    s_rows, d_rows = _spark_vs_oracle(spark, sf_dir, "asof_forward_next_purchase")
    assert s_rows == d_rows and len(s_rows) == 2


def test_adversarial_tie_fixture_sweep(spark, tmp_path):
    """Shotgun boundary sweep: every events-only oracled BATCH query runs
    on a tie-heavy adversarial fixture — exact timestamp collisions
    (same user+ts across types, duplicate (user, ts, type) under
    different ids), events exactly on day/10 s-window boundaries,
    event_id order deliberately decorrelated from time order, duplicated
    values, zero values — and must still agree with its DuckDB oracle
    under the replica's type-strict compare. Random fixtures make all of
    these measure-zero, so a query whose tie-break silently leans on
    non-colliding timestamps (the round-11 session-gap lesson) passes
    every fixture gate and fails only here."""
    import re
    from datetime import datetime, timedelta

    from kafka_streams_playground_spark.plans import REGISTRY

    TABLES = {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings", "events",
    }

    def refs(sql):
        return {
            m.group(1).lower()
            for m in re.finditer(r"\b(?:FROM|JOIN)\s+([a-zA-Z_]\w*)", sql, re.I)
        } & TABLES

    day0 = datetime(2024, 6, 1, 0, 0, 0)  # exactly midnight: day boundary
    s = timedelta(seconds=1)
    rows, eid = [], 0

    def add(user, etype, ts, value, k):
        nonlocal eid
        # decorrelate id from time order: ids descend as time ascends
        rows.append((10_000 - eid, user, etype, ts, value, '{"k": %d}' % k))
        eid += 1

    for u in (1, 2):
        add(u, "view", day0, 10.0, 0)                 # exactly midnight
        add(u, "click", day0, 10.0, 5)                # SAME ts, other type
        add(u, "click", day0, 7.25, 5)                # SAME (user, ts, type)
        add(u, "purchase", day0 + 10 * s, 10.0, 7)    # exactly at 10 s window edge
        add(u, "purchase", day0 + 10 * s, 10.0, 7)    # full duplicate row content
        add(u, "view", day0 + timedelta(days=1), 0.0, 0)      # next-day midnight
        add(u, "error", day0 + timedelta(days=1), -3.5, 9)    # negative value tie point
        add(u, "signup", day0 + timedelta(days=1, seconds=10), 7.25, 12)
    # u3: single event (degenerate groups for windows/trends)
    add(3, "purchase", day0 + 5 * s, 1.005, 1)  # cent-rounding tie value
    # u4: all five types at ONE shared timestamp
    for t_, k_ in (("view", 1), ("click", 2), ("purchase", 3), ("signup", 4), ("error", 5)):
        add(4, t_, day0 + timedelta(days=2), 50.0, k_)

    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp, "
        "value double, props string",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    sf_dir = str(tmp_path)

    names = sorted(
        n
        for n, spec in REGISTRY.items()
        if not n.startswith("stream_")
        and spec.oracle is not None
        and refs(spec.oracle) == {"events"}
    )
    assert len(names) >= 50  # the sweep must keep covering the family
    mismatches = []
    for n in names:
        try:
            got, want = _spark_vs_oracle(spark, sf_dir, n)
        except Exception as e:  # noqa: BLE001
            mismatches.append((n, f"error: {e}"))
            continue
        if got != want:
            mismatches.append((n, f"{len(got)} vs {len(want)} rows / value diff"))
    assert not mismatches, mismatches


def _refs(sql):
    import re

    TABLES = {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings", "events",
    }
    return {
        m.group(1).lower()
        for m in __import__("re").finditer(r"\b(?:FROM|JOIN)\s+([a-zA-Z_]\w*)", sql, __import__("re").I)
    } & TABLES


def _sweep(spark, sf_dir, table, min_expected):
    """Run every non-streaming oracled query whose oracle reads ONLY
    `table` against the synthetic fixture dir; return mismatches."""
    import duckdb  # noqa: F401

    from kafka_streams_playground_spark.plans import REGISTRY

    names = sorted(
        n
        for n, spec in REGISTRY.items()
        if not n.startswith("stream_")
        and spec.oracle is not None
        and _refs(spec.oracle) == {table}
    )
    assert len(names) >= min_expected
    mismatches = []
    for n in names:
        try:
            got, want = _spark_vs_oracle(spark, sf_dir, n, table=table)
        except Exception as e:  # noqa: BLE001
            mismatches.append((n, f"error: {type(e).__name__}: {e}"))
            continue
        if got != want:
            mismatches.append((n, f"{len(got)} vs {len(want)} rows / value diff"))
    return mismatches


def test_adversarial_documents_sweep(spark, tmp_path):
    """The documents-family twin of the events tie sweep: every
    documents-only oracled batch query (dedup, text stats, tokenizers,
    BPE training, sampling, multimodal manifests) must stay
    oracle-exact on a fixture built of tokenization and tie edge
    cases — exact duplicate texts under different ids/langs/sources,
    the empty string, a single token, doubled internal spaces
    (empty-string tokens), leading/trailing spaces, a prefix pair,
    a same-multiset permuted pair (fingerprint/MinHash ties), a
    pathological all-same-token doc, and a non-ASCII doc (char-vs-byte
    length traps). BPE/WordPiece merge selection hits COUNT TIES on a
    corpus this small, so their (count, pair) tie-breaks are exercised
    for real."""
    texts = [
        (1, "the quick brown fox jumps over the lazy dog", "en", "src0"),
        (2, "the quick brown fox jumps over the lazy dog", "es", "src1"),  # exact dup
        (3, "the quick brown fox jumps over the lazy dog", "en", "src0"),  # exact dup
        (4, "", "en", "src0"),                       # empty text
        (5, "word", "es", "src2"),                   # single token
        (6, "a  b", "en", "src1"),                   # double space -> empty token
        (7, " lead and trail ", "en", "src2"),       # boundary spaces
        (8, "alpha beta gamma delta", "es", "src0"),
        (9, "alpha beta", "es", "src3"),             # strict prefix of doc 8
        (10, "x y z", "en", "src3"),
        (11, "z y x", "en", "src3"),                 # same multiset, other order
        (12, "dup dup dup dup dup dup", "en", "src1"),  # one-token pathology
        (13, "café naïve déjà vu", "fr", "src2"),  # non-ASCII
        (14, "the lazy dog sat on the quick log", "en", "src0"),
    ]
    rows = [(i, t, lang, src, len(t)) for i, t, lang, src in texts]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    mismatches = _sweep(spark, str(tmp_path), "documents", 70)
    assert not mismatches, mismatches


def test_adversarial_embeddings_sweep(spark, tmp_path):
    """The embeddings-family twin: every embeddings-only oracled query
    (brute-force/LSH/IVF/PQ similarity, k-means, PCA, recall audits,
    coreset, MMR) must stay oracle-exact on a fixture with planted
    DISTANCE TIES — exact duplicate vectors, a pair differing in one
    coordinate only, mirrored vectors — on a float32-exact 1/64 value
    grid (100 vectors keep N > the IVF/PQ K constants). Ties force
    every top-k / assignment / rerank tie-break through its documented
    (score, id) total order in both engines at once."""
    import struct

    def grid(x):
        # float32-exact: multiples of 1/64 in [-2, 2)
        return (x % 256 - 128) / 64.0

    vecs = []
    for i in range(100):
        v = [grid(i * 31 + d * 7 + (i * d) % 13) for d in range(64)]
        vecs.append(v)
    vecs[1] = list(vecs[0])            # exact duplicate of vec 0
    vecs[2] = list(vecs[0])            # second duplicate (3-way top-k tie)
    vecs[3] = list(vecs[0]); vecs[3][63] = vecs[3][63] + 1.0 / 64  # near-dup
    vecs[4] = [-x for x in vecs[0]]    # mirrored (cosine -1)
    vecs[5] = [1.0 / 64] * 64          # constant vector (dim-stat ties)
    rows = [(i, vecs[i], i % 10) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    df.coalesce(1).write.parquet(str(tmp_path / "embeddings.parquet"))
    mismatches = _sweep(spark, str(tmp_path), "embeddings", 25)
    assert not mismatches, mismatches
