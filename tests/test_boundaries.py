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


@pytest.mark.slowaudit  # fixture-edge audit sweep, opt-in (pytest.ini)
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


@pytest.mark.slowaudit  # fixture-edge audit sweep, opt-in (pytest.ini)
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
        # casing traps (round 12): full-Unicode lower() is NOT
        # engine-portable (Java: 'İ' -> 'i'+combining dot, final-form
        # sigma; DuckDB utf8proc: 'İ' -> 'i', 'Σ' -> 'σ' always) — the C4
        # gates now ASCII-translate-fold, so these docs must behave
        # identically in both engines: 15 fires the lorem gate (ASCII
        # caps), 16 must NOT fire any gate ('İPSUM'/'JAVASCRİPT' stay
        # unfolded in both), 17 fires the per-line policy rule.
        (15, "LOREM IPSUM dolor sit amet boilerplate page", "en", "src1"),
        (16, "Grüße aus İstanbul ΣΟΦΙΑ ΛΟΓΟΣ JAVASCRİPT LOREM İPSUM", "de", "src2"),
        (17, "please enable JavaScript and cookies to view this page banner properly today friend thanks", "en", "src3"),
    ]
    rows = [(i, t, lang, src, len(t)) for i, t, lang, src in texts]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    mismatches = _sweep(spark, str(tmp_path), "documents", 70)
    assert not mismatches, mismatches


@pytest.mark.slowaudit  # fixture-edge audit sweep, opt-in (pytest.ini)
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


@pytest.mark.slowaudit  # fixture-edge audit sweep, opt-in (pytest.ini)
def test_adversarial_tpch_fixture_sweep(spark, tmp_path):
    """The relational-family sweep: every oracled batch query reading only
    the TPC-H-shaped tables runs on a 7-table adversarial fixture —
    o_totalprice EXACTLY at the q1 threshold (and one cent either side),
    l_shipdate exactly at the interval join's lower and upper bounds
    (+31 d just outside), duplicate totalprice at the threshold (top-k
    ties), Jan-1/Dec-31 order dates (quarter/year spines), an order with
    no lineitems, a customer with no orders, duplicate part names
    (levenshtein ties), equal account balances, a zero-quantity
    zero-price line, and a co-purchase TRIANGLE whose nodes all have
    EQUAL degree (the degree-orientation rank must fall through to the
    id tie-break). Every query must agree with its oracle under the
    type-strict compare."""
    from datetime import datetime, timedelta

    d0 = datetime(1995, 3, 15)
    day = timedelta(days=1)

    region = [(i, n) for i, n in enumerate(
        ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"])]
    nation = [(i, f"NATION_{i}", i % 5) for i in range(10)]
    customer = [
        (1, "Customer#1", 0, 100.0, "BUILDING"),
        (2, "Customer#2", 1, 100.0, "BUILDING"),     # acctbal+segment tie
        (3, "Customer#3", 2, 0.0, "AUTOMOBILE"),     # zero balance
        (4, "Customer#4", 2, -50.0, "MACHINERY"),    # negative balance
        (5, "Customer#5", 3, 9999.99, "HOUSEHOLD"),  # NO orders
        (6, "Customer#6", 7, 100.0, "FURNITURE"),
    ]
    supplier = [
        (1, "Supplier#1", 0, 10.0),
        (2, "Supplier#2", 1, 10.0),   # acctbal tie
        (3, "Supplier#3", 2, -5.0),
        (4, "Supplier#4", 7, 20.0),
    ]
    part = [
        (1, "large widget", "Brand#1", "PROMO", 10, 100.0),
        (2, "large widget", "Brand#2", "SMALL", 10, 100.0),   # exact name dup
        (3, "large widgets", "Brand#1", "ECONOMY", 20, 100.01),  # edit dist 1
        (4, "cold bolt", "Brand#13", "STANDARD", 1, 5.0),
        (5, "small bolt", "Brand#20", "MEDIUM", 50, 499.99),
        (6, "tiny gear", "Brand#9", "LARGE", 25, 250.0),      # never shipped
    ]
    orders = [
        (100, 1, "F", 250000.0, d0, "1-URGENT"),        # EXACTLY at EXPENSIVE
        (101, 1, "O", 249999.99, d0, "2-HIGH"),          # one cent below
        (102, 2, "F", 250000.01, d0 + day, "5-LOW"),     # one cent above
        (103, 2, "P", 100.0, datetime(1995, 1, 1), "3-MEDIUM"),   # Jan 1
        (104, 3, "O", 100.0, datetime(1995, 12, 31), "4-NOT SPECIFIED"),
        (105, 3, "F", 50000.0, datetime(1996, 1, 1), "1-URGENT"),
        (106, 4, "O", 75000.0, d0, "2-HIGH"),            # NO lineitems
        (107, 6, "F", 250000.0, d0, "1-URGENT"),         # threshold tie
    ]
    li = [
        # order 100: ship EXACTLY orderdate / EXACTLY +30d / +31d outside
        (100, 1, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "F", d0),
        (100, 2, 2, 2, 2.0, 200.0, 0.05, 0.08, "N", "F", d0 + 30 * day),
        (100, 3, 1, 3, 3.0, 300.0, 0.10, 0.0, "R", "F", d0 + 31 * day),
        (101, 1, 1, 1, 1.0, 100.0, 0.05, 0.08, "A", "O", d0 + 15 * day),
        (101, 4, 3, 2, 1.0, 100.0, 0.05, 0.08, "A", "O", d0 + 15 * day),
        (102, 2, 2, 1, 10.0, 1000.0, 0.0, 0.0, "R", "F", d0 + 2 * day),
        (102, 5, 4, 2, 10.0, 1000.0, 0.0, 0.0, "N", "O", d0 + 2 * day),
        (103, 1, 1, 1, 5.0, 500.0, 0.05, 0.0, "R", "F", datetime(1995, 1, 31)),
        (104, 2, 2, 1, 5.0, 500.0, 0.05, 0.0, "N", "O", datetime(1996, 1, 30)),
        # order 105: parts 1,2,3 co-purchased -> with order 100 the pairs
        # (1,2),(1,3),(2,3) each reach support 2: an equal-degree triangle
        (105, 1, 1, 1, 7.0, 700.0, 0.07, 0.02, "N", "F", datetime(1996, 1, 1)),
        (105, 2, 1, 2, 7.0, 700.0, 0.07, 0.02, "N", "F", datetime(1996, 1, 1)),
        (105, 3, 1, 3, 7.0, 700.0, 0.07, 0.02, "N", "F", datetime(1996, 1, 1)),
        (107, 1, 1, 1, 50.0, 5000.0, 0.5, 0.0, "R", "F", d0 + 10 * day),
        (107, 2, 2, 2, 0.0, 0.0, 0.0, 0.0, "A", "F", d0 + 10 * day),  # zero line
    ]
    schemas = {
        "region": (region, "r_regionkey int, r_name string"),
        "nation": (nation, "n_nationkey int, n_name string, n_regionkey int"),
        "customer": (
            customer,
            "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
            " c_mktsegment string",
        ),
        "supplier": (
            supplier,
            "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
        ),
        "part": (
            part,
            "p_partkey long, p_name string, p_brand string, p_type string,"
            " p_size int, p_retailprice double",
        ),
        "orders": (
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ),
        "lineitem": (
            li,
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
            " l_quantity double, l_extendedprice double, l_discount double,"
            " l_tax double, l_returnflag string, l_linestatus string,"
            " l_shipdate timestamp",
        ),
    }
    for t, (rows, schema) in schemas.items():
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(tmp_path / f"{t}.parquet")
        )

    import duckdb

    from kafka_streams_playground_spark.plans import REGISTRY

    TPCH = {"region", "nation", "customer", "supplier", "part", "orders", "lineitem"}
    names = sorted(
        n
        for n, spec in REGISTRY.items()
        if not n.startswith("stream_")
        and spec.oracle is not None
        and _refs(spec.oracle)
        and _refs(spec.oracle) <= TPCH
    )
    assert len(names) >= 70
    con = duckdb.connect()
    for t in TPCH:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path / (t + '.parquet')}/*.parquet')"
        )
    mismatches = []
    for n in names:
        spec = REGISTRY[n]
        try:
            sdf = spec.fn(spark, str(tmp_path))
            spdf = sdf.toPandas()
            got = _norm_rows(
                sorted(sdf.columns),
                [tuple(t) for t in spdf.itertuples(index=False, name=None)],
            )
            ddf = con.execute(spec.oracle).df()
            want = _norm_rows(
                sorted(ddf.columns),
                [tuple(t) for t in ddf.itertuples(index=False, name=None)],
            )
        except Exception as e:  # noqa: BLE001
            mismatches.append((n, f"error: {type(e).__name__}: {str(e)[:200]}"))
            continue
        if got != want:
            mismatches.append((n, f"{len(got)} vs {len(want)} rows / value diff"))
    assert not mismatches, mismatches


@pytest.mark.slowaudit  # fixture-edge audit sweep, opt-in (pytest.ini)
def test_adversarial_mixed_table_sweep(spark, tmp_path):
    """Covers the six oracled queries whose oracles span MULTIPLE table
    families (the only ones the per-family sweeps miss): the
    documents↔embeddings pairing manifest and RRF fusion, the
    events↔orders KMV cardinality estimate, the cross-table skew report,
    and the two whole-dataset audits (expectation checks, content
    version). Adversarial angles: planted FK ORPHANS on both sides
    (an events user and a lineitem order that exist nowhere, a customer
    with no orders), a doc with an embedding twin vs a doc with NONE,
    duplicate embedding vectors among the paired ids (fusion ties),
    an empty and a non-ASCII text, and duplicate join keys."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 7, 1)
    day = timedelta(days=1)
    docs = [
        (1, "the quick brown fox", "en", "src0"),
        (2, "the quick brown fox", "en", "src1"),   # exact dup text
        (3, "", "en", "src0"),                       # empty
        (4, "café naïve déjà", "fr", "src2"),      # non-ASCII
        (5, "alpha beta gamma", "es", "src1"),
        (6, "zed", "en", "src3"),
    ]
    spark.createDataFrame(
        [(i, t, l, s, len(t)) for i, t, l, s in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    def grid(x):
        return (x % 256 - 128) / 64.0

    vecs = {i: [grid(i * 31 + d * 7) for d in range(64)] for i in range(40)}
    vecs[2] = list(vecs[1])  # docs 1 and 2 (dup texts) get IDENTICAL vectors
    # doc 6 has NO embedding row (vec_ids skip 6)
    emb = [(i, vecs[i], i % 10) for i in range(40) if i != 6]
    spark.createDataFrame(
        emb, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(tmp_path / "embeddings.parquet"))

    events = [
        (1, 1, "view", t0, 10.0, '{"k": 1}'),
        (2, 1, "click", t0, 10.0, '{"k": 2}'),      # same ts as the view
        (3, 2, "purchase", t0 + day, 5.5, '{"k": 3}'),
        (4, 99, "view", t0 + day, 1.0, '{"k": 4}'),  # FK-orphan user
    ]
    spark.createDataFrame(
        events,
        "event_id long, user_id long, event_type string, ts timestamp,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    spark.createDataFrame(
        [
            (1, "Customer#1", 0, 100.0, "BUILDING"),
            (2, "Customer#2", 1, 100.0, "BUILDING"),
            (3, "Customer#3", 2, 0.0, "AUTOMOBILE"),  # no orders
        ],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).coalesce(1).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [
            (10, 1, "F", 1000.0, t0, "1-URGENT"),
            (11, 1, "O", 1000.0, t0, "2-HIGH"),      # duplicate (custkey, price)
            (12, 2, "P", 2000.0, t0 + day, "5-LOW"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [
            (10, 1, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "F", t0),
            (10, 2, 1, 2, 1.0, 100.0, 0.0, 0.0, "N", "F", t0),
            (12, 1, 2, 1, 2.0, 200.0, 0.1, 0.0, "R", "O", t0 + 2 * day),
            (999, 1, 1, 1, 1.0, 50.0, 0.0, 0.0, "A", "F", t0),  # ORPHAN order
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))

    import duckdb

    from kafka_streams_playground_spark.plans import REGISTRY

    mixed = [
        "mm_paired_modality_manifest",
        "stats_join_cardinality_kmv",
        "pipeline_expectation_checks",
        "pipeline_content_version",
        "diag_key_skew_report",
        "retrieval_rrf_fusion",
    ]
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events", "customer", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path / (t + '.parquet')}/*.parquet')"
        )
    mismatches = []
    for n in mixed:
        spec = REGISTRY[n]
        try:
            sdf = spec.fn(spark, str(tmp_path))
            spdf = sdf.toPandas()
            got = _norm_rows(
                sorted(sdf.columns),
                [tuple(t) for t in spdf.itertuples(index=False, name=None)],
            )
            ddf = con.execute(spec.oracle).df()
            want = _norm_rows(
                sorted(ddf.columns),
                [tuple(t) for t in ddf.itertuples(index=False, name=None)],
            )
        except Exception as e:  # noqa: BLE001
            mismatches.append((n, f"error: {type(e).__name__}: {str(e)[:200]}"))
            continue
        if got != want:
            mismatches.append((n, f"{len(got)} vs {len(want)} rows / value diff"))
    assert not mismatches, mismatches
