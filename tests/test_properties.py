"""Property-based tests (hypothesis) for the operator library: invariants
that must hold on arbitrary inputs, not just the fixtures."""

from __future__ import annotations

import hashlib

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_streams_playground_spark.functions import text as T
from kafka_streams_playground_spark.functions.simhash import band_bounds

_token = st.text(alphabet="abcdefgh", min_size=1, max_size=4)
_doc = st.lists(_token, min_size=1, max_size=12).map(" ".join)


def _py_shingles(text: str, n: int = 3) -> list[str]:
    toks = text.split(" ")
    if len(toks) < n:
        return [" ".join(toks)]
    seen, out = set(), []
    for i in range(len(toks) - n + 1):
        s = " ".join(toks[i : i + n])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def _py_signature(text: str, k: int) -> list[int]:
    hs = [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in _py_shingles(text)]
    out = []
    for i in range(k):
        a, b = T._affine_params(i)
        out.append(min((a * h + b) % T.MERSENNE_P for h in hs))
    return out


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(docs=st.lists(_doc, min_size=1, max_size=8))
@pytest.mark.slowaudit  # pure-python cross-model audit (10-30 s), opt-in (pytest.ini)
def test_minhash_signature_matches_pure_python(spark, docs):
    """The Spark MinHash signature pipeline equals an independent pure-Python
    recomputation on arbitrary token soups (shingle fallback included)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id int, text string")
    sh = df.select("doc_id", T.shingles(T.tokens("text")).alias("sh"))
    sig = sh.select(
        "doc_id",
        *[
            c.alias(f"h{i}")
            for i, c in enumerate(T.minhash_signature(T.shingle_hashes(F.col("sh")), 4))
        ],
    )
    got = {r["doc_id"]: [r[f"h{i}"] for i in range(4)] for r in sig.collect()}
    for doc_id, text in enumerate(docs):
        assert got[doc_id] == _py_signature(text, 4), text


@given(n_bands=st.integers(min_value=1, max_value=16))
@settings(max_examples=16, deadline=None)
def test_simhash_band_bounds_partition_the_bits(n_bands):
    """Bands must tile [0, 63) exactly: contiguous, non-overlapping, total."""
    bounds = band_bounds(n_bands)
    assert len(bounds) == n_bands
    pos = 0
    for lo, width in bounds:
        assert lo == pos and width >= 1
        pos += width
    assert pos == 63


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-1000, 1000)), min_size=1, max_size=30
    )
)
@pytest.mark.slowaudit  # pure-python cross-model audit (10-30 s), opt-in (pytest.ini)
def test_salted_agg_property(spark, vals):
    """salted_agg == plain groupBy on arbitrary keyed integer data."""
    from pyspark.sql import functions as F

    from kafka_streams_playground_spark.operators.aggregations import salted_agg

    df = spark.createDataFrame(vals, "k int, v long")
    plain = {
        r["k"]: (r["cnt"], r["s"], r["mn"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("s"), F.min("v").alias("mn"))
        .collect()
    }
    salted = {
        r["k"]: (r["cnt"], r["s"], r["mn"])
        for r in salted_agg(
            df,
            ["k"],
            {
                "cnt": ("count", F.count(F.lit(1))),
                "s": ("sum", F.sum("v")),
                "mn": ("min", F.min("v")),
            },
            n_salts=4,
        ).collect()
    }
    assert salted == plain


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    small=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=30),
    big=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=60),
)
@pytest.mark.slowaudit  # pure-python cross-model audit (10-30 s), opt-in (pytest.ini)
def test_bloom_prefilter_never_false_negative(spark, small, big):
    """Property: bloom_prefilter passes EVERY big-side row whose key is in
    the small side (no false negatives), for arbitrary long keys."""
    from kafka_streams_playground_spark.plans.relational import bloom_prefilter

    small_df = spark.createDataFrame([(k,) for k in set(small)], "k long")
    big_df = spark.createDataFrame([(k,) for k in big], "j long")
    pruned = {r["j"] for r in bloom_prefilter(big_df, small_df, "j", "k").collect()}
    must_pass = set(big) & set(small)
    assert must_pass <= pruned


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    pairs=st.lists(
        st.tuples(st.text("abcde ", max_size=12), st.text("abcde ", max_size=12)),
        min_size=1,
        max_size=20,
    )
)
def test_levenshtein_matches_duckdb(spark, pairs):
    """Cross-engine property: Spark's levenshtein must equal DuckDB's on
    arbitrary strings — the exactness assumption behind the fuzzy
    entity-matching oracle."""
    import duckdb

    from pyspark.sql import functions as F

    df = spark.createDataFrame(pairs, "a string, b string")
    got = [
        r["lev"]
        for r in df.select(F.levenshtein("a", "b").alias("lev")).collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        for a, b in pairs
    ]
    con.close()
    assert got == want


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(docs=st.lists(_doc, min_size=1, max_size=8))
def test_adjacent_pairs_match_lambda_reference(spark, docs):
    """The codegen'd arrays_zip pair construction must produce exactly the
    per-document pair sequence of the interpreted-lambda reference
    formulation (transform(sequence, i -> concat_ws(slice))) — the 5×
    performance rewrite (functions/text.py::adjacent_pair_structs) is only
    valid because the two are element-for-element equal, including on
    single-token documents (both empty)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], ["i", "text"])
    toks = F.split("text", " ")
    ref = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda j: F.concat_ws(" ", F.slice(toks, j, 2)),
    )
    ref = F.when(F.size(toks) >= 2, ref).otherwise(F.array().cast("array<string>"))
    new = F.transform(
        T.adjacent_pair_structs(toks),
        lambda z: F.concat_ws(" ", z["0"], z["1"]),
    )
    rows = df.select("i", ref.alias("a"), new.alias("b")).collect()
    for r in rows:
        assert list(r["a"]) == list(r["b"]), (r["i"], r["a"], r["b"])


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(incs=st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=40))
def test_cusum_prefix_identity_matches_sequential_fold(incs):
    """The window form s_t = P_t − min(0, min_{j≤t} P_j) must equal the
    sequential recurrence s_t = max(0, s_{t-1} + inc_t) on arbitrary
    integer increment sequences (pure Python, no Spark needed — this pins
    the algebra both engines evaluate)."""
    s, P, mn = 0, 0, 0
    for inc in incs:
        s = max(0, s + inc)
        P += inc
        mn = min(mn, P)
        assert s == P - min(mn, 0)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    edges=st.lists(
        st.tuples(st.integers(min_value=0, max_value=14),
                  st.integers(min_value=0, max_value=14)),
        min_size=0, max_size=20,
    )
)
def test_star_contraction_matches_bruteforce_components(spark, edges):
    """Large-star/small-star CC must label every node with its component's
    minimum id on ARBITRARY small graphs (self-loops, parallel edges,
    chains, cliques) — checked against a pure-Python union-find."""
    from pyspark.sql import functions as F

    from kafka_streams_playground_spark.plans.northstar_pipeline import (
        min_label_propagation,
    )

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    nodes = sorted({n for e in edges for n in e})
    want = {n: find(n) for n in nodes}
    # symmetric edge list, the operator's input contract
    sym = [(a, b) for a, b in edges] + [(b, a) for a, b in edges]
    if not sym:
        return
    df = spark.createDataFrame(sym, "src long, dst long")
    labels, _ = min_label_propagation(df)
    got = {r["node"]: r["comp"] for r in labels.collect()}
    assert got == want, (sorted(edges), got, want)


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    lines=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),   # orderkey
            st.integers(min_value=0, max_value=4),   # suppkey
            st.integers(min_value=0, max_value=1),   # late flag
        ),
        min_size=1,
        max_size=30,
    )
)
def test_waiting_charges_match_literal_quantifiers(spark, lines):
    """Q21's single-aggregate rewrite (n_supp > 1 ∧ n_late = 1 ∧ MAX-CASE
    culprit recovery) must equal a LITERAL per-order evaluation of the
    spec's quantifier pair — EXISTS(another supplier on the order) AND
    NOT EXISTS(another late supplier) charging the late supplier — on
    arbitrary (orderkey, suppkey, late) relations. The DuckDB oracle uses
    the same rewrite, so only this test ties the rewrite to the spec
    semantics."""
    from kafka_streams_playground_spark.plans.tpch_completion import (
        waiting_supplier_charges,
    )

    df = spark.createDataFrame(lines, "l_orderkey int, l_suppkey int, late int")
    got = {
        (r["l_orderkey"], r["late_supp"])
        for r in waiting_supplier_charges(df).collect()
    }

    # literal quantifiers: for each order, each late supplier is charged
    # iff another supplier exists on the order and no OTHER supplier is late
    by_order: dict[int, dict[int, bool]] = {}
    for ok, sk, late in lines:
        by_order.setdefault(ok, {})
        by_order[ok][sk] = by_order[ok].get(sk, False) or bool(late)
    want = set()
    for ok, supps in by_order.items():
        late_supps = {s for s, is_late in supps.items() if is_late}
        for s in late_supps:
            if len(supps) > 1 and not (late_supps - {s}):
                want.add((ok, s))
    assert got == want, (sorted(got), sorted(want))


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.lists(
            st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=12,
    ),
    nparts=st.integers(min_value=1, max_value=4),
)
@pytest.mark.slowaudit  # pure-python cross-model audit (10-30 s), opt-in (pytest.ini)
def test_covariance_partials_are_partition_invariant(spark, rows, nparts):
    """The single-pass Gram accumulation must give the same covariance for
    ANY partitioning of the rows (the property that makes the per-batch
    partials a valid distributed aggregate), and must equal a direct
    whole-corpus integer-grid covariance computed in numpy. Uses d=4 via a
    temporary DIM monkeypatch-free path: builds the same partial/assembly
    pipeline inline on a repartitioned DataFrame."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    d = 4
    df = spark.createDataFrame(
        [(r,) for r in rows], "v array<double>"
    ).repartition(nparts)

    def gram_blocks(batches):
        iu, ju = np.triu_indices(d)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            xv = np.stack(pdf["v"].to_numpy())
            xi = np.floor(xv * 1e6 + 0.5).astype(np.int64)
            g = xi.T @ xi
            out = pd.DataFrame(
                {"i": iu, "j": ju, "sxy": g[iu, ju], "sx": 0, "cnt": 0}
            )
            diag = out["i"] == out["j"]
            out.loc[diag, "sx"] = xi.sum(axis=0)
            out.loc[diag, "cnt"] = len(pdf)
            yield out

    agg = (
        df.mapInPandas(gram_blocks, "i long, j long, sxy long, sx long, cnt long")
        .groupBy("i", "j")
        .agg(F.sum("sxy").alias("sxy"), F.sum("sx").alias("sx"), F.sum("cnt").alias("cnt"))
    )
    diag = {r["i"]: (r["sx"], r["cnt"]) for r in agg.filter("i = j").collect()}
    got = {}
    for r in agg.collect():
        sx_i, n = diag[r["i"]]
        sx_j, _ = diag[r["j"]]
        num = n * r["sxy"] - sx_i * sx_j
        den = n * n
        got[(r["i"], r["j"])] = int(abs(num) // den) * (1 if num >= 0 else -1)

    # direct whole-corpus reference on the same integer grid
    xi = np.floor(np.array(rows) * 1e6 + 0.5).astype(np.int64)
    n = len(rows)
    for i in range(d):
        for j in range(i, d):
            num = int(n * int(xi[:, i] @ xi[:, j]) - int(xi[:, i].sum()) * int(xi[:, j].sum()))
            want = abs(num) // (n * n) * (1 if num >= 0 else -1)
            assert got[(i, j)] == want, (i, j, got[(i, j)], want)


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    items=st.lists(
        st.sampled_from("abcdefghijklmnop"), min_size=1, max_size=300
    ),
    cuts=st.lists(st.integers(min_value=0, max_value=300), max_size=6),
    cap=st.integers(min_value=2, max_value=8),
)
def test_misra_gries_union_never_misses_a_heavy_hitter(items, cuts, cap):
    """The two-pass heavy-hitter guarantee (agg_heavy_hitters_twopass):
    for ANY partitioning of the stream into partitions and ANY batch split
    within a partition, the union of per-partition Misra-Gries survivors
    contains every item with global count > n/(cap+1), and each summary
    stays within its O(cap) budget."""
    import pandas as pd

    from kafka_streams_playground_spark.plans.northstar_stats import mg_fold

    bounds = sorted({min(c, len(items)) for c in cuts})
    parts, prev = [], 0
    for b in [*bounds, len(items)]:
        if b > prev:
            parts.append(items[prev:b])
            prev = b
    survivors: set[str] = set()
    for part in parts:
        # split each partition into two batches to exercise the cross-batch
        # fold (Arrow hands mapInPandas a batch iterator, not one frame)
        mid = len(part) // 2
        batches = [
            pd.DataFrame({"pair": pd.Series(part[:mid], dtype="object")}),
            pd.DataFrame({"pair": pd.Series(part[mid:], dtype="object")}),
        ]
        state = mg_fold(iter(batches), cap)
        assert len(state) <= cap
        survivors |= set(state)
    n = len(items)
    true_counts: dict[str, int] = {}
    for x in items:
        true_counts[x] = true_counts.get(x, 0) + 1
    heavy = {x for x, c in true_counts.items() if c * (cap + 1) > n}
    assert heavy <= survivors, (heavy - survivors, parts, cap)


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=0,
        max_size=25,
    ),
    seeds=st.sets(st.integers(0, 9), min_size=1, max_size=3),
    k=st.integers(min_value=1, max_value=4),
)
@pytest.mark.slowaudit  # pure-python cross-model audit (10-30 s), opt-in (pytest.ini)
def test_relax_hops_matches_python_bfs(spark, edges, seeds, k):
    """graph_bfs_hops' relaxation loop equals a pure-Python BFS truncated at
    k hops, on arbitrary directed graphs — pins that k relaxation rounds
    yield exactly min(path length <= k), seeds included at hop 0."""
    from pyspark.sql import functions as F

    from kafka_streams_playground_spark.plans.northstar_stats import relax_hops

    edges = [(s, t) for s, t in edges if s != t]
    adj: dict[int, set[int]] = {}
    for s, t in edges:
        adj.setdefault(s, set()).add(t)
    want = {s: 0 for s in seeds}
    frontier = set(seeds)
    for hop in range(1, k + 1):
        frontier = {
            t for s in frontier for t in adj.get(s, ()) if t not in want
        }
        for t in frontier:
            want[t] = hop

    e_df = spark.createDataFrame(edges or [(99, 98)], "s int, t int")
    if not edges:
        e_df = e_df.filter("s < 0")
    d0 = spark.createDataFrame(
        [(s,) for s in seeds], "node int"
    ).select("node", F.lit(0).cast("long").alias("hops"))
    got = {
        r["node"]: r["hops"] for r in relax_hops(d0, e_df, k).collect()
    }
    assert got == want, (got, want, edges, seeds, k)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    batches=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=5),  # key
                st.integers(min_value=0, max_value=9),  # seq
                st.one_of(st.none(), st.integers(min_value=0, max_value=99)),  # val
            ),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=3,
    )
)
@pytest.mark.slowaudit  # pure-python cross-model audit (10-30 s), opt-in (pytest.ini)
def test_upsert_tombstone_sink_matches_dict_model(spark, tmp_path_factory, batches):
    """Model-based check of the MERGE sink's full I/U/D semantics: applying
    arbitrary batches of (key, seq, value|tombstone) rows through
    upsert_foreach_batch_writer must land exactly the table a plain dict
    model computes — within a batch the max-seq row per key wins (seq ties
    broken identically to the window's arbitrary-but-single-row pick are
    avoided by deduping same-key-same-seq inputs), across batches incoming
    wins, NULL deletes."""
    from kafka_streams_playground_spark.sources.sinks import (
        read_table_version,
        upsert_foreach_batch_writer,
    )

    path = str(tmp_path_factory.mktemp("upsert_prop") / "t")
    write = upsert_foreach_batch_writer(
        path, key_cols=("k",), seq_col="seq", tombstone_col="v"
    )
    model: dict[int, int] = {}
    wrote = False
    for i, rows in enumerate(batches):
        # drop same-(key,seq) duplicates: the window's tie pick is
        # explicitly arbitrary, so the model can't predict it
        uniq = {}
        for k, seq, v in rows:
            uniq[(k, seq)] = v
        rows = [(k, seq, v) for (k, seq), v in uniq.items()]
        df = spark.createDataFrame(rows, "k int, seq int, v int")
        write(df, i)
        wrote = True
        latest = {}
        for k, seq, v in rows:
            if k not in latest or seq > latest[k][0]:
                latest[k] = (seq, v)
        for k, (_, v) in latest.items():
            if v is None:
                model.pop(k, None)
            else:
                model[k] = v
    if wrote:
        got = {r["k"]: r["v"] for r in read_table_version(spark, path).collect()}
        assert got == model


@settings(max_examples=200, deadline=None)
@given(
    a=st.lists(st.integers(min_value=-500, max_value=500), min_size=2, max_size=30),
    b=st.lists(st.integers(min_value=-500, max_value=500), min_size=2, max_size=30),
)
def test_welch_integer_polynomial_matches_fraction_t2(a, b):
    """The n₀²n₁²-cancelled integer-polynomial Welch formula used by
    stats_welch_ttest_halves must equal the exact-fraction t² for ANY
    integer samples (including negative cents and zero-variance halves,
    where both sides agree the statistic is undefined)."""
    from fractions import Fraction

    n0, n1 = len(a), len(b)
    s0, s1 = sum(a), sum(b)
    q0, q1 = sum(x * x for x in a), sum(x * x for x in b)
    A, B = n0 * q0 - s0 * s0, n1 * q1 - s1 * s1
    assert A >= 0 and B >= 0  # Cauchy-Schwarz, the guard's premise
    if A + B == 0:
        return  # both engines filter the row out
    num = (s0 * n1 - s1 * n0) ** 2 * (n0 - 1) * (n1 - 1)
    den = A * n1 * n1 * (n1 - 1) + B * n0 * n0 * (n0 - 1)
    ma, mb = Fraction(s0, n0), Fraction(s1, n1)
    va = Fraction(A, n0 * (n0 - 1))  # n·q − s² = n(n−1)·sample-var
    vb = Fraction(B, n1 * (n1 - 1))
    t2 = (ma - mb) ** 2 / (va / n0 + vb / n1)
    assert Fraction(num, den) == t2
    assert (num * 1000) // den == (t2.numerator * 1000) // t2.denominator


@settings(max_examples=200, deadline=None)
@given(
    xs=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=2, max_size=40),
    k=st.integers(min_value=1, max_value=3),
)
def test_acf_integer_polynomial_matches_fraction(xs, k):
    """ts_autocorrelation_lags' n²-scaled sufficient-sum polynomial must
    equal the exact-fraction lag-k autocorrelation for ANY integer series
    (negative values, constant tails, short series)."""
    from fractions import Fraction

    n = len(xs)
    if n <= k:
        return
    s = sum(xs)
    q = sum(x * x for x in xs)
    den = n * (n * q - s * s)
    if den == 0:
        return  # constant series: both engines filter the row
    p = sum(xs[t] * xs[t - k] for t in range(k, n))
    t_ = sum(xs[t] for t in range(k, n))
    h = sum(xs[t - k] for t in range(k, n))
    num = n * n * p - n * s * (h + t_) + (n - k) * s * s
    m = Fraction(s, n)
    acf = Fraction(
        sum((xs[t] - m) * (xs[t - k] - m) for t in range(k, n)),
        1,
    ) / sum((x - m) ** 2 for x in xs)
    assert Fraction(num, den) == acf
    # the ppm floor both engines compute via the shared pmod trick
    # (python // is already floor division, den > 0 here)
    assert (num * 1_000_000) // den == (acf.numerator * 1_000_000) // acf.denominator


@settings(max_examples=200, deadline=None)
@given(
    vals=st.lists(st.integers(min_value=-50, max_value=50), min_size=2, max_size=40),
)
def test_spearman_d2_equals_pearson_on_permutation_ranks(vals):
    """ts_spearman_daily_trend's d² shortcut is exactly Pearson correlation
    of the two rank permutations whenever both ranks are permutations of
    1..n — which the deterministic (v, day) tie-break guarantees."""
    from fractions import Fraction

    n = len(vals)
    days = list(range(n))
    rx = {d: d + 1 for d in days}
    order = sorted(days, key=lambda d: (vals[d], d))
    ry = {d: i + 1 for i, d in enumerate(order)}
    d2 = sum((rx[d] - ry[d]) ** 2 for d in days)
    rho_d2 = Fraction(n * (n * n - 1) - 6 * d2, n * (n * n - 1))
    # Pearson on the rank vectors, exact fractions
    xs = [rx[d] for d in days]
    ys = [ry[d] for d in days]
    mx, my = Fraction(sum(xs), n), Fraction(sum(ys), n)
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    vx = sum((x - mx) ** 2 for x in xs)
    vy = sum((y - my) ** 2 for y in ys)
    assert vx == vy and vx > 0  # permutations of 1..n have equal variance
    assert rho_d2 == Fraction(cov, vx)
    assert -1 <= rho_d2 <= 1


@settings(max_examples=200, deadline=None)
@given(
    cells=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.integers(min_value=0, max_value=10_000),
        ),
        min_size=2,
        max_size=12,
    )
)
def test_chi2_cleared_cell_terms_match_textbook_fraction(cells):
    """drift_chi2_event_type_halves' division-cleared per-cell term
    (obs·N − rt·ct)²·10⁶ // (N·rt·ct) must floor the EXACT textbook
    (O−E)²/E with E = rt·ct/N for ANY contingency table (zero cells
    included — rows with rt = 0 are impossible by construction since a
    type only exists if it has rows)."""
    from fractions import Fraction

    cells = [(a, b) for a, b in cells if a + b > 0]  # rt > 0 by construction
    if not cells:
        return
    ct_a = sum(a for a, _ in cells)
    ct_b = sum(b for _, b in cells)
    if ct_a == 0 or ct_b == 0:
        return  # both engines filter the degenerate one-sided split
    n = ct_a + ct_b
    for a, b in cells:
        rt = a + b
        for obs, ct in ((a, ct_a), (b, ct_b)):
            e = Fraction(rt * ct, n)
            exact = (obs - e) ** 2 / e * 1_000_000
            cleared = (obs * n - rt * ct) ** 2 * 1_000_000 // (n * rt * ct)
            assert cleared == exact.numerator // exact.denominator


@settings(max_examples=200, deadline=None)
@given(
    xs=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=2, max_size=40),
)
def test_mann_kendall_identities(xs):
    """ts_mann_kendall_trend's integer outputs satisfy the defining
    identities for ANY integer series: S = concordant − discordant with
    concordant + discordant + value-ties = C(n,2); tau_a = S/C(n,2)
    floors onto ppm via the pmod spelling; and the tie-corrected
    18-scaled variance is non-negative and at most the tie-free bound."""
    from collections import Counter
    from fractions import Fraction

    n = len(xs)
    conc = disc = ties = 0
    for i in range(n):
        for j in range(i + 1, n):
            if xs[j] > xs[i]:
                conc += 1
            elif xs[j] < xs[i]:
                disc += 1
            else:
                ties += 1
    s = conc - disc
    pairs = n * (n - 1) // 2
    assert conc + disc + ties == pairs
    # pairwise value-ties relate to group sizes: ties = sum C(t,2)
    assert ties == sum(t * (t - 1) // 2 for t in Counter(xs).values())
    tau = Fraction(s, pairs)
    assert -1 <= tau <= 1
    # the engines' pmod floor division == python's // (floor) on any sign
    assert (s * 1_000_000) // pairs == (
        s * 1_000_000 - ((s * 1_000_000 % pairs + pairs) % pairs)
    ) // pairs
    tie18 = sum(t * (t - 1) * (2 * t + 5) for t in Counter(xs).values())
    var18 = n * (n - 1) * (2 * n + 5) - tie18
    assert 0 <= var18 <= n * (n - 1) * (2 * n + 5)
    if len(set(xs)) == 1:
        assert var18 == 0  # all-tied series has zero-variance S


@settings(max_examples=200, deadline=None)
@given(
    counts=st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=20),
)
def test_simpson_repeat_rate_is_exact_pair_probability(counts):
    """stats_simpson_user_concentration's Σc(c−1)/(N(N−1)) equals the
    exact probability that two draws without replacement share a user,
    verified by direct pair enumeration over the expanded population."""
    from fractions import Fraction

    n = sum(counts)
    if n < 2:
        return
    pop = [u for u, c in enumerate(counts) for _ in range(c)]
    same = sum(
        1 for i in range(n) for j in range(n) if i != j and pop[i] == pop[j]
    )
    rep = sum(c * (c - 1) for c in counts)
    assert Fraction(rep, n * (n - 1)) == Fraction(same, n * (n - 1))
    assert rep == same
    # ppm floor the engines compute (non-negative — plain floor division)
    assert 0 <= rep * 1_000_000 // (n * (n - 1)) <= 1_000_000
    # inverse Simpson bounds: 1 <= N(N-1)/rep... only when rep > 0
    if rep > 0:
        inv = n * (n - 1) * 1_000_000 // rep
        assert inv >= 1_000_000


@settings(max_examples=300, deadline=None)
@given(
    a=st.tuples(
        st.integers(min_value=-100_000, max_value=100_000),
        st.integers(min_value=0, max_value=50_000),
    ),
    b=st.tuples(
        st.integers(min_value=-100_000, max_value=100_000),
        st.integers(min_value=0, max_value=50_000),
    ),
    w=st.integers(min_value=1, max_value=7_200),
)
def test_grid_binning_is_complete_and_verifiable(a, b, w):
    """The interval bin join's core lemma (batch + both streaming forms):
    for ANY two closed intervals and ANY bin width, the intervals OVERLAP
    iff they share at least one grid bin AND pass the row-local predicate
    s_start<=b_end && b_start<=s_end. Bins are modeled with the ENGINE's
    actual semantics (ADVICE r10): explode_to_bins spells ``lo div W`` /
    ``hi div W``, and Spark's ``div`` TRUNCATES toward zero — not floor —
    on negative operands. Completeness survives trunc because trunc-div
    is monotone non-decreasing: any common point p of both intervals has
    trunc(lo/w) <= trunc(p/w) <= trunc(hi/w) on each side, and
    ``sequence`` enumerates that range contiguously, so p's bin is shared.
    Soundness is checked against the ENGINE's emission rule modeled
    independently (ADVICE r11): ``_join_emits`` mirrors the row-local
    post-bin-join filter inside ``join_interval_overlap_bins``
    (plans/temporal.py; ``s_start <= b_end AND b_start <=
    s_end``) symbol-for-symbol rather than reusing this test's ``overlap``
    variable, so the assert fails if that mirrored predicate ever drifts
    from the mathematical overlap condition (e.g. a ``<`` typo or a
    swapped operand in a future edit that is faithfully copied here). It
    cannot detect the mirror and the plan diverging — that direction is
    pinned by the fixture/oracle equality tests on
    ``join_interval_overlap_bins`` itself."""
    s_start, sl = a
    b_start, bl = b
    s_end, b_end = s_start + sl, b_start + bl

    def trunc_div(x):
        # Spark SQL `div` on BIGINT: quotient truncated toward zero
        # (python's // floors; they differ on negative non-multiples)
        q = abs(x) // w
        return -q if x < 0 else q

    def bins(lo, hi):
        return set(range(trunc_div(lo), trunc_div(hi) + 1))

    def _join_emits(ss, se, bs, be):
        # symbol-for-symbol mirror of the engine's row-local filter
        # (plans/temporal.py:2708): keep iff s_start<=b_end AND b_start<=s_end
        return ss <= be and bs <= se

    overlap = s_start <= b_end and b_start <= s_end
    share = bool(bins(s_start, s_end) & bins(b_start, b_end))
    # what the binned join outputs (pre-dedup): shared bin AND the
    # engine's predicate, evaluated as the join would
    emitted = share and _join_emits(s_start, s_end, b_start, b_end)
    if overlap:
        assert share  # completeness: no overlapping pair is missed
    assert emitted == overlap  # mirrored predicate == exact emission
