"""Text building blocks: tokens, shingles, MinHash signatures, LSH bands.

Design constraint: every hash must be **cross-engine deterministic** so the
DuckDB oracle can recompute it bit-for-bit. Engine-native hashes differ
(Spark murmur3 vs DuckDB's), so base hashing goes through ``md5`` —
identical lowercase-hex output in both engines. Each shingle is md5'd
exactly ONCE into a 32-bit integer; the k MinHash permutations are then
cheap integer affine maps ``(a_i·h + b_i) mod P`` (P = 2^61−1, products
bounded below 2^63 so plain BIGINT arithmetic agrees in both engines).
This is ~k× cheaper than k independent md5 passes and is the classic
universal-hash MinHash construction.

Scale notes: everything is a Catalyst array expression — no UDFs, no
shuffles until the explicit band/group stage; per-row cost is
O(tokens) md5 + O(tokens × k) integer ops inside whole-stage codegen.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = (1 << 61) - 1  # prime modulus; a·h+b < 2^62 fits BIGINT


def _affine_params(i: int) -> tuple[int, int]:
    """Deterministic per-function odd multiplier a < 2^30 and offset b —
    derived from the Knuth multiplicative constant so Spark and DuckDB SQL
    are generated from the same literals."""
    a = ((2 * i + 1) * 2654435761) % (1 << 30) | 1
    b = (i * 40503 + 12345) % (1 << 30)
    return a, b


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (documents.text is space-separated)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def shingles(tokens_col: Column, n: int = 3) -> Column:
    """Distinct token n-gram shingles as space-joined strings.

    1-based ``slice``; documents shorter than ``n`` tokens fall back to one
    whole-text shingle so every doc has a non-empty set.
    DuckDB twin: ``list_distinct([array_to_string(toks[i:i+n-1],' ')
    for i in range(1, len(toks)-n+2)])``.
    """
    grams = F.transform(
        F.sequence(F.lit(1), F.size(tokens_col) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(tokens_col, i, n)),
    )
    return F.when(F.size(tokens_col) >= n, F.array_distinct(grams)).otherwise(
        F.array(F.concat_ws(" ", tokens_col))
    )


def shingle_hashes(shingles_col: Column) -> Column:
    """One 32-bit integer hash per shingle: the first 8 hex digits of its
    md5, as BIGINT. The single md5 pass all MinHash permutations reuse."""
    return F.transform(
        shingles_col,
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
    )


def minhash_signature(hashes_col: Column, k: int = 16) -> list[Column]:
    """k-function MinHash signature over pre-hashed shingles
    (:func:`shingle_hashes` output).

    ``sig_i = min_h (a_i·h + b_i) mod P`` — universal-hash permutations over
    the 32-bit base hash. Returns k BIGINT Columns (caller aliases h0..h{k-1}).

    NB: the per-``i`` closure must be built by a helper, not a two-parameter
    lambda — ``F.transform`` treats a second lambda parameter as the array
    index and would silently override a captured default.
    """

    def _component(i: int):
        a, b = _affine_params(i)
        return F.array_min(
            F.transform(hashes_col, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_P))
        )

    return [_component(i) for i in range(k)]


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two array-set columns (verification step
    after LSH candidate generation)."""
    inter = F.size(F.array_intersect(a, b))
    return inter / (F.size(a) + F.size(b) - inter)


def adjacent_pair_structs(toks: Column) -> Column:
    """Adjacent-token-pair structs: element i = struct(toks[i], toks[i+1])
    (fields "0"/"1") — the 2-gram list behind BPE pair counting and
    bigram-LM scoring. Built from ``arrays_zip`` over two shifted slices,
    ALL codegen'd; consumers explode and then ``concat_ws(" ", z["0"],
    z["1"])`` POST-explode. The lambda formulation
    (``transform(sequence(...), i -> concat_ws(slice(toks,i,2)))``) is
    interpreted per element by Catalyst and measured 5× slower on the
    sf0.1 corpus (the same HOF trap the BPE merge step hit; even a
    transform over the zip halves the win — keep the row path
    lambda-free). Empty for single-token inputs."""
    n = F.size(toks)
    return F.arrays_zip(F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1))


def adjacent_triple_structs(toks: Column) -> Column:
    """Adjacent-token-triple structs: element i = struct(toks[i], toks[i+1],
    toks[i+2]) (fields "0"/"1"/"2") — the 3-gram list behind Stupid-Backoff
    trigram scoring. Same codegen'd arrays_zip-over-shifted-slices recipe as
    :func:`adjacent_pair_structs` (the HOF-lambda form is interpreted per
    element — measured 5x slower). Empty for inputs under three tokens."""
    n = F.size(toks)
    return F.arrays_zip(
        F.slice(toks, 1, n - 2), F.slice(toks, 2, n - 2), F.slice(toks, 3, n - 2)
    )


# ---------------------------------------------------------------------------
# DuckDB SQL fragment twins (kept next to the Spark forms they mirror, so a
# change to one is a change to both). Used by the oracle strings in
# plans/northstar_*.py.
# ---------------------------------------------------------------------------

def duck_shingles_cte(table: str = "documents", n: int = 3) -> str:
    """DuckDB CTE producing (doc_id, sh) — the twin of :func:`shingles`."""
    return f"""
    tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM {table}),
    sh AS (
      SELECT doc_id,
        CASE WHEN len(toks) >= {n}
          THEN list_distinct([array_to_string(toks[i:i+{n - 1}], ' ')
                             for i in range(1, len(toks) - {n - 2})])
          ELSE [array_to_string(toks, ' ')]
        END AS sh
      FROM tok
    )"""


def duck_shingle_hashes() -> str:
    """DuckDB expression for ``hs`` — the twin of :func:`shingle_hashes`
    (applies to a CTE exposing ``sh``)."""
    return "[(('0x' || substr(md5(s), 1, 8)))::BIGINT for s in sh]"


def duck_minhash_select(k: int = 16) -> str:
    """DuckDB select-list items h0..h{k-1} — the twin of
    :func:`minhash_signature` (applies to a CTE exposing ``hs``)."""
    items = []
    for i in range(k):
        a, b = _affine_params(i)
        items.append(f"list_min([({a} * h + {b}) % {MERSENNE_P} for h in hs]) AS h{i}")
    return ",\n        ".join(items)


def duck_band_select(k: int = 16, rows_per_band: int = 4) -> str:
    """DuckDB select-list items b0..b{b-1} — the twin of :func:`band_hashes`."""
    items = []
    for j in range(k // rows_per_band):
        cols = ", ".join(f"h{j * rows_per_band + t}" for t in range(rows_per_band))
        items.append(f"concat_ws('|', {cols}) AS b{j}")
    return ",\n        ".join(items)


def shingle_sig_fn(k: int = 16, n: int = 3):
    """Arrow-batched twin of ``shingles → shingle_hashes → minhash_signature``:
    one pandas-UDF body computing, per document text, the distinct 32-bit
    shingle hashes (``hs``) and the k-component MinHash signature (``sig``).

    Bit-identical to the Catalyst pipeline (hashlib md5 == JVM md5 == DuckDB
    md5 on the same bytes; the affine mins are order-free), but the md5+mins
    run in one Python pass instead of interpreted Catalyst higher-order
    expressions (~2× on the LSH hot path). Returned ``hs`` is sorted
    (np.unique) — downstream uses are set-semantics only.

    Use with ``F.pandas_udf(shingle_sig_fn(k), "hs array<bigint>,
    sig array<bigint>")`` built lazily at query time.
    """

    def fn(texts: pd.Series) -> pd.DataFrame:
        import hashlib

        import numpy as np

        a = np.array([_affine_params(i)[0] for i in range(k)], dtype=np.int64)
        b = np.array([_affine_params(i)[1] for i in range(k)], dtype=np.int64)
        hs_out, sig_out = [], []
        for t in texts:
            toks = t.split(" ")
            if len(toks) >= n:
                sh = dict.fromkeys(
                    " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                )
            else:
                sh = {" ".join(toks): None}
            h = np.unique(
                np.array(
                    [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in sh],
                    dtype=np.int64,
                )
            )
            # a·h + b < 2^30·2^32 + 2^30 < 2^63: no overflow in int64.
            sig = ((h[None, :] * a[:, None] + b[:, None]) % MERSENNE_P).min(axis=1)
            hs_out.append(h)
            sig_out.append(sig)
        return pd.DataFrame({"hs": hs_out, "sig": sig_out})

    return fn


def shingle_hash_fn(n: int = 3):
    """Arrow-batched twin of ``shingles → shingle_hashes`` alone (no MinHash
    signature) — for consumers that need only the distinct 32-bit shingle
    hash set (the KMV source sketches). Same bit-identity argument as
    :func:`shingle_sig_fn`; returned array is sorted (np.unique), which is
    immaterial to set-semantics consumers.

    Use with ``F.pandas_udf(shingle_hash_fn(), "array<bigint>")`` built
    lazily at query time.
    """

    def fn(texts: pd.Series) -> pd.Series:
        import hashlib

        import numpy as np

        out = []
        for t in texts:
            toks = t.split(" ")
            if len(toks) >= n:
                sh = dict.fromkeys(
                    " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                )
            else:
                sh = {" ".join(toks): None}
            out.append(
                np.unique(
                    np.array(
                        [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in sh],
                        dtype=np.int64,
                    )
                )
            )
        return pd.Series(out)

    return fn
