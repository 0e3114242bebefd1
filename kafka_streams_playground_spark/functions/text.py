"""Text building blocks: tokens, shingles, MinHash signatures, LSH bands.

Design constraint: every hash must be **cross-engine deterministic** so the
DuckDB oracle can recompute it bit-for-bit. Engine-native hashes differ
(Spark murmur3 vs DuckDB's), so all hashing here goes through ``md5`` —
identical lowercase-hex output in both engines — and MinHash minimizes the
*hex string* (lexicographic min of uniformly-distributed hashes is a valid
min-wise permutation; k independent permutations come from prefixing the
hash input with the function index).

Scale notes: everything is a Catalyst array expression — no UDFs, no
shuffles until the explicit band/group stage; per-row cost is O(tokens × k)
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


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


def minhash_signature(shingles_col: Column, k: int = 16) -> list[Column]:
    """k-function MinHash signature over a shingle set.

    ``sig_i = min_{s in shingles} md5(i || '|' || s)`` — a min-wise hash per
    prefixed family member. Returns k Columns (caller aliases them h0..h{k-1}).

    NB: the per-``i`` closure must be built by a helper, not a two-parameter
    lambda — ``F.transform`` treats a second lambda parameter as the array
    index and would silently override a captured default.
    """

    def _component(i: int):
        prefix = F.lit(f"{i}|")
        return F.array_min(F.transform(shingles_col, lambda s: F.md5(F.concat(prefix, s))))

    return [_component(i) for i in range(k)]


def band_hashes(sig_prefix: str, k: int = 16, rows_per_band: int = 4) -> list[Column]:
    """LSH banding: hash each band of ``rows_per_band`` signature components
    (columns ``{sig_prefix}{i}``) to one bucket id. b = k/r bands; two docs
    collide iff some band agrees — the classic S-curve selectivity."""
    assert k % rows_per_band == 0
    out = []
    for j in range(k // rows_per_band):
        cols = [F.col(f"{sig_prefix}{j * rows_per_band + t}") for t in range(rows_per_band)]
        out.append(F.md5(F.concat_ws("|", *cols)))
    return out


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two array-set columns (verification step
    after LSH candidate generation)."""
    inter = F.size(F.array_intersect(a, b))
    return inter / (F.size(a) + F.size(b) - inter)


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


def duck_minhash_select(k: int = 16) -> str:
    """DuckDB select-list items h0..h{k-1} — the twin of
    :func:`minhash_signature` (applies to a CTE exposing ``sh``)."""
    return ",\n        ".join(
        f"list_min([md5(concat('{i}|', s)) for s in sh]) AS h{i}" for i in range(k)
    )


def duck_band_select(k: int = 16, rows_per_band: int = 4) -> str:
    """DuckDB select-list items b0..b{b-1} — the twin of :func:`band_hashes`."""
    items = []
    for j in range(k // rows_per_band):
        cols = ", ".join(f"h{j * rows_per_band + t}" for t in range(rows_per_band))
        items.append(f"md5(concat_ws('|', {cols})) AS b{j}")
    return ",\n        ".join(items)
