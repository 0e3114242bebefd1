"""Shared oracle-compare helper: replicates the driver's order-insensitive
row-multiset comparison (sorted columns, normalized cells).

Driver fidelity (round-2 lesson, ADVICE r2-medium): the driver fetches BOTH
sides through pandas, so (a) DuckDB HUGEINT — the result type of
``SUM(integer)`` — coerces to float64 and fails type-strict comparison
against Spark's int64, and (b) nullable long columns with NULLs become
float64 on both sides and still match. This helper reproduces both: pandas
fetch on both sides, cells tagged by type so int never equals float.
"""

from __future__ import annotations

import math


def _norm_cell(v):
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT or v is pd.NA:
        return None
    if isinstance(v, (float, np.floating)):
        # pandas renders missing ints as NaN; any NaN is null.
        if math.isnan(float(v)):
            return None
        return ("f", round(float(v), 6))
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (np.ndarray, list, tuple, dict, set)):
        # Driver fidelity (round-4 lesson): the driver's pandas canonicalizer
        # crashes on non-scalar cells; a str(v) fallthrough here would let
        # array-typed outputs pass locally while the driver errors.
        raise TypeError(
            f"driver-hostile output cell type {type(v).__name__}: emit a "
            "'|'-joined string instead (orders_products_array pattern)"
        )
    return ("s", str(v))


def norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


def assert_matches_oracle(sdf, duck, oracle_sql: str) -> None:
    s_cols = list(sdf.columns)
    spdf = sdf.toPandas()
    s_rows = [tuple(t) for t in spdf.itertuples(index=False, name=None)]
    ddf = duck.execute(oracle_sql).df()
    d_cols = list(ddf.columns)
    d_rows = [tuple(t) for t in ddf.itertuples(index=False, name=None)]
    assert sorted(s_cols) == sorted(d_cols), f"columns {sorted(s_cols)} != {sorted(d_cols)}"
    assert len(s_rows) == len(d_rows), f"rowcount {len(s_rows)} != {len(d_rows)}"
    assert norm_rows(s_cols, s_rows) == norm_rows(d_cols, d_rows)
