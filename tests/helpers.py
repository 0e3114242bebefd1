"""Shared oracle-compare helper: replicates the driver's order-insensitive
row-multiset comparison (sorted columns, normalized cells)."""

from __future__ import annotations

import math


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (int, bool)):
        return v
    return str(v)


def norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


def assert_matches_oracle(sdf, duck, oracle_sql: str) -> None:
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(oracle_sql)
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"columns {sorted(s_cols)} != {sorted(d_cols)}"
    assert len(s_rows) == len(d_rows), f"rowcount {len(s_rows)} != {len(d_rows)}"
    assert norm_rows(s_cols, s_rows) == norm_rows(d_cols, d_rows)
