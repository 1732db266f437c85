"""Shared Spark-vs-DuckDB comparison helpers (mirrors the driver's
row-count + schema + order-insensitive value-hash gate)."""

from __future__ import annotations

import datetime as dt
import math


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(float(v))
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    try:
        import numpy as np

        if isinstance(v, np.integer):
            return str(int(v))
        if isinstance(v, np.floating):
            return norm_value(float(v))
    except ImportError:  # pragma: no cover
        pass
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def assert_df_matches_oracle(sdf, con, oracle_sql):
    srows = sdf.collect()
    res = con.execute(oracle_sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols), (
        f"columns: spark={sorted(sdf.columns)} duckdb={sorted(dcols)}"
    )
    s_canon = canon_rows(sdf.columns, srows)
    d_canon = canon_rows(dcols, drows)
    assert len(s_canon) == len(d_canon), f"rows: spark={len(s_canon)} duckdb={len(d_canon)}"
    if s_canon != d_canon:
        diffs = [(a, b) for a, b in zip(s_canon, d_canon) if a != b][:3]
        raise AssertionError(f"value mismatch, first diffs: {diffs}")
