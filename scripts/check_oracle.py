"""Local differential checker: runs every registered query on Spark AND
its DuckDB oracle, compares row multisets exactly (mirrors the driver's
row-count + schema + order-insensitive value-hash gate, but with
per-value diffs for debugging).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, ".")

from smart_energy_consumption_analytics_using_big_data_spark import get_spark
from smart_energy_consumption_analytics_using_big_data_spark.plans import ORACLE, QUERIES
from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import TESTDATA_TABLES


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(float(v))
    if isinstance(v, (dt.datetime,)):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    try:
        import numpy as np

        if isinstance(v, np.integer):
            return str(int(v))
        if isinstance(v, np.floating):
            return norm_value(float(v))
        if isinstance(v, np.datetime64):
            return str(v)
    except ImportError:
        pass
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_value(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )

    spark = get_spark("oracle-check")
    failures, passes, rows_only = [], [], []
    for name, fn in sorted(QUERIES.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception:
            failures.append((name, "SPARK ERROR:\n" + traceback.format_exc()))
            print(f"FAIL  {name}  (spark error)")
            continue
        if name not in ORACLE:
            rows_only.append((name, len(srows)))
            print(f"rows  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(ORACLE[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception:
            failures.append((name, "DUCKDB ERROR:\n" + traceback.format_exc()))
            print(f"FAIL  {name}  (duckdb error)")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append((name, f"columns differ: spark={sorted(scols)} duckdb={sorted(dcols)}"))
            print(f"FAIL  {name}  (columns)")
            continue
        _, s_canon = canon_rows(scols, srows)
        _, d_canon = canon_rows(dcols, drows)
        if len(s_canon) != len(d_canon):
            failures.append((name, f"row count: spark={len(s_canon)} duckdb={len(d_canon)}"))
            print(f"FAIL  {name}  (rowcount {len(s_canon)} vs {len(d_canon)})")
            continue
        if s_canon != d_canon:
            diff = []
            for a, b in zip(s_canon, d_canon):
                if a != b:
                    diff.append(f"  spark {a}\n  duck  {b}")
                    if len(diff) >= 5:
                        break
            failures.append((name, "value mismatch (first diffs):\n" + "\n".join(diff)))
            print(f"FAIL  {name}  (values)")
            continue
        passes.append(name)
        print(f"PASS  {name}: {len(s_canon)} rows ({time.time()-t0:.1f}s)")

    print(f"\n== {len(passes)} pass, {len(rows_only)} rows-only, {len(failures)} fail ==")
    for name, msg in failures:
        print(f"\n--- {name} ---\n{msg[:3000]}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
