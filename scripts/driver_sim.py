"""Correctness-driver simulation: the strictest local gate.

Differences from scripts/check_oracle.py, each mirroring a way the real
driver is less forgiving than the local gate:

* VANILLA SparkSession — no engine session factory, no pinned UTC
  timezone, default 200 shuffle partitions, no nanosAsLong conf.
  Queries must self-apply their runtime confs (catalog.configure_runtime)
  exactly as the driver contract requires.
* goes through ``__spark_entry__`` (the public contract), not the
  internal registry.
* driver-comparator hashability: every output cell must be a hashable
  scalar — a list/dict/ndarray cell is an immediate failure even if the
  values are right (the r3 q_emb_pq_codebook lesson: the driver's hash
  comparator cannot hash list cells, while the stringify-everything
  local gate passes them).
* PHYSICAL-type oracle hashing (the r6 BPE lesson): the driver fetches
  the DuckDB side through pandas, where HUGEINT (an uncast sum(BIGINT))
  and DECIMAL both land as float64 — so a HUGEINT column renders '6.0'
  against Spark's BIGINT '6' and hash-FAILS even when values match.
  ``fetchall()`` collapses both to Python ints and cannot see this, so
  the oracle side is canonicalized from the Arrow table instead, with
  decimal columns coerced through float exactly like the driver's
  pandas path.

Usage: python scripts/driver_sim.py [sf_dir] [names...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(v):
    """Driver-like cell normalization: scalars only, floats rounded."""
    if isinstance(v, (list, dict, set, bytearray)):
        raise TypeError(f"unhashable output cell: {type(v).__name__}")
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            raise TypeError("unhashable output cell: ndarray")
        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.floating):
            v = float(v)
    except ImportError:
        pass
    if isinstance(v, float):
        return round(v, 6)
    return v


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(str(norm(r[i])) for i in order) for r in rows)
    return out


def canon_duck(rel):
    """Canonicalize a DuckDB relation from its Arrow PHYSICAL types.

    HUGEINT exports as decimal128(38,0) and reaches the driver's pandas
    frame as float64; real DECIMAL columns take the same float64 path.
    Coercing decimal cells through float here reproduces the driver's
    rendering ('6.0' for an uncast sum), which plain fetchall() hides.
    """
    import pyarrow as pa

    tbl = rel.arrow()
    cols = list(tbl.column_names)
    hugeint_cols = [
        c for c, t in zip(rel.columns, (str(t) for t in rel.types)) if "HUGEINT" in t
    ]
    pycols = []
    for col in tbl.columns:
        vals = col.to_pylist()
        if pa.types.is_decimal(col.type):
            vals = [None if v is None else float(v) for v in vals]
        pycols.append(vals)
    rows = list(zip(*pycols)) if pycols and len(pycols[0]) else []
    return cols, canon(cols, rows), hugeint_cols


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', 8)}]")
        .appName("driver-sim")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    queries, oracles = E.queries(), E.oracle_sql()

    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")

    n_pass = n_rows_only = 0
    failures = []
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            s_canon = canon(scols, sdf.collect())
        except Exception:
            failures.append((name, "SPARK/HASH ERROR:\n" + traceback.format_exc()))
            print(f"FAIL  {name} (spark or unhashable)")
            continue
        if name not in oracles:
            n_rows_only += 1
            print(f"rows  {name}: {len(s_canon)} ({time.time()-t0:.1f}s)")
            continue
        try:
            _, d_canon, hugeint_cols = canon_duck(con.sql(oracles[name]))
        except Exception:
            failures.append((name, "DUCKDB ERROR:\n" + traceback.format_exc()))
            print(f"FAIL  {name} (duckdb)")
            continue
        if hugeint_cols:
            print(f"WARN  {name}: HUGEINT oracle column(s) {hugeint_cols} — "
                  "cast to BIGINT or the driver will hash-FAIL")
        if s_canon != d_canon:
            diff = [
                f"  spark {a}\n  duck  {b}"
                for a, b in zip(s_canon, d_canon)
                if a != b
            ][:3]
            failures.append(
                (name, f"rows {len(s_canon)} vs {len(d_canon)}\n" + "\n".join(diff))
            )
            print(f"FAIL  {name} (mismatch)")
            continue
        n_pass += 1
        print(f"PASS  {name}: {len(s_canon)} rows ({time.time()-t0:.1f}s)")

    print(f"\n== driver-sim: {n_pass} pass, {n_rows_only} rows-only, {len(failures)} fail ==")
    for name, msg in failures:
        print(f"\n--- {name} ---\n{msg[:2500]}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
