"""Round-13 measurement probes (VERDICT r12 items 1 and 5).

1. DRIFT ATTRIBUTION — the sf0.1 headline suite total moved 36.91 ->
   40.87 s r11->r12 (+10.7%) with flat small-suite/diagnostics and a
   +5.6% calibration drift; the r12 record had no per-query solo A/B
   behind the "regime, not code" read. This probe runs the five
   biggest in-suite entries SOLO (1 warm-up + 4 measured reps each,
   count-forced exactly like bench.run_one so numbers are comparable
   to the in-suite readings), calibration-bracketed, in one fresh
   session. Per the quotability protocol (PERFORMANCE.md r11): a
   cross-round delta is real only if it survives dividing by the
   session calibration; solo medians are the gold standard.

2. TRIANGLE VARIANCE BAND + STORAGE-LEVEL A/B — q_graph_triangles'
   in-suite wall swings ±40% across rounds (widest of any probe, and
   what triggered this attribution). (a) Establish a SOLO
   calibration-bracketed band as the standing record (6 reps); (b) A/B
   the lazy localCheckpoint's storage level at 10x lineitem
   (disjoint-replica derived data, scale_probe.py recipe), interleaved
   so ambient drift cancels: default (MEMORY_AND_DISK_DESER) vs
   MEMORY_ONLY vs DISK_ONLY vs MEMORY_AND_DISK (serialized).

Results recorded in PERFORMANCE.md ("Round 13"); output JSON to
drift_probe_r13.json. Derived data is an analysis artifact only.

Usage: python scripts/probe_r13_drift.py [--skip-ab] [--skip-solo]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from bench import run_calibration, run_one
from smart_energy_consumption_analytics_using_big_data_spark import get_spark
from smart_energy_consumption_analytics_using_big_data_spark.ext.graph import (
    copurchase_pairs,
    oriented_triangles,
)
from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import load_table

SF01 = "/root/testdata/sf0.1"

# the five biggest r12 in-suite entries (BENCH_local r12) + triangles
MOVERS = (
    "q_graph_bfs",            # 6.545 in-suite r12
    "q_dedup_simhash_arrow",  # 3.183
    "q_text_textrank",        # 3.029
    "q_ml_anomaly_kmeans",    # 2.789
    "q_dedup_ppjoin",         # 2.155
)

AB_LEVELS = (
    ("default", None),
    ("memory_only", StorageLevel.MEMORY_ONLY),
    ("disk_only", StorageLevel.DISK_ONLY),
    ("memory_and_disk_ser", StorageLevel.MEMORY_AND_DISK),
)


def solo_medians(spark, names, reps: int = 4) -> dict:
    out = {}
    for name in names:
        run_one(spark, SF01, name)  # warm-up, not recorded
        samples = [round(run_one(spark, SF01, name), 3) for _ in range(reps)]
        med = round(statistics.median(samples), 3)
        spread = round((max(samples) - min(samples)) / med * 100, 1)
        out[name] = {"samples": samples, "median": med, "spread_pct": spread}
        print(json.dumps({name: out[name]}), file=sys.stderr)
    return out


def build_lineitem_10x(spark, out_dir: str) -> str:
    """10x lineitem, disjoint replicas (scale_probe.build_derived's
    lineitem block; only the columns the triangle query touches)."""
    path = f"{out_dir}/lineitem.parquet"
    # _SUCCESS, not bare existence: a crashed prior run leaves a partial
    # directory that would silently shrink the "10x" corpus
    if os.path.exists(f"{path}/_SUCCESS"):
        return out_dir
    li = load_table(spark, SF01, "lineitem").select("l_orderkey", "l_partkey")
    parts = [
        li.select(
            (F.col("l_orderkey") + F.lit(i * 100_000_000)).alias("l_orderkey"),
            (F.col("l_partkey") + F.lit(i * 10_000_000)).alias("l_partkey"),
        )
        for i in range(10)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.write.mode("overwrite").parquet(path)
    return out_dir

def triangles_once(spark, sf_dir: str, level) -> tuple[float, int]:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = (
        copurchase_pairs(li, "l_orderkey", "l_partkey")
        .select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .distinct()
    )
    t0 = time.time()
    n = (
        oriented_triangles(edges, checkpoint_storage=level)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()[0]["n"]
    )
    elapsed = time.time() - t0
    spark.catalog.clearCache()
    return elapsed, int(n)


def storage_ab(spark, big_dir: str, reps: int = 2) -> dict:
    out = {name: {"samples": [], "n_triangles": None} for name, _ in AB_LEVELS}
    # warm the input scans once so rep 1 of the first level isn't cold
    triangles_once(spark, big_dir, None)
    for _ in range(reps):  # interleaved: drift hits all levels equally
        for name, level in AB_LEVELS:
            secs, n = triangles_once(spark, big_dir, level)
            out[name]["samples"].append(round(secs, 2))
            out[name]["n_triangles"] = n
            print(json.dumps({f"ab_{name}": round(secs, 2), "n": n}), file=sys.stderr)
    for name, _ in AB_LEVELS:
        out[name]["median"] = round(statistics.median(out[name]["samples"]), 2)
    return out


def main() -> None:
    report: dict = {}
    spark = get_spark("probe-r13")
    spark.sparkContext.setLogLevel("ERROR")
    report["calibration_start"] = run_calibration(spark)
    if "--skip-solo" not in sys.argv:
        report["solo_movers"] = solo_medians(spark, MOVERS, reps=4)
        report["solo_triangles"] = solo_medians(spark, ("q_graph_triangles",), reps=6)
    if "--skip-ab" not in sys.argv:
        big = build_lineitem_10x(spark, "/tmp/spark_graft_r13_tri10x")
        report["triangle_storage_ab_10x"] = storage_ab(spark, big)
    report["calibration_end"] = run_calibration(spark)
    print(json.dumps(report, indent=2))
    with open(os.path.join(os.path.dirname(__file__), "..", "drift_probe_r13.json"), "w") as fh:
        json.dump(report, fh, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
