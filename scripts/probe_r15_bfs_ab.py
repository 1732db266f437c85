"""Same-session A/B probe for the bfs_hops round shape (r15 optimization).

A = shipped bfs_hops (per round: union(dist, hop) -> groupBy(id).min —
    the min-agg shuffle carries |dist| + |hop| rows).
B = delta rewrite (per round: hop.groupBy(id) carries |hop| rows only,
    then a full-outer join against the already-partitioned persisted
    dist; frontier-exhaustion check from the count delta instead of a
    separate take(1) job).

Both run on the sf0.1 co-purchase graph through the SAME edge build as
q_graph_bfs; results compared exactly (exceptAll both ways) before any
timing is trusted. Interleaved reps (A,B,A,B,...) so ambient regime
drift cancels (PERFORMANCE.md quotability rule).

Usage: python scripts/probe_r15_bfs_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from smart_energy_consumption_analytics_using_big_data_spark import get_spark
from smart_energy_consumption_analytics_using_big_data_spark.ext.graph import (
    bfs_hops,
    copurchase_pairs,
)
from smart_energy_consumption_analytics_using_big_data_spark.plans._registry import t


def bfs_hops_delta(
    edges: DataFrame,
    seed_mod: int = 10,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
    dedupe: bool = False,
    symmetric_edges: bool = False,
) -> DataFrame:
    """Candidate rewrite of bfs_hops (see module docstring)."""
    ed = edges.select(F.col(src).alias("id"), F.col(dst).alias("__dst")).repartition(
        "id"
    )
    if dedupe:
        ed = ed.dropDuplicates(["id", "__dst"])
    ed = ed.persist()
    ed.count()
    if symmetric_edges:
        seed_rows = ed.select("id")
    else:
        seed_rows = ed.select(
            F.explode(F.array(F.col("id"), F.col("__dst"))).alias("id")
        )
    dist = (
        seed_rows.filter(F.col("id") % seed_mod == 0)
        .distinct()
        .select("id", F.lit(0).cast("int").alias("dist"))
        .persist()
    )
    n_settled = dist.count()
    frontier = dist
    prev = dist
    for k in range(1, max_hops + 1):
        hop_new = (
            ed.join(frontier, "id")
            .select(F.col("__dst").alias("id"))
            .groupBy("id")
            .agg(F.lit(k).cast("int").alias("hdist"))
        )
        dist = (
            dist.join(hop_new, "id", "full")
            .select("id", F.coalesce(F.col("dist"), F.col("hdist")).alias("dist"))
            .persist()
        )
        cnt = dist.count()
        if prev is not None:
            prev.unpersist()
        prev = dist
        if cnt == n_settled:
            break
        n_settled = cnt
        frontier = dist.filter(F.col("dist") == k)
    ed.unpersist()
    return dist


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("probe-r15-bfs-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def build_edges():
        li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        pairs = copurchase_pairs(li, "l_orderkey", "l_partkey")
        return pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
                    F.struct(
                        F.col("id_b").alias("src"), F.col("id_a").alias("dst")
                    ),
                )
            ).alias("e")
        ).select("e.src", "e.dst")

    kw = dict(seed_mod=10, max_hops=4, dedupe=True, symmetric_edges=True)

    # correctness first: exact result equality
    ra = bfs_hops(build_edges(), **kw)
    rb = bfs_hops_delta(build_edges(), **kw)
    extra = ra.exceptAll(rb).count()
    missing = rb.exceptAll(ra).count()
    ra.unpersist()
    rb.unpersist()
    spark.catalog.clearCache()
    print(f"equality: A\\B={extra} B\\A={missing}", flush=True)
    assert extra == 0 and missing == 0, "rewrite changes results — abort"

    variants = {"A_shipped": bfs_hops, "B_delta": bfs_hops_delta}
    # warm both shapes once
    for fn in variants.values():
        fn(build_edges(), **kw).unpersist()
        spark.catalog.clearCache()
    samples: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(reps):
        for name, fn in variants.items():
            t0 = time.time()
            out = fn(build_edges(), **kw)
            out.count()
            samples[name].append(round(time.time() - t0, 3))
            out.unpersist()
            spark.catalog.clearCache()
    med = {
        n: sorted(v)[len(v) // 2] if len(v) % 2 else round(sorted(v)[len(v) // 2 - 1] / 2 + sorted(v)[len(v) // 2] / 2, 3)
        for n, v in samples.items()
    }
    print(json.dumps({"samples": samples, "median": med}))
    spark.stop()


if __name__ == "__main__":
    main()
