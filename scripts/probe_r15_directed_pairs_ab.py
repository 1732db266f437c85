"""Rotated interleaved A/B: two chained Generates (upper-triangle pair
explode, then both-orientations explode — the current q_graph_bfs /
pagerank / rec_item_sim edge-build shape) vs ONE fused Generate that
enumerates all ordered pairs in-row (`transform(filter(items, y ->
y != x), y -> struct(x, y))` — each item pairs with every other item,
which IS both orientations of the upper triangle, since __items is a
collect_set and therefore duplicate-free).

Each Generate node is a whole-stage-codegen break (guide §1.2 per-task
work); the fused form crosses that break once over the ~2.4M directed
pair rows instead of twice (1.2M canonical + 2.4M oriented).

Measures the full edge-build cost bfs_hops pays (repartition + fused
dedup + persist + count) and the complete q_graph_bfs, rotated variant
order per rep, exceptAll equality on the raw directed-pair output
both ways first.

Usage: python scripts/probe_r15_directed_pairs_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from smart_energy_consumption_analytics_using_big_data_spark import get_spark
from smart_energy_consumption_analytics_using_big_data_spark.ext.graph import (
    bfs_hops,
    copurchase_pairs,
    order_baskets,
)
from smart_energy_consumption_analytics_using_big_data_spark.plans.extensions import t

FUSED = (
    "flatten(transform(__items, x -> "
    "transform(filter(__items, y -> y != x), "
    "y -> struct(x AS src, y AS dst))))"
)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark("probe-r15-directed-pairs-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def edges_a():
        li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        pairs = copurchase_pairs(li, "l_orderkey", "l_partkey")
        return pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
                    F.struct(F.col("id_b").alias("src"), F.col("id_a").alias("dst")),
                )
            ).alias("e")
        ).select("e.src", "e.dst")

    def edges_b():
        li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        baskets = order_baskets(li, "l_orderkey", "l_partkey")
        return (
            baskets.select(F.explode(F.expr(FUSED)).alias("__p"))
            .select("__p.src", "__p.dst")
        )

    da, db = edges_a(), edges_b()
    extra = db.exceptAll(da).count()
    missing = da.exceptAll(db).count()
    print(f"raw directed pairs exceptAll: fused-old={extra} old-fused={missing}",
          flush=True)
    assert extra == 0 and missing == 0, "directed pair sets differ"

    def build(mk):
        ed = (
            mk()
            .select(F.col("src").alias("id"), F.col("dst").alias("__dst"))
            .repartition("id")
            .dropDuplicates(["id", "__dst"])
            .persist()
        )
        ed.count()
        ed.unpersist()
        spark.catalog.clearCache()

    def full(mk):
        bfs_hops(mk(), seed_mod=10, max_hops=4, dedupe=True,
                 symmetric_edges=True).count()
        spark.catalog.clearCache()

    for label, fn in (("edge-build", build), ("full-bfs", full)):
        # warm both shapes (unmeasured)
        fn(edges_a)
        fn(edges_b)
        ta, tb = [], []
        for r in range(reps):
            order = (
                [(edges_a, ta, "A"), (edges_b, tb, "B")]
                if r % 2 == 0
                else [(edges_b, tb, "B"), (edges_a, ta, "A")]
            )
            for mk, sink, vn in order:
                spark.sparkContext.setJobDescription(f"{label} {vn} rep{r}")
                t0 = time.monotonic()
                fn(mk)
                sink.append(time.monotonic() - t0)
        spark.sparkContext.setJobDescription(None)
        wins = sum(1 for a, b in zip(ta, tb) if b < a)
        print(
            f"[{label}] A(two-generate) median={statistics.median(ta):.3f} "
            f"{['%.2f' % x for x in ta]}\n"
            f"[{label}] B(fused)        median={statistics.median(tb):.3f} "
            f"{['%.2f' % x for x in tb]}\n"
            f"[{label}] pairwise B wins: {wins}/{len(ta)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
