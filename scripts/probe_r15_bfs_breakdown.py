"""Where q_graph_bfs's wall time actually goes: fixed edge-build cost
vs per-round marginal cost.

Times (a) the edge build alone — the same repartition + fused dedup +
persist + count that bfs_hops pays before round 1 — and (b) the full
query at max_hops 1..4, all in one warmed session. r15 finding at
sf0.1 (idle machine, 3 reps each):

    edges build+persist: 2.31-2.60 s   (2,392,000 deduped rows)
    max_hops=1: 3.17 s   max_hops=2: 3.52 s
    max_hops=3: 4.13 s   max_hops=4: 3.65 s (frontier exhausts early
                                             on some reps)

i.e. the edge build is ~65-70% of the query and each relaxation round
costs only ~0.35-0.5 s (near the multi-job scheduler floor for its
join + union-min-agg + persist-pin count). The r15 "not yet
optimized" item on round count is therefore capped at ~1.4 s of the
5.7 s in-suite figure; any future BFS work should target the basket
aggregation + pair-expansion build, whose shape (one agg shuffle, one
repartition exchange, in-row enumeration) already beat the self-join
alternatives measured in r7/r9.

Usage: python scripts/probe_r15_bfs_breakdown.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from smart_energy_consumption_analytics_using_big_data_spark import get_spark
from smart_energy_consumption_analytics_using_big_data_spark.ext.graph import (
    bfs_hops,
    copurchase_pairs,
)
from smart_energy_consumption_analytics_using_big_data_spark.plans.extensions import t


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("probe-r15-bfs-breakdown")
    spark.sparkContext.setLogLevel("ERROR")

    def build_edges():
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

    # warm both plan shapes (unmeasured)
    bfs_hops(build_edges(), seed_mod=10, max_hops=4, dedupe=True,
             symmetric_edges=True).count()
    spark.catalog.clearCache()

    for rep in range(3):
        spark.sparkContext.setJobDescription(f"edges build rep{rep}")
        t0 = time.monotonic()
        ed = (
            build_edges()
            .select(F.col("src").alias("id"), F.col("dst").alias("__dst"))
            .repartition("id")
            .dropDuplicates(["id", "__dst"])
            .persist()
        )
        n = ed.count()
        print(f"edges build+persist: {time.monotonic()-t0:.3f}s rows={n}", flush=True)
        ed.unpersist()
        spark.catalog.clearCache()

    for mh in (1, 2, 3, 4):
        ts = []
        for rep in range(3):
            spark.sparkContext.setJobDescription(f"bfs max_hops={mh} rep{rep}")
            t0 = time.monotonic()
            bfs_hops(build_edges(), seed_mod=10, max_hops=mh, dedupe=True,
                     symmetric_edges=True).count()
            ts.append(time.monotonic() - t0)
            spark.catalog.clearCache()
        print(f"max_hops={mh}: {sorted(ts)[1]:.3f}s  {['%.2f' % x for x in ts]}",
              flush=True)
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
