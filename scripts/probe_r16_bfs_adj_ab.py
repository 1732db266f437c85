"""Same-session A/B probe: edge-row BFS vs adjacency-list BFS (r16).

A = shipped bfs_hops: the edge build repartitions the full directed
    pair expansion on id (|E|-row exchange), fuses the (id, __dst)
    dedup into it, and persists 2.39M edge rows at sf0.1; every round
    joins the frontier against those |E| rows.
B = adjacency rewrite: groupBy(id).agg(sort_array(collect_set(__dst)))
    — ONE aggregation exchange whose map side partially dedups the
    pair expansion before it is shuffled (guide §2.3
    aggregate-before-shuffle), persisting |V| array rows (~20k at
    sf0.1) instead of |E| edge rows; each round joins the frontier
    against |V| rows and explodes the matched neighbor arrays AFTER
    the join. Hop-row multiset per round is identical (the distinct
    neighbor set of each frontier node), so the min-relaxation output
    is byte-identical.

Equality gate (exceptAll both ways, raised not asserted) runs before
any timing; reps interleave A,B,A,B so ambient regime drift cancels.

Usage: python scripts/probe_r16_bfs_adj_ab.py [sf_dir] [reps]
  sf_dir may be the 10x derived dir built by scripts/scale_probe.py.
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


def bfs_hops_adj(
    edges: DataFrame,
    seed_mod: int = 10,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
    dedupe: bool = False,  # noqa: ARG001 - collect_set dedups inherently
    symmetric_edges: bool = False,
) -> DataFrame:
    """Candidate adjacency-list rewrite of bfs_hops (module docstring)."""
    ed = edges.select(F.col(src).alias("id"), F.col(dst).alias("__dst"))
    adj = (
        ed.groupBy("id")
        .agg(F.array_sort(F.collect_set("__dst")).alias("__nbrs"))
        .persist()
    )
    adj.count()
    if symmetric_edges:
        # adjacency keys are distinct by construction (groupBy output)
        dist = (
            adj.select("id")
            .filter(F.col("id") % seed_mod == 0)
            .select("id", F.lit(0).alias("dist"))
            .persist()
        )
    else:
        seed_rows = adj.select(
            F.explode(
                F.concat(F.array(F.col("id")), F.col("__nbrs"))
            ).alias("id")
        )
        dist = (
            seed_rows.filter(F.col("id") % seed_mod == 0)
            .distinct()
            .select("id", F.lit(0).alias("dist"))
            .persist()
        )
    n_settled = dist.count()
    frontier = dist
    prev = dist
    for k in range(1, max_hops + 1):
        hop = adj.join(frontier, "id").select(
            F.explode("__nbrs").alias("id"), F.lit(k).cast("int").alias("dist")
        )
        dist = (
            dist.unionByName(hop)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
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
    adj.unpersist()
    return dist


def bfs_hops_adj2(
    edges: DataFrame,
    seed_mod: int = 10,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
    dedupe: bool = False,  # noqa: ARG001 - the collect_set dedups inherently
    symmetric_edges: bool = False,
) -> DataFrame:
    """Variant C: keep A's proven repartition + fused-dedup edge build
    (codegen HashAggregate dedup beat the ObjectHashAggregate partial
    collect_set of variant B at sf0.1), then fold the deduped edges
    into per-node neighbor arrays ON THE SAME PARTITIONING (groupBy(id)
    over HashPartitioning(id) plans no exchange) so only |V| array rows
    persist and each round joins |V| rows instead of |E|."""
    ed = edges.select(F.col(src).alias("id"), F.col(dst).alias("__dst")).repartition(
        "id"
    )
    ed = ed.dropDuplicates(["id", "__dst"])
    adj = (
        ed.groupBy("id")
        .agg(F.array_sort(F.collect_set("__dst")).alias("__nbrs"))
        .persist()
    )
    adj.count()
    if symmetric_edges:
        dist = (
            adj.select("id")
            .filter(F.col("id") % seed_mod == 0)
            .select("id", F.lit(0).alias("dist"))
            .persist()
        )
    else:
        seed_rows = adj.select(
            F.explode(F.concat(F.array(F.col("id")), F.col("__nbrs"))).alias("id")
        )
        dist = (
            seed_rows.filter(F.col("id") % seed_mod == 0)
            .distinct()
            .select("id", F.lit(0).alias("dist"))
            .persist()
        )
    n_settled = dist.count()
    frontier = dist
    prev = dist
    for k in range(1, max_hops + 1):
        hop = adj.join(frontier, "id").select(
            F.explode("__nbrs").alias("id"), F.lit(k).cast("int").alias("dist")
        )
        dist = (
            dist.unionByName(hop)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
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
    adj.unpersist()
    return dist


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("probe-r16-bfs-adj-ab")
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

    # correctness first: exact result equality (both orientations)
    ra = bfs_hops(build_edges(), **kw)
    rb = bfs_hops_adj(build_edges(), **kw)
    extra = ra.exceptAll(rb).count()
    missing = rb.exceptAll(ra).count()
    ra.unpersist()
    rb.unpersist()
    spark.catalog.clearCache()
    print(f"equality(symmetric): A\\B={extra} B\\A={missing}", flush=True)
    if extra or missing:
        raise RuntimeError("adjacency rewrite changes results — abort")

    # also gate the non-symmetric seed path (directed input, no dedupe)
    kw_dir = dict(seed_mod=10, max_hops=3, dedupe=False, symmetric_edges=False)
    directed = build_edges().filter(F.col("src") < F.col("dst"))
    ra = bfs_hops(directed, **kw_dir)
    rb = bfs_hops_adj(build_edges().filter(F.col("src") < F.col("dst")), **kw_dir)
    extra = ra.exceptAll(rb).count()
    missing = rb.exceptAll(ra).count()
    ra.unpersist()
    rb.unpersist()
    spark.catalog.clearCache()
    print(f"equality(directed):  A\\B={extra} B\\A={missing}", flush=True)
    if extra or missing:
        raise RuntimeError("adjacency rewrite changes results (directed) — abort")

    rc = bfs_hops_adj2(build_edges(), **kw)
    ra = bfs_hops(build_edges(), **kw)
    extra = rc.exceptAll(ra).count()
    missing = ra.exceptAll(rc).count()
    print(f"equality(C vs A, symmetric): C\\A={extra} A\\C={missing}", flush=True)
    rc.unpersist()
    ra.unpersist()
    spark.catalog.clearCache()
    if extra or missing:
        raise RuntimeError("variant C changes results — abort")

    variants = {
        "A_shipped": bfs_hops,
        "B_adjacency": bfs_hops_adj,
        "C_dedup_then_adj": bfs_hops_adj2,
    }
    # warm both shapes once
    for fn in variants.values():
        fn(build_edges(), **kw).unpersist()
        spark.catalog.clearCache()
    samples: dict[str, list[float]] = {n: [] for n in variants}
    order = list(variants.items())
    for rep in range(reps):
        # rotate the within-rep order so an ambient regime drifting
        # monotonically across the rep cannot systematically favor the
        # variants timed later (the r15 SHJ-probe position-bias lesson)
        order = order[1:] + order[:1]
        for name, fn in order:
            spark.sparkContext.setJobDescription(f"bfs-adj {name} rep{rep}")
            t0 = time.time()
            out = fn(build_edges(), **kw)
            out.count()
            samples[name].append(round(time.time() - t0, 3))
            out.unpersist()
            spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(None)

    def med(v: list[float]) -> float:
        s = sorted(v)
        n = len(s)
        return s[n // 2] if n % 2 else round((s[n // 2 - 1] + s[n // 2]) / 2, 3)

    pairwise = {
        name: f"{sum(1 for a, b in zip(samples['A_shipped'], samples[name]) if b < a)}/{reps}"
        for name in samples
        if name != "A_shipped"
    }
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "samples": samples,
                "median": {n: med(v) for n, v in samples.items()},
                "faster_than_A_pairwise": pairwise,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
