"""Round-12 targeted shape probes (VERDICT r11 item 4): the two scale
claims the standing three-point probe can't isolate.

1. TRIANGLE HUB SKEW — the arboricity claim. `oriented_triangles`
   promises the wedge join fans out from low-degree endpoints only, so
   a hub node (degree h) costs O(m) after orientation instead of the
   O(h^2) a naive u-joins-u formulation pays. Probe: an Erdos-Renyi
   control graph vs the same graph PLUS one hub wired to `hub_frac` of
   all nodes, at 1x and 4x node count. If the orientation works, the
   hub adds ~|hub edges| of work, not h^2 wedges; a naive formulation
   is run alongside on the SMALL graphs as the counterfactual.

2. kNN-JOIN SALT WIDTH — `knn_join(n_salt)` bounds stage-1 window
   partitions at ~N/n_salt rows. Probe: corpus at 1x/10x/100x of the
   sf0.1 embeddings, n_salt in {1, 8, 32}; at the big corpus the
   unsalted (n_salt=1) variant must degrade relative to 8/32 because
   each of the |Q| window partitions sorts the whole corpus in one
   task. Reports wall seconds per (scale, salt).

Results are recorded in PERFORMANCE.md ("Round 12" section); this
script is the reproducer. Derived data is an analysis artifact only.

Usage: python scripts/probe_r12_shapes.py [--skip-knn] [--skip-tri]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from smart_energy_consumption_analytics_using_big_data_spark import get_spark
from smart_energy_consumption_analytics_using_big_data_spark.ext.graph import oriented_triangles
from smart_energy_consumption_analytics_using_big_data_spark.ext.similarity import knn_join
from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import load_table

SF01 = "/root/testdata/sf0.1"


def _er_edges(spark, n_nodes: int, n_edges: int, seed: int):
    """Deterministic pseudo-random simple graph: hash-derived endpoint
    pairs, self-loops dropped, canonicalized u<v, deduped."""
    e = spark.range(n_edges * 2).select(  # over-generate, dedup below
        (F.xxhash64(F.col("id"), F.lit(seed)) % n_nodes).alias("a"),
        (F.xxhash64(F.col("id"), F.lit(seed + 1)) % n_nodes).alias("b"),
    )
    e = e.select(F.abs("a").alias("a"), F.abs("b").alias("b")).filter("a <> b")
    e = e.select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
    return e.distinct().limit(n_edges)


def _hub_edges(spark, n_nodes: int, hub_frac: float):
    """One hub (id = n_nodes) wired to hub_frac of all nodes."""
    k = int(n_nodes * hub_frac)
    return spark.range(k).select(
        F.col("id").alias("u"), F.lit(n_nodes).cast("long").alias("v")
    )


def _naive_triangle_count(edges) -> int:
    """The counterfactual: symmetric closure + unoriented wedge join —
    every vertex acts as a wedge center, so a hub of degree h generates
    ~h^2/2 wedges, the blow-up the orientation avoids. Each triangle is
    found once per vertex (3x total). Only run on small graphs."""
    sym = edges.select("u", "v").unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    w1, w2 = sym.alias("w1"), sym.alias("w2")
    closer = edges.alias("e3")  # canonical u<v closing edge
    tri = (
        w1.join(w2, F.col("w2.u") == F.col("w1.u"))
        .filter(F.col("w1.v") < F.col("w2.v"))
        .join(
            closer,
            (F.col("e3.u") == F.col("w1.v")) & (F.col("e3.v") == F.col("w2.v")),
        )
    )
    return _count(tri) // 3


def _count(df) -> int:
    return df.agg(F.count(F.lit(1))).collect()[0][0]


def probe_triangles(spark) -> dict:
    out = {}
    for scale, n_nodes, n_edges in (("1x", 20_000, 120_000), ("4x", 80_000, 480_000)):
        base = _er_edges(spark, n_nodes, n_edges, seed=7).persist()
        base.count()
        t0 = time.time()
        n_plain = _count(oriented_triangles(base))
        t_plain = time.time() - t0

        hub = base.unionAll(_hub_edges(spark, n_nodes, 0.2)).distinct().persist()
        hub.count()
        t0 = time.time()
        n_hub = _count(oriented_triangles(hub))
        t_hub = time.time() - t0
        out[scale] = {
            "nodes": n_nodes,
            "edges": n_edges,
            "triangles_plain": n_plain,
            "oriented_plain_s": round(t_plain, 2),
            "triangles_hub": n_hub,
            "oriented_hub_s": round(t_hub, 2),
            "hub_overhead_ratio": round(t_hub / t_plain, 2),
        }
        if scale == "1x":
            # counterfactual + differential on the small graph only:
            # the naive center-wedge join pays the hub's h^2/2 wedges
            t0 = time.time()
            n_naive = _naive_triangle_count(hub)
            out[scale]["naive_hub_s"] = round(time.time() - t0, 2)
            out[scale]["naive_matches"] = bool(n_naive == n_hub)
        base.unpersist()
        hub.unpersist()
        print(json.dumps({f"tri_{scale}": out[scale]}), file=sys.stderr)
    return out


def probe_knn_salt(spark) -> dict:
    emb = load_table(spark, SF01, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).persist()
    queries.count()
    out = {}
    for scale, replicas in (("1x", 1), ("10x", 10), ("100x", 100)):
        parts = [
            emb.select(
                (F.col("vec_id") + F.lit(i * 1_000_000)).alias("vec_id"),
                "embedding",
                "label",
            )
            for i in range(replicas)
        ]
        corpus = parts[0]
        for p in parts[1:]:
            corpus = corpus.unionByName(p)
        corpus = corpus.filter(F.col("vec_id") % 1_000_000 >= 5).persist()
        corpus.count()
        row = {}
        for n_salt in (1, 8, 32):
            t0 = time.time()
            got = knn_join(corpus, queries, k=3, n_salt=n_salt)
            n = _count(got)
            row[f"salt{n_salt}_s"] = round(time.time() - t0, 2)
            row["rows"] = n
        out[scale] = row
        corpus.unpersist()
        print(json.dumps({f"knn_{scale}": row}), file=sys.stderr)
    return out


def main() -> None:
    spark = get_spark("probe-r12")
    spark.sparkContext.setLogLevel("ERROR")
    report = {}
    if "--skip-tri" not in sys.argv:
        report["triangles_hub_skew"] = probe_triangles(spark)
    if "--skip-knn" not in sys.argv:
        report["knn_salt_width"] = probe_knn_salt(spark)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
