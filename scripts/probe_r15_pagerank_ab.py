"""Same-session A/B probe for the pagerank per-iteration join shape
(r15 optimization).

A = shipped pagerank: contrib = (ed JOIN ranks) JOIN deg — TWO
    |E|-sized join stages per iteration, with deg (an aggregation over
    the cached edge list) re-derived inside every iteration's plan.
B = deg-into-ranks rewrite: deg is persisted once and joined to the
    |V|-sized ranks table first, so each iteration pays ONE |E|-sized
    join; contribution values are bit-identical (same round(rank/deg,
    12) on the same inputs).

Runs on the q_text_textrank co-occurrence graph (the heaviest pagerank
consumer in the bench). Equality checked exactly (exceptAll both ways
on the rounded output), then interleaved timed reps.

Usage: python scripts/probe_r15_pagerank_ab.py [sf_dir] [reps]
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
    _finish_ranks,
    pagerank,
)
from smart_energy_consumption_analytics_using_big_data_spark.functions import textfns as TX
from smart_energy_consumption_analytics_using_big_data_spark.plans._registry import t


def pagerank_degranks(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Candidate rewrite (see module docstring)."""
    ed = (
        edges.select(F.col(src).alias("id"), F.col(dst).alias("__dst"))
        .repartition("id")
        .persist()
    )
    ed.count()
    edges = ed
    nodes = (
        ed.select("id")
        .union(ed.select(F.col("__dst").alias("id")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return _finish_ranks(nodes.select("id", F.lit(0.0).alias("rank")), ed, nodes)
    deg = ed.groupBy("id").agg(F.count(F.lit(1)).alias("deg")).persist()
    base = 1.0 - damping
    ranks = nodes.select("id", F.round(F.lit(1.0) / n, 12).alias("rank"))
    for _ in range(iters):
        rd = ranks.join(deg, "id")
        contrib = ed.join(rd, "id").select(
            F.col("__dst").alias("id"),
            F.round(F.col("rank") / F.col("deg"), 12)
            .cast("decimal(28,12)")
            .alias("c"),
        )
        summed = contrib.groupBy("id").agg(F.sum("c").alias("s"))
        ranks = nodes.join(summed, "id", "left").select(
            "id",
            F.round(
                F.lit(base) / n
                + F.lit(damping) * F.coalesce(F.col("s").cast("double"), F.lit(0.0)),
                12,
            ).alias("rank"),
        )
    out = _finish_ranks(ranks, edges, nodes)
    deg.unpersist()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("probe-r15-pagerank-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def build_edges():
        docs = t(spark, sf_dir, "documents")
        toks = TX.tokens_ws(F.col("text"))
        m = F.greatest(F.size(toks) - 1, F.lit(0))
        bigrams = F.zip_with(
            F.slice(toks, F.lit(1), m),
            F.slice(toks, F.lit(2), m),
            lambda x, y: F.struct(
                F.least(x, y).alias("a"), F.greatest(x, y).alias("b")
            ),
        )
        pairs = (
            docs.select(F.explode(bigrams).alias("p"))
            .where(F.col("p.a") != F.col("p.b"))
            .select("p.a", "p.b")
            .distinct()
        )
        return pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                    F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
                )
            ).alias("e")
        ).select("e.src", "e.dst")

    ra = pagerank(build_edges(), iters=3)
    rb = pagerank_degranks(build_edges(), iters=3)
    extra = ra.exceptAll(rb).count()
    missing = rb.exceptAll(ra).count()
    ra.unpersist()
    rb.unpersist()
    spark.catalog.clearCache()
    print(f"equality: A\\B={extra} B\\A={missing}", flush=True)
    assert extra == 0 and missing == 0, "rewrite changes results — abort"

    variants = {"A_shipped": pagerank, "B_degranks": pagerank_degranks}
    for fn in variants.values():
        fn(build_edges(), iters=3).unpersist()
        spark.catalog.clearCache()
    samples: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(reps):
        for name, fn in variants.items():
            t0 = time.time()
            out = fn(build_edges(), iters=3)
            out.count()
            samples[name].append(round(time.time() - t0, 3))
            out.unpersist()
            spark.catalog.clearCache()
    med = {n: sorted(v)[len(v) // 2] for n, v in samples.items()}
    print(json.dumps({"samples": samples, "median": med}))
    spark.stop()


if __name__ == "__main__":
    main()
