"""Same-session interleaved A/B: winnow_pairs' fp self-join vs a fused
group-and-enumerate rewrite (the basket_pairs pattern applied to the
fingerprint index).

A (shipped): fps -> Window.partitionBy(fp) df-prune -> a JOIN b ON fp
    with doc_a < doc_b -> pair count. The fingerprint subtree (for the
    arrow path: the corpus-sized mapInPandas kernel + distinct) is a
    join INPUT on both sides, so Spark executes it twice; the df-prune
    pays its own sort+exchange before the join exchanges.

B (candidate): fps -> groupBy(fp).agg(array_sort(collect_set(doc)))
    -> filter size <= max_df -> explode upper-triangle pairs in-row
    -> pair count. One consumption of the fingerprint subtree, the
    df-prune fused into the one aggregation, no join at all — same
    shape that replaced the co-purchase self-join (ext/graph.py
    basket_pairs, 1.96 -> 1.45 s).

Equivalence: both fingerprint producers emit DISTINCT (doc, fp) rows,
so rows-per-fp == distinct-docs-per-fp == size(collect_set); sorted
upper triangle == (doc_a < doc_b) join output; null fps are dropped
explicitly to mirror the inner equi-join. exceptAll both ways is
asserted per path before timing.

Usage: python scripts/probe_r15_winnow_pairs_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window, functions as F

from smart_energy_consumption_analytics_using_big_data_spark import get_spark
from smart_energy_consumption_analytics_using_big_data_spark.ext import dedup as D
from smart_energy_consumption_analytics_using_big_data_spark.plans._registry import t


def pairs_join(fps: DataFrame, max_df: int, min_shared: int, id_col: str) -> DataFrame:
    """Verbatim pre-rewrite winnow_pairs tail (window prune + self-join)."""
    w_df = Window.partitionBy("fp")
    pruned = (
        fps.withColumn("__df", F.count(F.lit(1)).over(w_df))
        .filter(F.col("__df") <= max_df)
        .drop("__df")
    )
    a = pruned.select(F.col(id_col).alias("doc_a"), "fp")
    b = pruned.select(F.col(id_col).alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def pairs_fused(fps: DataFrame, max_df: int, min_shared: int, id_col: str) -> DataFrame:
    """Candidate: one aggregation, in-row upper-triangle enumeration."""
    tri = (
        "flatten(transform(__docs, (x, i) -> "
        "transform(slice(__docs, i + 2, size(__docs) - i - 1), "
        "y -> struct(x AS doc_a, y AS doc_b))))"
    )
    return (
        fps.filter(F.col("fp").isNotNull())
        .groupBy("fp")
        .agg(F.array_sort(F.collect_set(id_col)).alias("__docs"))
        .filter(F.size("__docs") <= max_df)
        .select(F.explode(F.expr(tri)).alias("__p"))
        .select("__p.doc_a", "__p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("probe-r15-winnow-pairs-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = t(spark, sf_dir, "documents")

    def noop(df: DataFrame) -> None:
        df.write.format("noop").mode("overwrite").save()

    for hash_fn in ("arrow", "md5", "xxhash64"):
        if hash_fn == "arrow":
            fps = D.winnow_fingerprints_arrow(docs)
        else:
            fps = D.winnow_fingerprints(docs, hash_fn=hash_fn)
        da = pairs_join(fps, 16, 2, "doc_id")
        db = pairs_fused(fps, 16, 2, "doc_id")
        assert da.exceptAll(db).count() == 0 and db.exceptAll(da).count() == 0
        ta: list[float] = []
        tb: list[float] = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"winnow[{hash_fn}] A join rep{r}")
            t0 = time.monotonic(); noop(da); ta.append(time.monotonic() - t0)
            spark.sparkContext.setJobDescription(f"winnow[{hash_fn}] B fused rep{r}")
            t0 = time.monotonic(); noop(db); tb.append(time.monotonic() - t0)
        print(
            f"{hash_fn:9s} A(join)  median={statistics.median(ta):.3f} "
            f"{['%.2f' % x for x in ta]}\n"
            f"{hash_fn:9s} B(fused) median={statistics.median(tb):.3f} "
            f"{['%.2f' % x for x in tb]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
