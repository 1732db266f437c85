"""Same-session interleaved A/B: prefix_filtered_pairs' candidate
self-join vs a fused group-and-enumerate candidate stage (the r15
winnow_pairs pattern carried to PPJoin).

A (shipped): prefix table (tokenize + df window + rank/size windows)
    consumed on BOTH inputs of the shingle equi-join, then size-ratio
    filter -> pair groupBy (cp) -> suffix bound -> verification join.

B (candidate): prefix -> groupBy(shingle).agg(sorted (doc, n) structs)
    -> two-step posexplode/slice upper-triangle enumeration carrying
    n_a/n_b -> identical filters/groupBy/suffix bound -> identical
    verification tail. One consumption of the 3-window prefix subtree,
    no candidate join. Exact: shingle_table emits distinct
    (doc, shingle), so each doc appears once per shingle group and the
    sorted strict upper triangle IS the doc_a < doc_b join output with
    the same multiset of (pair, shingle) contributions feeding cp.

Usage: python scripts/probe_r15_ppjoin_pairs_ab.py [sf_dir] [reps]
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


def fused_prefix_pairs(
    shingles: DataFrame, t_num: int = 3, t_den: int = 5
) -> DataFrame:
    """prefix_filtered_pairs with the candidate join replaced by
    group-and-enumerate; everything else verbatim."""
    w_doc = Window.partitionBy("doc_id").orderBy("df", "shingle")
    with_df = (
        shingles
        if "df" in shingles.columns
        else shingles.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        )
    )
    ranked = with_df.withColumn("rk", F.row_number().over(w_doc)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    )
    alpha = (F.lit(t_num) * F.col("n") + F.lit(t_den - 1)).cast("long") / F.lit(t_den)
    prefix = ranked.filter(
        F.col("rk") <= F.col("n") - F.floor(alpha) + F.lit(1)
    ).select("doc_id", "shingle", "n")

    def _alpha(n: F.Column) -> F.Column:
        return F.floor(
            (F.lit(t_num) * n + F.lit(t_den - 1)).cast("long") / F.lit(t_den)
        )

    groups = prefix.groupBy("shingle").agg(
        F.array_sort(F.collect_list(F.struct("doc_id", "n"))).alias("__ds")
    )
    cands = (
        groups.select(F.posexplode("__ds").alias("__i", "__a"), "__ds")
        .select(
            "__a",
            F.explode(
                F.expr("slice(__ds, __i + 2, size(__ds) - __i - 1)")
            ).alias("__b"),
        )
        .select(
            F.col("__a.doc_id").alias("doc_a"),
            F.col("__a.n").alias("n_a"),
            F.col("__b.doc_id").alias("doc_b"),
            F.col("__b.n").alias("n_b"),
        )
        .filter(
            F.least("n_a", "n_b") * F.lit(t_den)
            >= F.lit(t_num) * F.greatest("n_a", "n_b")
        )
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("cp"))
        .filter(
            (
                F.col("cp")
                + F.greatest(_alpha(F.col("n_a")), _alpha(F.col("n_b")))
                - F.lit(1)
            )
            * F.lit(t_num + t_den)
            >= F.lit(t_num) * (F.col("n_a") + F.col("n_b"))
        )
        .select("doc_a", "doc_b", "n_a", "n_b")
    )
    sets = shingles.groupBy("doc_id").agg(F.collect_list("shingle").alias("shs"))
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b"))
    common = (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("common", F.size(F.array_intersect("shs_a", "shs_b")))
    )
    return (
        common.filter(
            F.col("common") * F.lit(t_den)
            >= F.lit(t_num) * (F.col("n_a") + F.col("n_b") - F.col("common"))
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 6
            ).alias("jaccard"),
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("probe-r15-ppjoin-pairs-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = t(spark, sf_dir, "documents")
    sh = D.shingle_table(docs, n=3, max_df=100, keep_df=True)
    da = D.prefix_filtered_pairs(sh, t_num=3, t_den=5)
    db = fused_prefix_pairs(sh, t_num=3, t_den=5)
    assert da.exceptAll(db).count() == 0 and db.exceptAll(da).count() == 0

    def noop(df: DataFrame) -> None:
        df.write.format("noop").mode("overwrite").save()

    ta: list[float] = []
    tb: list[float] = []
    for r in range(reps):
        spark.sparkContext.setJobDescription(f"ppjoin A join rep{r}")
        t0 = time.monotonic(); noop(da); ta.append(time.monotonic() - t0)
        spark.sparkContext.setJobDescription(f"ppjoin B fused rep{r}")
        t0 = time.monotonic(); noop(db); tb.append(time.monotonic() - t0)
    print(
        f"A(join)  median={statistics.median(ta):.3f} {['%.2f' % x for x in ta]}\n"
        f"B(fused) median={statistics.median(tb):.3f} {['%.2f' % x for x in tb]}"
    )


if __name__ == "__main__":
    main()
