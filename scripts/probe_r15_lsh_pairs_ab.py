"""Same-session interleaved A/B: lsh_candidate_pairs' bucket self-join
vs a fused group-and-enumerate rewrite (the winnow_pairs r15 pattern
applied to LSH banding).

A (shipped): bands -> [optional bucket-size window prune] ->
    a JOIN b ON (band, band_key) AND doc_a < doc_b -> distinct. The
    band table (and everything upstream: shingle explode + signature
    min-agg for the md5 path) is consumed on BOTH join inputs.

B (candidate): bands -> groupBy(band, band_key).agg(sorted doc set)
    -> [optional size prune, fused into the same agg] -> two-step
    posexplode/slice upper-triangle enumeration -> distinct. One
    consumption, no join; per-row memory stays O(bucket) because the
    second explode slices the carried array instead of flattening
    C(B,2) structs into one value.

Equivalence per surface is asserted (exceptAll both ways) before any
timing. Surfaces: the md5 signature path exactly as
q_dedup_minhash_lsh builds it, the same with max_bucket=8 (prune
branch), and the Arrow signature path as minhash_lsh_arrow consumes it
(localCheckpointed signatures).

Usage: python scripts/probe_r15_lsh_pairs_ab.py [sf_dir] [reps]
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


def pairs_join(bands: DataFrame, max_bucket: int | None) -> DataFrame:
    """Verbatim pre-rewrite lsh_candidate_pairs tail."""
    if max_bucket is not None:
        w = Window.partitionBy("band", "band_key")
        bands = (
            bands.withColumn("__bsize", F.count(F.lit(1)).over(w))
            .filter(F.col("__bsize") <= max_bucket)
            .drop("__bsize")
        )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def pairs_fused(bands: DataFrame, max_bucket: int | None) -> DataFrame:
    """Candidate: one aggregation, two-step in-row enumeration."""
    groups = (
        bands.filter(F.col("band_key").isNotNull())
        .groupBy("band", "band_key")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("__docs"))
    )
    if max_bucket is not None:
        groups = groups.filter(F.size("__docs") <= max_bucket)
    return (
        groups.select(F.posexplode("__docs").alias("__i", "doc_a"), "__docs")
        .select(
            "doc_a",
            F.explode(
                F.expr("slice(__docs, __i + 2, size(__docs) - __i - 1)")
            ).alias("doc_b"),
        )
        .distinct()
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("probe-r15-lsh-pairs-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = t(spark, sf_dir, "documents")

    def noop(df: DataFrame) -> None:
        df.write.format("noop").mode("overwrite").save()

    sh = D.shingle_table(docs, n=3, max_df=100)
    sig_md5 = D.minhash_signatures(sh, num_hashes=6)
    sig_arrow = D.minhash_signatures_arrow(docs, 6, 3).localCheckpoint(eager=False)
    surfaces = [
        ("md5", sig_md5, None),
        ("md5cap8", sig_md5, 8),
        ("arrow", sig_arrow, None),
    ]
    for name, sig, cap in surfaces:
        bands = D.band_table(sig, 6, 2)
        da, db = pairs_join(bands, cap), pairs_fused(bands, cap)
        assert da.exceptAll(db).count() == 0 and db.exceptAll(da).count() == 0
        ta: list[float] = []
        tb: list[float] = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"lsh[{name}] A join rep{r}")
            t0 = time.monotonic(); noop(da); ta.append(time.monotonic() - t0)
            spark.sparkContext.setJobDescription(f"lsh[{name}] B fused rep{r}")
            t0 = time.monotonic(); noop(db); tb.append(time.monotonic() - t0)
        print(
            f"{name:8s} A(join)  median={statistics.median(ta):.3f} "
            f"{['%.2f' % x for x in ta]}\n"
            f"{name:8s} B(fused) median={statistics.median(tb):.3f} "
            f"{['%.2f' % x for x in tb]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
