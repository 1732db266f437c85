"""Second-decade scale probe for the two documented worst scalers
(VERDICT r14 stretch): q_dedup_minhash_arrow (6.17x @ 10x) and
q_graph_triangles (5.09x @ 10x). Three-point curve — sf0.1, x10, x100
— so each query gets a PER-DECADE growth factor; sub-quadratic means
the second decade's factor stays well under 100 (quadratic) and
ideally near the first decade's.

Fixture notes (what makes the second decade artifact-free):

* documents x100: pure suffix-perturbed replication (scale_probe.py's
  10x construction) would make all 100 replicas of a doc near-dups of
  each other, so LSH pair OUTPUT would grow ~quadratically in the
  replica count and the probe would measure output blowup, not engine
  scaling. Here replica i additionally rewrites the text through a
  translate() alphabet rotation keyed by i % 10 — replicas in
  DIFFERENT residue classes share no shingles, replicas in the same
  class stay near-dups — so the near-dup cluster size is pinned at 10
  for both the x10 point (one class) and the x100 point (10 classes):
  output grows linearly with the corpus and the curve isolates the
  minhash + band-join engine cost.
* lineitem x100: disjoint shifted replicas (the scale_probe.py
  construction, two decades) — no cross-replica wedges by
  construction, so the measured growth is the real shuffle/sort/
  aggregation scaling of the degree-oriented wedge join.

Execution forced with sum(xxhash64(*)) like scale_probe.py. Single
rep per point (the x100 points run minutes); ambient-regime caveats
from PERFORMANCE.md apply — the per-decade FACTOR is the statistic,
not the absolute seconds.

Usage: python scripts/probe_r15_decade.py [out_root]
"""

from __future__ import annotations

import json
import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from smart_energy_consumption_analytics_using_big_data_spark import get_spark
from smart_energy_consumption_analytics_using_big_data_spark.plans import QUERIES
from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import load_table

SF01 = "/root/testdata/sf0.1"
LOWER = string.ascii_lowercase


def build(spark, out_dir: str, replicas: int) -> None:
    docs = load_table(spark, SF01, "documents")
    d_parts = []
    for i in range(replicas):
        # class = i // 10 (NOT i % 10 — caught in r15 code review: the
        # modulus keyed every x10 replica into a DIFFERENT class, i.e.
        # zero near-dup pairs at x10 vs 45-per-doc-per-class at x100,
        # putting the quadratic output term back into the decade-2
        # factor). With i // 10 the x10 point is one class of 10
        # near-dup replicas and x100 is ten such classes: cluster size
        # pinned at 10 at both points.
        k = i // 10
        rot = LOWER[k:] + LOWER[:k]
        d_parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
                F.concat(
                    F.translate(F.col("text"), LOWER, rot),
                    F.lit(f" replica{i}"),
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    big_d = d_parts[0]
    for p in d_parts[1:]:
        big_d = big_d.unionByName(p)
    big_d.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    li = load_table(spark, SF01, "lineitem")
    l_parts = [
        li.select(
            (F.col("l_orderkey") + F.lit(i * 100_000_000)).alias("l_orderkey"),
            (F.col("l_partkey") + F.lit(i * 10_000_000)).alias("l_partkey"),
            "l_suppkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        )
        for i in range(replicas)
    ]
    big_l = l_parts[0]
    for p in l_parts[1:]:
        big_l = big_l.unionByName(p)
    big_l.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")


def main() -> None:
    out_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_decade"
    names = ["q_dedup_minhash_arrow", "q_graph_triangles"]
    spark = get_spark("decade-probe")
    spark.sparkContext.setLogLevel("ERROR")
    points = {"x10": 10, "x100": 100}
    for label, n in points.items():
        build(spark, f"{out_root}/{label}", n)

    def force(df) -> None:
        h = F.pmod(F.xxhash64(*df.columns), F.lit(1_000_003))
        df.agg(F.sum(h)).collect()

    report = {}
    for name in names:
        force(QUERIES[name](spark, "/root/testdata/sf0.001"))  # warm
        times = {}
        for label, sf_dir in (
            ("base", SF01),
            ("x10", f"{out_root}/x10"),
            ("x100", f"{out_root}/x100"),
        ):
            t0 = time.time()
            force(QUERIES[name](spark, sf_dir))
            times[label] = round(time.time() - t0, 2)
            spark.catalog.clearCache()
        report[name] = {
            **times,
            "decade1_factor": round(times["x10"] / times["base"], 2),
            "decade2_factor": round(times["x100"] / times["x10"], 2),
        }
        print(json.dumps({name: report[name]}), file=sys.stderr)
    print(json.dumps({"queries": report}))
    spark.stop()


if __name__ == "__main__":
    main()
