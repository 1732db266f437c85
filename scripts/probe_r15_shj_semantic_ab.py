"""Rotated interleaved A/B: preferSortMergeJoin=true (A) vs false (B)
on q_dedup_semantic only.

The first shj probe (probe_r15_shj_ab.py) ran variants in a fixed
A,B,C order per rep and its no-op variant C (plan identical to A)
still read ~15% faster than A — a pure position artifact. This probe
alternates the starting variant per rep (A,B / B,A / A,B / ...) so
each variant occupies each slot equally; median over each variant's
slot-balanced samples cancels the bias.

Usage: python scripts/probe_r15_shj_semantic_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_energy_consumption_analytics_using_big_data_spark import get_spark
from smart_energy_consumption_analytics_using_big_data_spark.plans import QUERIES

NAME = "q_dedup_semantic"


def run(spark, sf_dir, prefer_smj: bool) -> float:
    spark.conf.set("spark.sql.join.preferSortMergeJoin", str(prefer_smj).lower())
    t0 = time.monotonic()
    QUERIES[NAME](spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    spark.catalog.clearCache()
    return dt


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("probe-r15-shj-sem-ab")
    spark.sparkContext.setLogLevel("ERROR")

    # warm both plan shapes once (unmeasured)
    run(spark, sf_dir, True)
    run(spark, sf_dir, False)

    ta, tb = [], []
    for r in range(reps):
        order = [(True, ta), (False, tb)] if r % 2 == 0 else [(False, tb), (True, ta)]
        for prefer_smj, sink in order:
            label = "A_smj" if prefer_smj else "B_shj"
            spark.sparkContext.setJobDescription(f"{NAME} {label} rep{r}")
            sink.append(run(spark, sf_dir, prefer_smj))
    spark.sparkContext.setJobDescription(None)
    print(f"A_smj median={statistics.median(ta):.3f} {['%.2f' % x for x in ta]}")
    print(f"B_shj median={statistics.median(tb):.3f} {['%.2f' % x for x in tb]}")
    wins = sum(1 for a, b in zip(ta, tb) if b < a)
    print(f"pairwise B wins: {wins}/{len(ta)}")


if __name__ == "__main__":
    main()
