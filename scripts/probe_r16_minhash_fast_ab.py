"""Negative result (r16, VERDICT r15 task 4): an xxhash64 MinHash
signature twin for q_dedup_minhash_lsh does NOT pay.

The task assumed the query is md5-bound ("a 64-bit native hash would
roughly halve signature cost"). Measured at sf0.1, same session,
interleaved, noop-forced (5 reps):

    signature stage (shingle_table -> minhash_signatures, noop):
        md5      median 1.521 s   [1.692, 1.372, 1.521, 1.489, 1.649]
        xxhash64 median 1.451 s   [1.545, 1.303, 1.441, 1.779, 1.451]
        -> the hash family is worth ~5% of the stage: the cost is the
           shingle explode + df-prune + signature groupBy, not the
           digest (contrast winnowing, where ONE md5 per character
           k-gram made xxhash64 ~3x — here it is 6 hashes per shingle
           ROW, two orders of magnitude fewer digests per byte).

    full query (count-forced, interleaved, regime rising across reps):
        q_dedup_minhash_lsh (md5)  median 1.864 s
        xxhash64 twin              median 2.149 s (0/5 faster)

    candidate counts (different hash family -> different band
    collisions, expected): sf0.001 31 vs 29, sf0.01 28 vs 28,
    sf0.1 746 vs 496.

Verdict: the twin was registered, measured, and REVERTED — a
diagnostic that is not faster would just burn bench time and mislabel
the md5 query as "slow path". The md5 family stays (portable-oracle
contract); this probe is the record if a future round revisits.

Usage: python scripts/probe_r16_minhash_fast_ab.py [sf_dir] [reps]
(requires re-adding hash_fn="xxhash64" support to minhash_signatures —
kept in this script as a self-contained expression instead)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from smart_energy_consumption_analytics_using_big_data_spark import get_spark
from smart_energy_consumption_analytics_using_big_data_spark.ext import dedup as D
from smart_energy_consumption_analytics_using_big_data_spark.plans._registry import t


def minhash_signatures_xxh(shingles, num_hashes: int = 6):
    """xxhash64 signature variant; zero-padded hex keeps band_table's
    concat keys fixed-width (variable-width numeric strings would
    alias across the band boundary)."""
    aggs = [
        F.min(
            F.lpad(F.hex(F.xxhash64(F.concat(F.lit(f"{i}|"), F.col("shingle")))), 16, "0")
        ).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return shingles.groupBy("doc_id").agg(*aggs)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("probe-r16-minhash-fast")
    spark.sparkContext.setLogLevel("ERROR")
    docs = t(spark, sf_dir, "documents")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def sig_md5():
        sh = D.shingle_table(docs, n=3, max_df=100)
        return D.minhash_signatures(sh, num_hashes=6)

    def sig_xxh():
        sh = D.shingle_table(docs, n=3, max_df=100)
        return minhash_signatures_xxh(sh, num_hashes=6)

    def full_md5():
        return D.lsh_candidate_pairs(sig_md5(), num_hashes=6, band_size=2)

    def full_xxh():
        return D.lsh_candidate_pairs(sig_xxh(), num_hashes=6, band_size=2)

    variants = {
        "sig_md5": sig_md5,
        "sig_xxh": sig_xxh,
        "full_md5": full_md5,
        "full_xxh": full_xxh,
    }
    for fn in variants.values():  # warm
        noop(fn())
    samples = {n: [] for n in variants}
    order = list(variants.items())
    for _rep in range(reps):
        order = order[1:] + order[:1]  # rotate: no position bias
        for name, fn in order:
            t0 = time.time()
            noop(fn())
            samples[name].append(round(time.time() - t0, 3))
    med = {n: sorted(v)[len(v) // 2] for n, v in samples.items()}
    counts = {"md5": full_md5().count(), "xxh": full_xxh().count()}
    print(json.dumps({"samples": samples, "median": med, "counts": counts}))
    spark.stop()


if __name__ == "__main__":
    main()
