"""Interleaved A/B: per-pair cosine with inline norms (old, A) vs
hoisted precomputed norms (new, B) on the three touched bench surfaces

  - q_dedup_semantic   (semantic_dedup: ivf_assign + in-cell pair join)
  - q_sim_knn_join     (knn_join: corpus x broadcast query batch)
  - q_sql_min_cost_supplier (Spark text's offers semi-join pre-filter)

A-side = the pre-change implementations, loaded from the last
committed similarity.py (git show HEAD, run before committing this
change) / the old SQL text inline, so both variants run in ONE session (the only comparison the regime-noise protocol accepts).
Checks exceptAll equality both ways, then alternates A/B timings with
the noop sink.

Usage: python scripts/probe_r15_cosine_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from smart_energy_consumption_analytics_using_big_data_spark import get_spark
from smart_energy_consumption_analytics_using_big_data_spark.ext import (
    similarity as S_new,
)
from smart_energy_consumption_analytics_using_big_data_spark.plans.extensions import t
from smart_energy_consumption_analytics_using_big_data_spark.plans.sqltext import (
    register_views,
)

OLD_MCS_SQL = """
WITH offers AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem WHERE l_quantity > 0 GROUP BY 1, 2
)
SELECT round(s_acctbal, 6) AS s_acctbal, s_name, n_name, p_partkey, p_name
FROM part
JOIN offers ON p_partkey = offers.l_partkey
JOIN supplier ON s_suppkey = offers.l_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_size < 10 AND p_type = 'SMALL' AND r_name = 'EUROPE'
  AND unit_cost = (
    SELECT min(unit_cost)
    FROM offers o2
    JOIN supplier s2 ON s2.s_suppkey = o2.l_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE o2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 20
"""


def load_old_similarity():
    src = subprocess.run(
        ["git", "-C", os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         "show", "HEAD:smart_energy_consumption_analytics_using_big_data_spark/ext/similarity.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    path = "/tmp/similarity_old_r15.py"
    with open(path, "w") as fh:
        fh.write(src)
    import importlib.util

    spec = importlib.util.spec_from_file_location("similarity_old_r15", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(fn):
    t0 = time.monotonic()
    noop(fn())
    return time.monotonic() - t0


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("probe-r15-cosine-ab")
    spark.sparkContext.setLogLevel("ERROR")
    S_old = load_old_similarity()
    register_views(spark, sf_dir)

    emb = t(spark, sf_dir, "embeddings")

    def sem(mod):
        return lambda: mod.semantic_dedup(emb, threshold=0.4)

    def knn(mod):
        return lambda: mod.knn_join(
            emb.filter(F.col("vec_id") >= 5), emb.filter(F.col("vec_id") < 5), k=3
        )

    from smart_energy_consumption_analytics_using_big_data_spark.plans import QUERIES

    def mcs_old():
        return spark.sql(OLD_MCS_SQL)

    def mcs_new():
        return QUERIES["q_sql_min_cost_supplier"](spark, sf_dir)

    cases = {
        "semantic": (sem(S_old), sem(S_new)),
        "knn_join": (knn(S_old), knn(S_new)),
        "min_cost_supplier": (mcs_old, mcs_new),
    }

    for name, (a, b) in cases.items():
        da, db = a(), b()
        extra = db.exceptAll(da).count()
        missing = da.exceptAll(db).count()
        print(f"[{name}] equality exceptAll: new-old={extra} old-new={missing}", flush=True)
        assert extra == 0 and missing == 0, f"{name} results differ"

    for name, (a, b) in cases.items():
        ta, tb = [], []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} A rep{r}")
            ta.append(timed(a))
            spark.sparkContext.setJobDescription(f"{name} B rep{r}")
            tb.append(timed(b))
        spark.sparkContext.setJobDescription(None)
        print(
            f"[{name}] A(old) median={statistics.median(ta):.3f} {['%.2f' % x for x in ta]}\n"
            f"[{name}] B(new) median={statistics.median(tb):.3f} {['%.2f' % x for x in tb]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
