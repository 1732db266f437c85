"""Scale-crossover probe for the q_sql_min_cost_supplier semi-join
pre-filter (OPTIMIZATION_r15.md negative result 4).

At sf0.1 the offers-CTE pre-filter (l_partkey IN qualifying parts)
measured 5/5 SLOWER despite cutting 97% of fact rows ahead of both
aggregation shuffles — fixed broadcast/scan overhead dominated. This
probe re-runs the same interleaved A/B on the 10x derived dataset
(scale_probe.py's lineitem x10 with shifted l_partkey; part replicated
here with the SAME shift so the filter's 2.7% key selectivity is
preserved) to locate the crossover.

Usage: python scripts/probe_r15_mcs_scale.py [derived_dir] [reps]
(run scripts/scale_probe.py first to materialize the derived dir)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from smart_energy_consumption_analytics_using_big_data_spark import get_spark
from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import (
    load_table,
)

SF01 = "/root/testdata/sf0.1"
REPLICAS = 10
SHIFT = 10_000_000  # scale_probe.build_derived's l_partkey shift

BODY = """
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

SQL_A = (
    """
WITH offers AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem WHERE l_quantity > 0 GROUP BY 1, 2
)
"""
    + BODY
)

SQL_B = (
    """
WITH offers AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem WHERE l_quantity > 0
    AND l_partkey IN (
      SELECT p_partkey FROM part WHERE p_size < 10 AND p_type = 'SMALL')
  GROUP BY 1, 2
)
"""
    + BODY
)


def main() -> None:
    derived = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_probe"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("probe-r15-mcs-scale")
    spark.sparkContext.setLogLevel("ERROR")

    spark.read.parquet(f"{derived}/lineitem.parquet").createOrReplaceTempView(
        "lineitem"
    )
    part = load_table(spark, SF01, "part")
    parts = [
        part.withColumn("p_partkey", F.col("p_partkey") + F.lit(i * SHIFT))
        for i in range(REPLICAS)
    ]
    big_p = parts[0]
    for p in parts[1:]:
        big_p = big_p.unionByName(p)
    big_p.createOrReplaceTempView("part")
    for name in ("supplier", "nation", "region"):
        load_table(spark, SF01, name).createOrReplaceTempView(name)

    da, db = spark.sql(SQL_A), spark.sql(SQL_B)
    assert da.exceptAll(db).count() == 0 and db.exceptAll(da).count() == 0

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    ta, tb = [], []
    for r in range(reps):
        spark.sparkContext.setJobDescription(f"mcs10x A rep{r}")
        t0 = time.monotonic(); noop(spark.sql(SQL_A)); ta.append(time.monotonic() - t0)
        spark.sparkContext.setJobDescription(f"mcs10x B rep{r}")
        t0 = time.monotonic(); noop(spark.sql(SQL_B)); tb.append(time.monotonic() - t0)
    print(
        f"A(no prefilter)  median={statistics.median(ta):.3f} {['%.2f' % x for x in ta]}\n"
        f"B(semi prefilter) median={statistics.median(tb):.3f} {['%.2f' % x for x in tb]}"
    )


if __name__ == "__main__":
    main()
