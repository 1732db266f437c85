"""Scale-strategy verification: bucketed co-located joins skip the
shuffle, salted joins preserve results under skew, range partitioning
for sorted sinks."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from smart_energy_consumption_analytics_using_big_data_spark.operators import joins as J


def _formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": ["hot"] * 50 + ["a", "b"], "v": range(52)})
    )
    right = spark.createDataFrame(pd.DataFrame({"k": ["hot", "a", "c"], "w": [1, 2, 3]}))
    plain = left.join(right, "k").groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw"))
    salted = J.salted_join(left, right, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    # Bucketing both sides on the join key co-locates matching rows:
    # the sort-merge join needs NO Exchange - the 100 TB pattern for a
    # key reused across many joins (pre-shuffle once at write time).
    # default warehouse dir (spark-warehouse/, gitignored); static conf
    # cannot change per-test
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = spark.createDataFrame(
        pd.DataFrame({"okey": range(200), "total": [float(i) for i in range(200)]})
    )
    items = spark.createDataFrame(
        pd.DataFrame({"okey": [i % 200 for i in range(1000)], "qty": [1.0] * 1000})
    )
    orders.write.bucketBy(8, "okey").sortBy("okey").mode("overwrite").saveAsTable("b_orders")
    items.write.bucketBy(8, "okey").sortBy("okey").mode("overwrite").saveAsTable("b_lineitem")
    # disable auto-broadcast so the fixture-sized tables exercise the
    # bucket-aware sort-merge path a fact x fact join would take
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "okey")
        plan = _formatted_plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # co-located: no shuffle either side
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_repartition_by_range_orders_files(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": [5, 1, 9, 3, 7] * 20, "v": range(100)})
    ).repartitionByRange(4, "k")
    # range partitioning: each partition holds a contiguous key range
    parts = df.select("k", F.spark_partition_id().alias("p")).collect()
    by_part = {}
    for r in parts:
        by_part.setdefault(r["p"], []).append(r["k"])
    ranges = sorted((min(v), max(v)) for v in by_part.values())
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2


def test_salted_join_rejects_outer_how(spark):
    import pytest

    df = spark.createDataFrame(pd.DataFrame({"k": ["a"], "v": [1]}))
    for how in ("right", "full", "cross"):
        with pytest.raises(ValueError, match="salted_join"):
            J.salted_join(df, df, "k", how=how)


def test_salted_join_left_keeps_unmatched_left_rows(spark):
    left = spark.createDataFrame(pd.DataFrame({"k": ["a", "b", "zz"], "v": [1, 2, 3]}))
    right = spark.createDataFrame(pd.DataFrame({"k": ["a", "b"], "w": [10, 20]}))
    got = sorted(
        (r["k"], r["v"], r["w"]) for r in J.salted_join(left, right, "k", "left").collect()
    )
    assert got == [("a", 1, 10), ("b", 2, 20), ("zz", 3, None)]


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join is the RUNTIME complement to salted_join: with the
    skew thresholds scoped down, a sort-merge join whose build of one
    hot key dwarfs the others must be re-planned with the skewed
    partition split (SortMergeJoin(skew=true) + AQEShuffleRead skewed
    in the final plan) — and the answer must equal the non-adaptive
    join."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # 2000 'hot' rows (~60 KB serialized) vs ~2-row tail keys: the
        # hot shuffle partition exceeds the scoped 8 KB threshold.
        left = spark.range(0, 2200).select(
            F.when(F.col("id") < 2000, F.lit("hot")).otherwise(
                F.concat(F.lit("k"), (F.col("id") % 97).cast("string"))
            ).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 100).select(
            F.when(F.col("id") < 50, F.lit("hot")).otherwise(
                F.concat(F.lit("k"), (F.col("id") % 97).cast("string"))
            ).alias("k"),
            F.col("id").alias("w"),
        )
        joined = left.join(right, "k")
        rows = joined.collect()  # drives THIS DataFrame's QueryExecution
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final or "skewed" in final, final[:2000]
        # answer parity with the aggregate-based exact computation
        n = len(rows)
        s = sum(r["v"] + r["w"] for r in rows)
        plain = (
            left.groupBy("k").agg(F.count(F.lit(1)).alias("ln"), F.sum("v").alias("lv"))
            .join(
                right.groupBy("k").agg(F.count(F.lit(1)).alias("rn"), F.sum("w").alias("rv")),
                "k",
            )
            .agg(
                F.sum(F.col("ln") * F.col("rn")).alias("n"),
                F.sum(F.col("lv") * F.col("rn") + F.col("rv") * F.col("ln")).alias("s"),
            )
            .collect()[0]
        )
        assert (n, s) == (plain["n"], plain["s"])
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
