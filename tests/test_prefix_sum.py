"""with_global_prefix_sum: the two-pass range-partitioned running sum
must be bit-identical to the serial unpartitioned window it replaces
(VERDICT r5 item 4 — the ABC/Pareto scale fix)."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from smart_energy_consumption_analytics_using_big_data_spark.operators.windows import (
    with_global_prefix_sum,
)


def _cmp(df, order, value, n_parts):
    serial = df.withColumn(
        "cum_sum",
        F.sum(value).over(
            Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    two_pass = with_global_prefix_sum(
        df, order=order, value=value, num_partitions=n_parts
    )
    key = [c for c in df.columns]
    a = {tuple(r[c] for c in key): r.cum_sum for r in serial.collect()}
    b = {tuple(r[c] for c in key): r.cum_sum for r in two_pass.collect()}
    assert len(a) == len(b) > 0
    for k in a:
        # compare as exact decimals — no float slack
        assert a[k] == b[k], (k, a[k], b[k])


def test_matches_serial_window_many_slices(spark):
    df = spark.range(1000).select(
        F.col("id"),
        ((F.col("id") * 37 + 11) % 500).cast("decimal(18,6)").alias("v"),
    )
    _cmp(df, [F.desc("v"), F.asc("id")], F.col("v"), n_parts=13)


def test_matches_with_more_slices_than_rows(spark):
    df = spark.range(5).select(
        F.col("id"), (F.col("id") + 1).cast("decimal(18,6)").alias("v")
    )
    _cmp(df, [F.asc("v"), F.asc("id")], F.col("v"), n_parts=32)


def test_no_single_partition_exchange_in_plan(spark):
    # the point of the operator: the data-sized window must NOT run on
    # one task. The only single-partition window allowed is over the
    # per-slice totals (row count == slice count, a cluster constant).
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 97).cast("decimal(18,6)").alias("v")
    )
    out = with_global_prefix_sum(
        df, order=[F.asc("v"), F.asc("id")], value=F.col("v"), num_partitions=8
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # pass 1 window is partitioned by the slice id
    assert "__slice" in plan
    # range partitioning drives the slicing
    assert "rangepartitioning" in plan.lower()
