"""Globally-ordered two-pass operators (prefix sum / row_number / rank
/ ntile) must be bit-identical to the serial unpartitioned windows they
replace (VERDICT r5 item 4 — the ABC/Pareto scale fix — and the
data-sized ranking sites migrated in round 6).

The extra-column cases are the load-bearing regressions: an earlier
version sliced with ``repartitionByRange`` + ``spark_partition_id()``,
whose boundaries RE-SAMPLE nondeterministically per execution — the
local-rank branch and the offsets branch disagreed on slice membership
whenever ReuseExchange did not dedupe them (it stops deduping exactly
when a branch prunes columns differently), silently corrupting the
global numbering. Literal quantile boundaries fixed it; these tests
pin that behavior with payload columns that defeat exchange reuse.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from smart_energy_consumption_analytics_using_big_data_spark.operators.windows import (
    with_global_ntile,
    with_global_prefix_sum,
    with_global_rank,
    with_global_row_number,
)


def _cmp_cum(df, order, value, bucket_by, ascending, n_parts):
    serial = df.withColumn(
        "cum_sum",
        F.sum(value).over(
            Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    two_pass = with_global_prefix_sum(
        df,
        order=order,
        value=value,
        bucket_by=bucket_by,
        ascending=ascending,
        num_partitions=n_parts,
    )
    key = [c for c in df.columns]
    a = {tuple(r[c] for c in key): r.cum_sum for r in serial.collect()}
    b = {tuple(r[c] for c in key): r.cum_sum for r in two_pass.collect()}
    assert len(a) == len(b) > 0
    for k in a:
        # compare as exact decimals — no float slack
        assert a[k] == b[k], (k, a[k], b[k])


def test_prefix_sum_matches_serial_window_many_slices(spark):
    df = spark.range(1000).select(
        F.col("id"),
        ((F.col("id") * 37 + 11) % 500).cast("decimal(18,6)").alias("v"),
        # payload column that defeats ReuseExchange between branches
        (F.col("id") % 3).alias("payload"),
    )
    _cmp_cum(
        df, [F.desc("v"), F.asc("id")], F.col("v"), "v", False, n_parts=13
    )


def test_prefix_sum_more_slices_than_rows(spark):
    df = spark.range(5).select(
        F.col("id"), (F.col("id") + 1).cast("decimal(18,6)").alias("v")
    )
    _cmp_cum(df, [F.asc("v"), F.asc("id")], F.col("v"), "v", True, n_parts=32)


def test_no_data_sized_single_partition_window(spark):
    # the point of the family: the data-sized window runs partitioned
    # by the slice id; the only single-partition window is over the
    # per-slice totals (row count == slice count, a cluster constant).
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 97).cast("decimal(18,6)").alias("v")
    )
    out = with_global_prefix_sum(
        df,
        order=[F.asc("v"), F.asc("id")],
        value=F.col("v"),
        bucket_by="v",
        num_partitions=8,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__slice" in plan


def test_global_row_number_matches_native(spark):
    df = spark.range(500).select(
        F.col("id"),
        ((F.col("id") * 13 + 5) % 100).alias("v"),
        (F.col("id") % 5).alias("payload"),
    )
    native = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("v"), F.asc("id")))
    )
    ours = with_global_row_number(
        df,
        order=[F.desc("v"), F.asc("id")],
        bucket_by="v",
        ascending=False,
        num_partitions=11,
    )
    a = {r.id: r.rn for r in native.collect()}
    b = {r.id: r.rn for r in ours.collect()}
    assert a == b


def test_global_row_number_repeat_runs_agree(spark):
    # re-executing the same DataFrame must give identical numbering
    # (the repartitionByRange version failed this with payload columns)
    df = spark.range(2000).select(
        F.col("id"),
        ((F.col("id") * 97 + 3) % 700).alias("v"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    ours = with_global_row_number(
        df,
        order=[F.asc("v"), F.asc("id")],
        bucket_by="v",
        num_partitions=16,
    )
    runs = [sorted((r.id, r.rn) for r in ours.collect()) for _ in range(3)]
    assert runs[0] == runs[1] == runs[2]
    assert sorted(rn for _, rn in runs[0]) == list(range(1, 2001))


def test_global_rank_matches_native_with_ties(spark):
    # v has heavy ties (only 7 distinct values across 300 rows)
    df = spark.range(300).select(F.col("id"), (F.col("id") % 7).alias("v"))
    native = df.withColumn("rnk", F.rank().over(Window.orderBy(F.desc("v"))))
    ours = with_global_rank(df, keys=["v"], ascending=[False], num_partitions=9)
    a = {r.id: r.rnk for r in native.collect()}
    b = {r.id: r.rnk for r in ours.collect()}
    assert a == b


def test_global_ntile_matches_native(spark):
    for n, k in [(10, 4), (500, 50), (3, 7), (100, 10), (101, 10)]:
        df = spark.range(n).select(
            F.col("id"),
            ((F.col("id") * 29 + 1) % 1000).alias("v"),
            (F.col("id") % 2).alias("payload"),
        )
        native = df.withColumn(
            "tile", F.ntile(k).over(Window.orderBy(F.asc("v"), F.asc("id")))
        )
        ours = with_global_ntile(
            df,
            order=[F.asc("v"), F.asc("id")],
            k=k,
            bucket_by="v",
            num_partitions=8,
        )
        a = {r.id: r.tile for r in native.collect()}
        b = {r.id: r.tile for r in ours.collect()}
        assert a == b, (n, k)
        assert ours.schema["tile"].dataType.simpleString() == "int"


def test_global_prefix_max_matches_native(spark):
    from smart_energy_consumption_analytics_using_big_data_spark.operators.windows import (
        with_global_prefix_max,
    )

    df = spark.range(400).select(
        F.col("id"),
        ((F.col("id") * 17 + 7) % 50).alias("x"),
        ((F.col("id") * 31 + 3) % 900).alias("y"),
    )
    for exclusive in (False, True):
        upper = -1 if exclusive else 0
        native = df.withColumn(
            "m",
            F.max("y").over(
                Window.orderBy(F.desc("x"), F.desc("y"), F.asc("id")).rowsBetween(
                    Window.unboundedPreceding, upper
                )
            ),
        )
        ours = with_global_prefix_max(
            df,
            order=[F.desc("x"), F.desc("y"), F.asc("id")],
            value=F.col("y"),
            bucket_by="x",
            ascending=False,
            out="m",
            exclusive=exclusive,
            num_partitions=7,
        )
        a = {r.id: r.m for r in native.collect()}
        b = {r.id: r.m for r in ours.collect()}
        assert a == b, exclusive


def test_global_prefix_sum_integer_values(spark):
    # the sweep-line use: +1/-1 integer deltas must stay integral
    df = spark.range(300).select(
        (F.col("id") % 60).alias("e"),
        F.when(F.col("id") % 2 == 0, 1).otherwise(-1).alias("d"),
        F.col("id"),
    )
    serial = df.withColumn(
        "cum",
        F.sum("d").over(
            Window.orderBy(F.asc("e"), F.desc("d"), F.asc("id")).rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    ours = with_global_prefix_sum(
        df,
        order=[F.asc("e"), F.desc("d"), F.asc("id")],
        value=F.col("d"),
        bucket_by="e",
        out="cum",
        zero=F.lit(0).cast("long"),
        num_partitions=9,
    )
    a = {r.id: r.cum for r in serial.collect()}
    b = {r.id: r.cum for r in ours.collect()}
    assert a == b
    assert ours.schema["cum"].dataType.simpleString() == "bigint"


def test_global_row_number_constant_bucket_key(spark):
    # the documented degenerate: every bucketing value identical, so
    # all quantile boundaries coincide and the whole input lands in
    # ONE slice — the two-pass must gracefully become the serial
    # window, not drop or duplicate ranks
    df = spark.range(400).select(
        F.col("id"), F.lit(7).alias("v"), (F.col("id") % 3).alias("payload")
    )
    ours = with_global_row_number(
        df,
        order=[F.asc("v"), F.asc("id")],
        bucket_by="v",
        num_partitions=8,
    )
    got = sorted((r.id, r.rn) for r in ours.collect())
    assert got == [(i, i + 1) for i in range(400)]


def test_global_row_number_hypothesis_tie_structures(spark):
    # arbitrary duplicate structures vs the native serial window
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=80)
    )
    def check(vs):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vs)], "id long, v long"
        )
        native = df.withColumn(
            "rn", F.row_number().over(Window.orderBy(F.asc("v"), F.asc("id")))
        )
        ours = with_global_row_number(
            df, order=[F.asc("v"), F.asc("id")], bucket_by="v", num_partitions=5
        )
        assert {(r.id, r.rn) for r in ours.collect()} == {
            (r.id, r.rn) for r in native.collect()
        }

    check()
