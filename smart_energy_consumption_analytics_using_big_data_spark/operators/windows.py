"""Per-entity ordered window operators.

SURVEY.md SS2.5 (W1-W7). The reference models a household's time series
as rows ordered inside ``Window.partitionBy("LCLid").orderBy("date")``
(`feature_engineering.py:83`); that is already the idiomatic Spark form
and it scales: one shuffle on the entity key serves every window below
(Catalyst reuses the sort/exchange across same-spec windows).

Frame subtlety carried over from the reference: trailing frames
*exclude the current row* (`rowsBetween(-7,-1)`) - leakage-safe rolling
features (`feature_engineering.py:94-99`). These are ROW frames, not
RANGE frames.

Determinism: callers should order by (time, unique_id) so lag/rank are
stable when timestamps tie.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec, functions as F


def entity_window(entity: str, *order: str | Column) -> WindowSpec:
    """Window.partitionBy(entity).orderBy(time, tiebreak...)."""
    return Window.partitionBy(entity).orderBy(*order)


def with_lags(df: DataFrame, value: str, w: WindowSpec, ks: list[int], prefix: str | None = None) -> DataFrame:
    """Lag grid (W1; k in {1,2,3,7,14,30} at `feature_engineering.py:86-89`)."""
    prefix = prefix or f"{value}_lag_"
    for k in ks:
        df = df.withColumn(f"{prefix}{k}", F.lag(value, k).over(w))
    return df


def with_trailing_stats(
    df: DataFrame,
    value: str,
    w: WindowSpec,
    n_rows: int,
    stats: tuple[str, ...] = ("avg", "stddev", "min", "max", "sum"),
    suffix: str | None = None,
) -> DataFrame:
    """Trailing n-row frame excluding current row (W2-W5;
    `feature_engineering.py:94-122`)."""
    frame = w.rowsBetween(-n_rows, -1)
    suffix = suffix or f"_{n_rows}r"
    fns = {"avg": F.avg, "stddev": F.stddev, "min": F.min, "max": F.max, "sum": F.sum}
    for stat in stats:
        col = fns[stat](value).over(frame)
        if stat in ("avg", "stddev", "sum"):
            col = F.round(col, 6)
        df = df.withColumn(f"rolling_{stat}{suffix}", col)
    return df


def with_partition_zscore(
    df: DataFrame,
    value: str,
    partition: str,
    out: str = "z_score",
) -> DataFrame:
    """Whole-partition z-score (W6; `anomaly_detection.py:132-140`).

    mean/stddev over an unbounded partition window, then per-row score -
    one shuffle, no driver-side pass.
    """
    w = Window.partitionBy(partition)
    mean = F.avg(value).over(w)
    std = F.stddev(value).over(w)
    return df.withColumn(out, F.round(F.try_divide(F.col(value) - mean, std), 6))


def with_rank(
    df: DataFrame,
    partition: str,
    order: list[Column],
    rank_col: str = "rnk",
    row_number_col: str = "rn",
) -> DataFrame:
    """rank + row_number per partition (W7; enables top-k-per-group and
    keep-first dedup)."""
    w = Window.partitionBy(partition).orderBy(*order)
    return df.withColumn(rank_col, F.rank().over(w)).withColumn(row_number_col, F.row_number().over(w))


def with_global_prefix_sum(
    df: DataFrame,
    order: list[Column],
    value: Column,
    out: str = "cum_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Globally-ordered running sum WITHOUT a single-partition window.

    ``Window.orderBy(...)`` with no partitionBy collapses the whole
    input onto one task (Spark even warns) — fine for a bin-bounded
    table, a scale-killer on anything data-sized. This is the classic
    two-pass parallel prefix sum instead:

    1. ``repartitionByRange`` on the global order -> each range
       partition holds a contiguous, disjoint slice of the total order;
    2. pass 1: a PER-PARTITION running sum (window partitioned by
       ``spark_partition_id()`` — parallel across slices) plus one
       total per slice;
    3. pass 2: the per-slice totals (<= shuffle-partition count, a
       cluster constant independent of data size) get an exclusive
       prefix sum on a single tiny task, then broadcast-join back as
       per-slice offsets.

    Exactness: the caller passes a DECIMAL ``value`` (decimal addition
    is associative), so slice-local sums + offsets reproduce the serial
    prefix sum bit-for-bit — same partition-invariance discipline as
    ``operators.aggregates.sum_exact``. The order columns must be a
    total order (include a unique tiebreak) or slice boundaries are
    nondeterministic.
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    sliced = df.repartitionByRange(n, *order).withColumn(
        "__slice", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("__slice")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = sliced.withColumn("__local_cum", F.sum(value).over(w_local))
    # one row per slice: bounded by the partition count, not the data
    w_off = (
        Window.orderBy("__slice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("__slice")
        .agg(F.sum(value).alias("__slice_total"))
        .withColumn("__offset", F.sum("__slice_total").over(w_off))
        .select("__slice", "__offset")
    )
    joined = local.join(F.broadcast(offsets), "__slice", "left")
    zero = F.lit(0).cast("decimal(18,6)")
    return joined.withColumn(
        out, F.col("__local_cum") + F.coalesce(F.col("__offset"), zero)
    ).drop("__slice", "__local_cum", "__offset")
