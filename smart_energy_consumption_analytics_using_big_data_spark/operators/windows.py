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


# ---------------------------------------------------------------------------
# Globally-ordered analytics without single-task windows.
#
# ``Window.orderBy(...)`` with no partitionBy collapses the whole input
# onto one task (Spark even warns) — fine for a bin-bounded table, a
# scale-killer on anything data-sized. The family below implements the
# classic two-pass scheme instead: slice the total order into
# contiguous value ranges, compute per-slice ranks/sums in parallel
# (window keyed on the slice id), then combine the per-slice totals — a
# bounded set, one row per slice — into broadcast offsets.
#
# Slice assignment is a PURE FUNCTION of the row, not of execution:
# boundaries are collected once on the driver (approx quantiles of the
# bucketing key — n-1 doubles, a cluster constant) and embedded as
# literals. This matters for correctness, not just determinism:
# ``repartitionByRange`` RE-SAMPLES its boundaries on every execution
# of the exchange, and Spark executes the local-rank branch and the
# offsets branch of this DAG separately unless ReuseExchange happens to
# dedupe them — measured on the orders table, the two executions
# disagreed on slice membership and corrupted the global row numbers.
# Literal boundaries make every re-execution agree by construction.
#
# The result is invariant to the boundary choice (boundaries only
# decide WHERE the order is cut, and within-slice math plus exact
# offsets reproduce the serial result for any contiguous cut), so the
# outputs are also partition-count-invariant. Constraints: the
# bucketing key must be non-null and numeric; heavy ties on a single
# key value degrade toward fewer effective slices (graceful — the
# serial window is the floor).


def _value_sliced(
    df: DataFrame,
    bucket_by: str,
    ascending: bool,
    num_partitions: int | None,
) -> DataFrame:
    """Add ``__slice``: a deterministic contiguous range id over
    ``bucket_by`` (monotone in the requested direction), from
    driver-collected quantile boundaries embedded as literals."""
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    sign = 1.0 if ascending else -1.0
    keyed = df.withColumn("__bk", F.col(bucket_by).cast("double") * sign)
    probs = [i / n for i in range(1, n)]
    if probs:
        bounds = keyed.stat.approxQuantile("__bk", probs, 0.001)
    else:
        bounds = []
    if bounds:
        # count of boundaries strictly below the key — plain scalar
        # comparisons (no higher-order lambda), folded into one sum the
        # optimizer constant-folds and codegens freely
        terms = [
            (F.col("__bk") > F.lit(float(b))).cast("int") for b in bounds
        ]
        slice_col = terms[0]
        for term in terms[1:]:
            slice_col = slice_col + term
    else:
        slice_col = F.lit(0)
    return keyed.withColumn("__slice", slice_col).drop("__bk")


def with_global_prefix_sum(
    df: DataFrame,
    order: list[Column],
    value: Column,
    bucket_by: str,
    ascending: bool = True,
    out: str = "cum_sum",
    num_partitions: int | None = None,
    zero: Column | None = None,
) -> DataFrame:
    """Globally-ordered running sum without a single-task window.

    ``order`` is the total order (include a unique tiebreak);
    ``bucket_by``/``ascending`` name its leading numeric key for the
    slice assignment. Exactness: pass a DECIMAL or integer ``value``
    (both are associative under addition), so slice-local sums +
    offsets reproduce the serial prefix sum bit-for-bit — the same
    partition-invariance discipline as
    ``operators.aggregates.sum_exact``. ``zero`` types the offset of
    the first slice (default a decimal literal; pass a long zero for
    integer values to keep the output integral)."""
    sliced = _value_sliced(df, bucket_by, ascending, num_partitions)
    w_local = (
        Window.partitionBy("__slice")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = sliced.withColumn("__local_cum", F.sum(value).over(w_local))
    # one row per slice: bounded by the slice count, not the data
    w_off = Window.orderBy("__slice").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        sliced.groupBy("__slice")
        .agg(F.sum(value).alias("__slice_total"))
        .withColumn("__offset", F.sum("__slice_total").over(w_off))
        .select("__slice", "__offset")
    )
    joined = local.join(F.broadcast(offsets), "__slice", "left")
    if zero is None:
        zero = F.lit(0).cast("decimal(18,6)")
    return joined.withColumn(
        out, F.col("__local_cum") + F.coalesce(F.col("__offset"), zero)
    ).drop("__slice", "__local_cum", "__offset")


def with_global_prefix_max(
    df: DataFrame,
    order: list[Column],
    value: Column,
    bucket_by: str,
    ascending: bool = True,
    out: str = "run_max",
    exclusive: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Globally-ordered running MAX without a single-task window — the
    sweep-line primitive (skyline/Pareto frontier, envelope tracking).
    ``exclusive=True`` gives the ROWS BETWEEN UNBOUNDED PRECEDING AND
    1 PRECEDING frame (current row excluded; the first row of the
    whole order gets NULL, matching the serial window). Max is
    idempotent and associative, so slice-local maxima + an exclusive
    per-slice prefix max combine exactly via ``greatest`` (which skips
    NULL sides)."""
    sliced = _value_sliced(df, bucket_by, ascending, num_partitions)
    upper = -1 if exclusive else 0
    w_local = (
        Window.partitionBy("__slice")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    local = sliced.withColumn("__local_max", F.max(value).over(w_local))
    w_off = Window.orderBy("__slice").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        sliced.groupBy("__slice")
        .agg(F.max(value).alias("__slice_max"))
        .withColumn("__offset", F.max("__slice_max").over(w_off))
        .select("__slice", "__offset")
    )
    joined = local.join(F.broadcast(offsets), "__slice", "left")
    return joined.withColumn(
        out, F.greatest(F.col("__local_max"), F.col("__offset"))
    ).drop("__slice", "__local_max", "__offset")


def with_global_row_number(
    df: DataFrame,
    order: list[Column],
    bucket_by: str,
    ascending: bool = True,
    out: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Globally-ordered 1-based row_number without a single-task window
    — per-slice row_number in parallel plus broadcast exclusive COUNT
    offsets. Counts are exact integers, so unlike the sum variant there
    is no numeric-representation caveat; ``order`` must still be total
    (include a unique tiebreak) for a deterministic result. Emitted as
    LONG (Spark's native row_number is int-typed and would overflow
    past 2^31 rows); cast at the call site if int parity is needed."""
    sliced = _value_sliced(df, bucket_by, ascending, num_partitions)
    w_local = Window.partitionBy("__slice").orderBy(*order)
    local = sliced.withColumn("__local_rn", F.row_number().over(w_local))
    w_off = Window.orderBy("__slice").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        sliced.groupBy("__slice")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn("__offset", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)))
        .select("__slice", "__offset")
    )
    return (
        local.join(F.broadcast(offsets), "__slice", "left")
        .withColumn(
            out, (F.col("__local_rn").cast("long") + F.col("__offset")).cast("long")
        )
        .drop("__slice", "__local_rn", "__offset")
    )


def with_global_rank(
    df: DataFrame,
    keys: list[str],
    ascending: list[bool] | None = None,
    out: str = "rnk",
    num_partitions: int | None = None,
) -> DataFrame:
    """Globally-ordered RANK (ties share the rank of their first row)
    over the named sort ``keys`` without a single-task window.

    rank(x) = 1 + count of rows strictly before x's tie group. A tie
    group is equal on ALL sort keys, hence equal on ``keys[0]`` — and
    ``_value_sliced`` assigns equal bucketing values to the SAME slice
    (strictly-greater boundary comparisons), so tie groups never span
    slices and the global rank is simply the slice-local ``F.rank()``
    plus the exclusive per-slice row-count offset. (The first version
    recovered it as the min global row_number per group via a keyed
    aggregation + join back, which executed the ranking pipeline twice
    per call — the with_global_ntile recount lesson.) Keys must be
    non-null; LONG-typed like with_global_row_number."""
    ascending = ascending or [True] * len(keys)
    order = [F.asc(k) if asc else F.desc(k) for k, asc in zip(keys, ascending)]
    sliced = _value_sliced(df, keys[0], ascending[0], num_partitions)
    w_local = Window.partitionBy("__slice").orderBy(*order)
    local = sliced.withColumn("__local_rk", F.rank().over(w_local))
    w_off = Window.orderBy("__slice").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        sliced.groupBy("__slice")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn("__offset", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)))
        .select("__slice", "__offset")
    )
    return (
        local.join(F.broadcast(offsets), "__slice", "left")
        .withColumn(
            out, (F.col("__local_rk").cast("long") + F.col("__offset")).cast("long")
        )
        .drop("__slice", "__local_rk", "__offset")
    )


def with_global_ntile(
    df: DataFrame,
    order: list[Column],
    k: int,
    bucket_by: str,
    ascending: bool = True,
    out: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Globally-ordered NTILE(k) without a single-task window, exactly
    matching Spark's semantics: with n rows, the first ``n % k``
    buckets hold ``n // k + 1`` rows, the rest ``n // k`` (rows n < k
    get tile == row_number). Derived from the two-pass row_number plus
    a 1-row broadcast total — all-integer arithmetic
    (ceil(a/b) == (a+b-1) div b), so the result is bit-deterministic.
    INT-typed to match the native ntile it replaces."""
    rn = with_global_row_number(
        df,
        order=order,
        bucket_by=bucket_by,
        ascending=ascending,
        out="__rn",
        num_partitions=num_partitions,
    )
    # row_number preserves rows, so count the INPUT: counting rn would
    # re-execute the whole two-pass ranking pipeline inside the
    # broadcast subquery of the same action (one full extra pass per
    # ntile call; the q_rfm_segment replay lesson, in miniature)
    total = df.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    # long-arith via double division + truncation: exact for n < 2^53,
    # far past the 2^31 ceiling Spark's int-typed ntile has anyway
    q = F.col("__n") - (F.col("__n") / k).cast("long") * k  # n % k
    big = (F.col("__n") / k).cast("long") + 1  # bucket size n//k + 1
    small = (F.col("__n") / k).cast("long")
    rn_c = F.col("__rn")
    in_big = rn_c <= big * q
    tile = F.when(in_big, ((rn_c + big - 1) / big).cast("long")).otherwise(
        q
        + (
            (rn_c - big * q + F.greatest(small, F.lit(1)) - 1)
            / F.greatest(small, F.lit(1))
        ).cast("long")
    )
    return (
        rn.crossJoin(F.broadcast(total))
        .withColumn(out, tile.cast("int"))
        .drop("__rn", "__n")
    )
