"""Aggregations.

SURVEY.md SS2.4 (A1-A12). All aggregates are expressed as
``groupBy().agg()`` so Spark plans partial (map-side) + final hash
aggregation automatically - the two-level rollup chain of the reference
(`data_preprocessing.py:231-261`) costs exactly two shuffles, and the
second one is tiny because the first already reduced cardinality.

Determinism notes:

* `sum_exact` accumulates DOUBLE measures in DECIMAL so the result is
  independent of partitioning / accumulation order - a cross-engine
  reproducibility requirement (a plain double sum differs between runs
  at high row counts).
* the reference's nondeterministic ``first()`` per group
  (`data_preprocessing.py:255-258`) is replaced by ``min_by/max_by``
  with an explicit ordering column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def sum_exact(col: str | Column, scale: int = 6, precision: int = 25) -> Column:
    """Order-independent sum of a double column via decimal accumulation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def rollup_time(
    df: DataFrame,
    entity: str,
    ts: str,
    measure: str,
    grain: str = "hour",
) -> DataFrame:
    """Per-entity time rollup (A1; `data_preprocessing.py:231-234`).

    grain='hour' -> keys (entity, date, hour); grain='day' -> (entity, date).
    Measures: exact sum, avg, count - the reference's triple.
    """
    keys: list[Column] = [F.col(entity), F.to_date(ts).alias("date")]
    if grain == "hour":
        keys.append(F.hour(ts).alias("hour"))
    return df.groupBy(*keys).agg(
        sum_exact(measure).alias(f"{grain}ly_{measure}"),
        F.round(F.avg(measure), 6).alias(f"avg_{measure}"),
        F.count(F.lit(1)).alias("n_readings"),
    )


def reaggregate(
    hourly: DataFrame,
    keys: list[str],
    sum_col: str,
    avg_col: str,
    count_col: str,
) -> DataFrame:
    """Second-level rollup over a first rollup (A2;
    `data_preprocessing.py:246-261`)."""
    return hourly.groupBy(*keys).agg(
        sum_exact(sum_col).alias(f"daily_{sum_col}"),
        F.round(F.avg(sum_col), 6).alias(f"avg_{avg_col}"),
        F.sum(count_col).alias(f"total_{count_col}"),
    )


def top_k_groups(df: DataFrame, key: str, k: int, count_alias: str = "n") -> DataFrame:
    """Frequency count + deterministic top-N (A9;
    `streamlit_app.py:481,958`). Secondary sort on the key makes the
    result set unique under count ties."""
    counted = df.groupBy(key).agg(F.count(F.lit(1)).alias(count_alias))
    return counted.orderBy(F.desc(count_alias), F.asc(key)).limit(k)


def grouped_profile(df: DataFrame, key: str, value: str) -> DataFrame:
    """Grouped mean/stddev/count profile (A8; `streamlit_app.py:694`)."""
    return df.groupBy(key).agg(
        F.round(F.avg(value), 6).alias(f"avg_{value}"),
        F.round(F.stddev(value), 6).alias(f"std_{value}"),
        F.count(F.lit(1)).alias("n"),
    )


def hierarchy_rollup(df: DataFrame, levels: list[str], measure: str) -> DataFrame:
    """ROLLUP over a dimension hierarchy (A12).

    The reference re-aggregates manually stage by stage; `rollup` emits
    all prefixes of `levels` in ONE shuffle (partial aggregation covers
    every grouping set).
    """
    return df.rollup(*levels).agg(
        sum_exact(measure).alias(f"total_{measure}"),
        F.count(F.lit(1)).alias("n"),
    )


def robust_group_stats(
    df: DataFrame,
    group: str,
    value: str,
    max_literal_groups: int = 10_000,
) -> DataFrame:
    """Per-group median + MAD + outlier count at the 3-sigma-equivalent
    MAD threshold (heavy-tail-safe profile; `anomaly_detection.py:132-143`).

    Two formulations, picked by group cardinality:

    * literal-map (<= max_literal_groups): the per-group medians/MADs
      are dimension-sized, so they come back to the driver and re-enter
      the plan as literal maps - 3 fact scans (the algorithmic minimum)
      and no join subplan re-execution (the join form measured 6 scans
      single-node, because Spark does not reuse identical subplans).
    * join (> max_literal_groups): per-group stats stay distributed and
      attach via equi-joins on the group key - unbounded cardinality,
      no driver materialization, AQE free to broadcast the stats side
      when it fits.

    The guard makes the driver-collect path a checked contract instead
    of a docstring promise: a caller grouping by user_id cannot ship
    unbounded rows to the driver by accident.
    """
    stats_val = df.select(F.col(group), F.col(value).alias("__v"))
    med_df = stats_val.groupBy(group).agg(F.percentile("__v", 0.5).alias("med"))
    med_rows = med_df.limit(max_literal_groups + 1).collect()

    if len(med_rows) > max_literal_groups:
        dev = stats_val.join(med_df, group).withColumn(
            "adev", F.abs(F.col("__v") - F.col("med"))
        )
        mad_df = dev.groupBy(group).agg(F.percentile("adev", 0.5).alias("mad"))
        return (
            dev.join(mad_df, group)
            .groupBy(group)
            .agg(
                F.round(F.any_value("med"), 6).alias("median"),
                F.round(F.any_value("mad"), 6).alias("mad"),
                F.sum((F.col("adev") > 3 * 1.4826 * F.col("mad")).cast("bigint")).alias(
                    "n_outliers"
                ),
            )
        )

    def as_map(rows, val):
        pairs = []
        for r in rows:
            pairs.extend([F.lit(r[group]), F.lit(float(r[val]))])
        return F.create_map(*pairs)

    med = as_map(med_rows, "med")[F.col(group)]
    dev = stats_val.withColumn("med", med).withColumn(
        "adev", F.abs(F.col("__v") - F.col("med"))
    )
    mad_rows = dev.groupBy(group).agg(F.percentile("adev", 0.5).alias("mad")).collect()
    mad = as_map(mad_rows, "mad")[F.col(group)]
    return (
        dev.withColumn("mad", mad)
        .groupBy(group)
        .agg(
            F.round(F.any_value("med"), 6).alias("median"),
            F.round(F.any_value("mad"), 6).alias("mad"),
            F.sum((F.col("adev") > 3 * 1.4826 * F.col("mad")).cast("bigint")).alias(
                "n_outliers"
            ),
        )
    )


def dq_report(
    df: DataFrame,
    checks: list[tuple[str, Column, float | None, float | None]],
) -> DataFrame:
    """Deequ-style data-quality report: every metric is an aggregate
    expression evaluated in ONE pass over the table (single scan,
    single partial+final agg - adding a check costs an expression, not
    a scan), then the 1-row metric vector unpivots into one
    (check, value, passed) row per check via stack() - no driver
    round-trip, composable downstream (alert joins, history append).

    `checks`: (name, metric aggregate Column, lower, upper); a None
    bound is unchecked. The constraint verdict is computed engine-side
    so a 100 TB validation emits K tiny rows, not K queries.
    """
    metrics = df.agg(
        *[F.round(m.cast("double"), 6).alias(f"__m_{i}") for i, (_, m, _, _) in enumerate(checks)]
    )
    stack_args: list[Column] = []
    for i, (name, _, _, _) in enumerate(checks):
        stack_args += [F.lit(name), F.col(f"__m_{i}")]
    long = metrics.select(
        F.stack(F.lit(len(checks)), *stack_args).alias("check", "value")
    )
    bounds = F.create_map(
        *[
            c
            for name, _, lo, hi in checks
            for c in (
                F.lit(name),
                F.array(
                    F.lit(float("-inf") if lo is None else lo),
                    F.lit(float("inf") if hi is None else hi),
                ),
            )
        ]
    )
    lo = F.element_at(bounds.getItem(F.col("check")), 1)
    hi = F.element_at(bounds.getItem(F.col("check")), 2)
    return long.withColumn(
        "passed", (F.col("value") >= lo) & (F.col("value") <= hi)
    )
