"""Join strategies.

SURVEY.md SS2.3 (J1-J5). Scale rules encoded here:

* dimension joins broadcast explicitly (`F.broadcast`) - the reference
  relied on Catalyst's size estimate for its 17,521-row tariff dim
  (`data_preprocessing.py:182`); at 100 TB we make the intent explicit
  so a stale statistic can never demote it to a shuffle join;
* fact x fact joins shuffle on the join key - callers co-partition /
  bucket upstream when the key is reused across stages;
* AQE skew-join handles hot keys (enabled in session.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def join_dim(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str] | Column,
    how: str = "left",
) -> DataFrame:
    """Broadcast dimension join (J1; `data_preprocessing.py:182`)."""
    return fact.join(F.broadcast(dim), on, how)


def join_fact(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Fact x fact equi-join on (composite) key (J2;
    `anomaly_detection.py:85-86`). Shuffles both sides on the key."""
    return left.join(right, on, how)


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """LEFT SEMI (J5): rows of `left` with a match - never duplicates."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """LEFT ANTI (J5): rows of `left` without a match."""
    return left.join(right, on, "left_anti")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: salt the skewed (left) side, replicate the
    right side across salt buckets.

    For hot keys (one household/user with millions of rows) a plain
    shuffle join puts the whole key on one reducer. Salting splits each
    left key across `salt_buckets` partitions; the right side is
    exploded once per bucket so every salted partition finds its match.
    AQE's skew-join handles moderate skew automatically (enabled in
    session.py); this is the explicit tool for pathological keys.
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int")
    left_salted = left.withColumn("__salt", salt)
    right_replicated = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = left_salted.join(right_replicated, [on, "__salt"], how)
    return out.drop("__salt")


def asof_join_grid(
    fact: DataFrame,
    dim: DataFrame,
    fact_ts: str,
    dim_ts: str,
    grid: str = "30 minutes",
    how: str = "left",
) -> DataFrame:
    """As-of join collapsed to equi-join on a shared time grid (J5).

    The reference's tariff join is semantically as-of but both sides sit
    on the same half-hourly grid (`data_preprocessing.py:182`), so the
    scalable form is: floor the fact timestamp to the grid, then
    broadcast equi-join - no range-join explosion, no custom strategy.
    """
    # window(ts, grid).start floors to the grid for arbitrary intervals
    bucketed = fact.withColumn("__grid_ts", F.window(F.col(fact_ts), grid)["start"])
    dim_keyed = dim.withColumnRenamed(dim_ts, "__grid_ts")
    out = bucketed.join(F.broadcast(dim_keyed), "__grid_ts", how)
    return out.drop("__grid_ts")
