"""Calendar / time-derivation scalar functions.

SURVEY.md SS2.8 (F1-F5). All JVM-side built-ins - these run inside
whole-stage codegen, never in Python.

Encoding notes carried from the reference:

* ``dayofweek``: Spark numbers Sunday=1..Saturday=7
  (`forecasting_model.py:105`); weekend is {1, 7}.
* cyclical encodings keep the literal 3.14159 of the reference
  (`feature_engineering.py:142-148`) for bit-parity in tests.
* seasons follow `feature_engineering.py:132-138` (meteorological).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

REFERENCE_PI = 3.14159  # feature_engineering.py:142 uses this literal


def with_calendar(df: DataFrame, ts: str) -> DataFrame:
    """Date-part derivations (F2/F3; `data_preprocessing.py:147-152`)."""
    return (
        df.withColumn("date", F.to_date(ts))
        .withColumn("year", F.year(ts))
        .withColumn("month", F.month(ts))
        .withColumn("day", F.dayofmonth(ts))
        .withColumn("hour", F.hour(ts))
        .withColumn("weekday", F.date_format(ts, "E"))
        .withColumn("day_of_week", F.dayofweek(ts))
    )


def is_weekend(day_of_week: Column) -> Column:
    """Weekend flag as int (F4; `forecasting_model.py:108-114`)."""
    return day_of_week.isin(1, 7).cast("int")


def season(month: Column) -> Column:
    """Meteorological season (F4; `feature_engineering.py:132-138`)."""
    return (
        F.when(month.isin(12, 1, 2), "Winter")
        .when(month.isin(3, 4, 5), "Spring")
        .when(month.isin(6, 7, 8), "Summer")
        .otherwise("Autumn")
    )


def cyclical(col: Column, period: int) -> tuple[Column, Column]:
    """(sin, cos) cyclical encoding (F5; `feature_engineering.py:142-148`)."""
    angle = 2 * REFERENCE_PI * col / period
    return F.sin(angle), F.cos(angle)


def pct_change(cur: Column, prev: Column) -> Column:
    """Safe percent change (F7; `feature_engineering.py:176`)."""
    return F.try_divide(cur - prev, prev) * 100
