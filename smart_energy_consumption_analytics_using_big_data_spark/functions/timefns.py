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


def as_utc_timestamp(col: Column | str) -> Column:
    """Normalize a time column to TimestampType under the pinned-UTC session.

    The testdata's physical representation has drifted across rounds
    (INT64 TIMESTAMP(NANOS) read as bigint -> TIMESTAMP_NTZ micros), and
    epoch arithmetic hard-coded to one representation broke when it
    changed. This is the single typed accessor every epoch-deriving
    plan goes through instead:

    * ``timestamp``      -> identity (Catalyst folds the no-op cast).
    * ``timestamp_ntz``  -> exact under the session timezone pinned to
      UTC by ``sources.catalog.configure_runtime`` (a wall-clock
      reinterpretation, no value shift).
    * ``bigint`` *epoch seconds* -> cast interprets the value as
      seconds (ANSI semantics) - identity for epoch-second longs.

    bigint *nanos* never reaches here: ``sources.catalog.load_table``
    converts that flavor at the scan.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp")


def epoch_us(col: Column | str) -> Column:
    """Epoch microseconds (bigint) from any supported time column."""
    return F.unix_micros(as_utc_timestamp(col))


def epoch_s(col: Column | str) -> Column:
    """Epoch seconds (bigint, floor) from any supported time column."""
    return F.unix_seconds(as_utc_timestamp(col))


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
