"""Explicit schemas for the energy-domain tables.

The reference infers every schema from data (`data_ingestion.py:59`
``inferSchema=True`` - an extra full scan of 167M rows); at 100 TB an
explicit StructType is mandatory: one scan, stable types, and typed
DateType instead of the reference's lexicographic string dates
(`data_preprocessing.py:152`, SURVEY.md SS1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Raw half-hourly smart-meter readings (FIXTURES.md SS1; mirrors the LCL
# CSV ingested at data_ingestion.py:59,90 - including the trailing-space
# column name, which is load-bearing in the reference).
RAW_READING_KWH_COL = "KWH/hh (per half hour) "

READINGS_CSV_SCHEMA = T.StructType(
    [
        T.StructField("LCLid", T.StringType()),
        T.StructField("stdorToU", T.StringType()),
        T.StructField("DateTime", T.TimestampType()),
        # Stays string at the edge: the feed embeds literal "Null"
        # sentinels (data_preprocessing.py:132-137). The reader maps the
        # sentinel to NULL via the `nullValue` option so the column can
        # be typed without an ANSI cast failure.
        T.StructField(RAW_READING_KWH_COL, T.DoubleType()),
    ]
)

# Half-hourly time-of-use tariff dimension (FIXTURES.md SS2; loaded from
# Excel via pandas in the reference, data_preprocessing.py:57-64).
TARIFFS_SCHEMA = T.StructType(
    [
        T.StructField("TariffDateTime", T.TimestampType()),
        T.StructField("Tariff", T.StringType()),
    ]
)

# Daily rollup contract (stage-2 output; FIXTURES.md SS3) - the input to
# feature engineering and forecasting. `date` is a proper DateType here,
# a documented deviation from the reference's string dates.
DAILY_SCHEMA = T.StructType(
    [
        T.StructField("LCLid", T.StringType()),
        T.StructField("date", T.DateType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("month", T.IntegerType()),
        T.StructField("day", T.IntegerType()),
        T.StructField("weekday", T.StringType()),
        T.StructField("daily_energy_kwh", T.DoubleType()),
        T.StructField("avg_hourly_energy", T.DoubleType()),
        T.StructField("total_readings", T.LongType()),
        T.StructField("Tariff", T.StringType()),
    ]
)
