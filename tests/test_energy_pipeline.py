"""Golden end-to-end energy pipeline test (SURVEY.md SS5 strategy 2/3):
multi-shard CSV ingest -> clean -> tariff join -> hourly -> daily ->
features, asserting the FIXTURES.md SS6 invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smart_energy_consumption_analytics_using_big_data_spark.pipeline import energy
from smart_energy_consumption_analytics_using_big_data_spark.sources import readers
from smart_energy_consumption_analytics_using_big_data_spark.sources.schemas import (
    RAW_READING_KWH_COL,
    READINGS_CSV_SCHEMA,
    TARIFFS_SCHEMA,
)


@pytest.fixture(scope="module")
def stages(spark, readings_fixture, tariffs_fixture):
    raw = readers.read_csv(spark, readings_fixture, READINGS_CSV_SCHEMA)
    tariffs = readers.dim_from_pandas(
        spark, tariffs_fixture, schema=TARIFFS_SCHEMA, expected_columns=["TariffDateTime", "Tariff"]
    )
    cleaned = energy.clean_readings(raw)
    with_tariff = energy.join_tariffs(cleaned, tariffs)
    hourly = energy.hourly_rollup(with_tariff)
    daily = energy.daily_rollup(hourly)
    features = energy.engineer_features(daily)
    return {
        "raw": raw,
        "cleaned": cleaned,
        "with_tariff": with_tariff,
        "hourly": hourly,
        "daily": daily,
        "features": features,
    }


def test_multi_shard_scan_and_sentinels(stages):
    raw = stages["raw"]
    total = raw.count()
    assert total > 25_000  # 3 shards read as one scan
    # "Null" sentinel and empty strings became real NULLs at the reader
    nulls = raw.filter(F.col(RAW_READING_KWH_COL).isNull()).count()
    assert nulls > 0


def test_row_count_funnel_monotonic(stages):
    # FIXTURES.md SS6.2
    raw_n = stages["raw"].count()
    clean_n = stages["cleaned"].count()
    daily_n = stages["daily"].count()
    feat_n = stages["features"].count()
    assert raw_n >= clean_n > daily_n > feat_n > 0


def test_entity_preservation(stages):
    # FIXTURES.md SS6.1 (mirrors data_preprocessing.py:207-215)
    def entities(df):
        return {r["LCLid"] for r in df.select("LCLid").distinct().collect()}

    assert entities(stages["cleaned"]) == entities(stages["daily"])
    # warm-up drop may only remove whole short series, never new ids
    assert entities(stages["features"]) <= entities(stages["daily"])


def test_join_no_fanout(stages):
    # FIXTURES.md SS6.4: unique tariff timestamps => row count unchanged
    assert stages["with_tariff"].count() == stages["cleaned"].count()
    # and coverage is partial by construction (tariff dim truncated)
    uncovered = stages["with_tariff"].filter(F.col("Tariff").isNull()).count()
    assert uncovered > 0


def test_rollup_algebra(stages):
    # FIXTURES.md SS6.3: sum(hourly) == daily per (LCLid, date)
    hourly_daily = stages["hourly"].groupBy("LCLid", "date").agg(
        F.round(F.sum("hourly_energy_kwh"), 4).alias("s")
    )
    joined = stages["daily"].join(hourly_daily, ["LCLid", "date"])
    bad = joined.filter(
        F.abs(F.col("s") - F.round(F.col("daily_energy_kwh"), 4)) > 1e-3
    ).count()
    assert bad == 0


def test_trailing_frame_semantics_on_daily(stages):
    # FIXTURES.md SS6.5: rolling_avg_7r at row i = mean of rows i-7..i-1
    rows = (
        stages["features"]
        .filter(F.col("LCLid") == "MAC000001")
        .orderBy("date")
        .select("date", "daily_energy_kwh", "rolling_avg_7r")
        .collect()
    )
    daily_all = (
        stages["daily"]
        .filter(F.col("LCLid") == "MAC000001")
        .orderBy("date")
        .select("date", "daily_energy_kwh")
        .collect()
    )
    series = [r["daily_energy_kwh"] for r in daily_all]
    dates = [r["date"] for r in daily_all]
    idx = dates.index(rows[0]["date"])
    expected = sum(series[idx - 7 : idx]) / 7
    assert abs(rows[0]["rolling_avg_7r"] - expected) < 1e-4


def test_feature_surface_complete(stages):
    cols = set(stages["features"].columns)
    expected = (
        {f"lag_{k}" for k in energy.LAG_DAYS}
        | {
            "rolling_avg_7r", "rolling_stddev_7r", "rolling_min_7r", "rolling_max_7r",
            "rolling_sum_7r", "rolling_avg_30r", "rolling_stddev_30r",
            "day_of_week", "is_weekend", "season",
            "month_sin", "month_cos", "day_sin", "day_cos",
            "tariff_normal", "tariff_low", "tariff_high",
            "energy_change", "energy_change_pct", "deviation_from_weekly", "zscore_7r",
        }
    )
    missing = expected - cols
    assert not missing, f"missing feature columns: {missing}"


def test_preprocess_to_parquet_matches_lazy_chain(spark, readings_fixture, tariffs_fixture, tmp_path):
    """The parquet-handoff stage-2 writer (r10: daily derived from the
    JUST-WRITTEN hourly parquet, avoiding the double execution of
    clean -> join -> hourly-agg) must be row-identical to deriving both
    rollups from the one lazy chain."""
    raw = readers.read_csv(spark, readings_fixture, READINGS_CSV_SCHEMA)
    tariffs = readers.dim_from_pandas(
        spark, tariffs_fixture, schema=TARIFFS_SCHEMA, expected_columns=["TariffDateTime", "Tariff"]
    )
    energy.preprocess_to_parquet(
        spark, raw, tariffs, str(tmp_path / "hourly"), str(tmp_path / "daily")
    )
    hourly_lazy, daily_lazy = energy.preprocess(raw, tariffs)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    hourly_disk = spark.read.parquet(str(tmp_path / "hourly"))
    daily_disk = spark.read.parquet(str(tmp_path / "daily"))
    assert sorted(hourly_disk.columns) == sorted(hourly_lazy.columns)
    assert sorted(daily_disk.columns) == sorted(daily_lazy.columns)
    assert rows(hourly_disk.select(*hourly_lazy.columns)) == rows(hourly_lazy)
    assert rows(daily_disk.select(*daily_lazy.columns)) == rows(daily_lazy)
