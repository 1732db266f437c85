"""Time-weighted average (q_ts_time_weighted_avg) semantics."""

from __future__ import annotations

import datetime as dt

from smart_energy_consumption_analytics_using_big_data_spark.plans.analytics import (
    q_ts_time_weighted_avg,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_hold_duration_weighting_beats_row_average(spark, tmp_path):
    # value 10 held for 90 minutes, then three quick readings of 0 held
    # 10 minutes each: row-average = 2.5, TWA = (10*5400)/(5400+1800) = 7.5
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 7, "view", 10.0),
        (2, base + dt.timedelta(minutes=90), 7, "view", 0.0),
        (3, base + dt.timedelta(minutes=100), 7, "view", 0.0),
        (4, base + dt.timedelta(minutes=110), 7, "view", 0.0),
        (5, base + dt.timedelta(minutes=120), 7, "view", 99.0),  # last: no interval
    ]
    _events(spark, rows).write.parquet(str(tmp_path / "events.parquet"))
    out = q_ts_time_weighted_avg(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.user_id, r.n_intervals) == (7, 4)
    assert r.twa == 7.5


def test_single_reading_days_and_zero_span_are_excluded(spark, tmp_path):
    base = dt.datetime(2024, 1, 2, 12, 0, 0)
    rows = [
        (1, base, 1, "view", 5.0),  # lone reading: no interval
        (2, base, 2, "view", 1.0),  # two readings, same timestamp: span 0
        (3, base, 2, "view", 2.0),
    ]
    _events(spark, rows).write.parquet(str(tmp_path / "events.parquet"))
    assert q_ts_time_weighted_avg(spark, str(tmp_path)).count() == 0


def test_counter_delta_reset_semantics(spark, tmp_path):
    from smart_energy_consumption_analytics_using_big_data_spark.plans.analytics import (
        q_ts_counter_delta,
    )

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = [  # cumulative meter: 10 -> 25 -> RESET to 3 -> 8
        (1, base, 5, "meter", 10.0),
        (2, base + dt.timedelta(hours=1), 5, "meter", 25.0),
        (3, base + dt.timedelta(hours=2), 5, "meter", 3.0),
        (4, base + dt.timedelta(hours=3), 5, "meter", 8.0),
    ]
    _events(spark, rows).write.parquet(str(tmp_path / "events.parquet"))
    out = q_ts_counter_delta(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    # 15 (10->25) + 3 (post-reset absolute) + 5 (3->8); first row contributes 0
    assert (r.consumed, r.n_resets) == (23.0, 1)


def test_stream_counter_delta_matches_batch_fold(spark, tmp_path):
    from smart_energy_consumption_analytics_using_big_data_spark.streaming.stateful import (
        stream_counter_delta,
    )

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        (1, base, 5, "meter", 10.0),
        (2, base + dt.timedelta(hours=1), 5, "meter", 25.0),
        (3, base + dt.timedelta(hours=2), 5, "meter", 3.0),
        (4, base + dt.timedelta(hours=3), 5, "meter", 8.0),
        (5, base, 9, "meter", 4.0),
        (6, base + dt.timedelta(hours=1), 9, "meter", 6.5),
    ]
    _events(spark, rows).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.user_id: (r.consumed, r.n_resets)
        for r in stream_counter_delta(spark, str(tmp_path / "events.parquet")).collect()
    }
    assert out == {5: (23.0, 1), 9: (2.5, 0)}
