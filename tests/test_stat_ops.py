"""Semantic checks for the round-4 statistical operators - the oracle
gate proves Spark == DuckDB; these prove both equal the FORMULA on
hand-computable fixtures."""

from __future__ import annotations

import datetime as dt
import math

from smart_energy_consumption_analytics_using_big_data_spark.plans.analytics import (
    q_ts_acf,
)
from smart_energy_consumption_analytics_using_big_data_spark.plans.extensions import (
    q_drift_wasserstein,
    q_ts_kaplan_meier,
    q_ts_periodogram,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_wasserstein_known_shift(spark, tmp_path):
    # first half all 1.0, second half all 3.0 -> W1 = |CDF gap| * width
    # = 1.0 * (3-1) = 2.0 (point masses two units apart)
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(hours=i), 1, "view", 1.0) for i in range(10)]
    rows += [(i + 10, base + dt.timedelta(hours=i + 100), 1, "view", 3.0) for i in range(10)]
    _events(spark, rows).write.parquet(str(tmp_path / "events.parquet"))
    out = q_drift_wasserstein(spark, str(tmp_path)).collect()
    assert out[0].w1_distance == 2.0


def test_kaplan_meier_textbook_small_sample(spark, tmp_path):
    # Three single-user sessions of 10, 20, 30 minutes (2-event sessions),
    # all completed (well before the final hour ends via a far sentinel
    # user). Classic KM with no censoring: S(10)=2/3, S(20)=1/3.
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid, minutes in ((1, 10), (2, 20), (3, 30)):
        rows.append((eid, base, uid, "view", 1.0)); eid += 1
        rows.append((eid, base + dt.timedelta(minutes=minutes), uid, "view", 1.0)); eid += 1
    # sentinel session far in the future so the three real sessions are
    # outside the censoring window (it itself is censored and excluded)
    rows.append((eid, base + dt.timedelta(days=30), 99, "view", 1.0))
    _events(spark, rows).write.parquet(str(tmp_path / "events.parquet"))
    out = {r.duration_min: (r.n_at_risk, r.survival) for r in
           q_ts_kaplan_meier(spark, str(tmp_path)).collect()}
    assert out[10] == (3, round(2 / 3, 6))
    assert out[20] == (2, round(1 / 3, 6))
    # t=30 is the last at-risk row (d == n) and is excluded by design


def test_periodogram_peaks_at_true_period(spark, tmp_path):
    # hourly series = pure 24h sinusoid -> amplitude at 24h must beat
    # every other candidate period by a wide margin
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(hours=i), 1, "view",
         round(10.0 + 5.0 * math.sin(2 * math.pi * (i % 24) / 24), 2))
        for i in range(24 * 14)
    ]
    _events(spark, rows).write.parquet(str(tmp_path / "events.parquet"))
    amp = {r.period: r.amplitude for r in q_ts_periodogram(spark, str(tmp_path)).collect()}
    assert amp[24] > 4 * max(amp[6], amp[12], amp[168]), amp


def test_acf_lag24_on_daily_cycle(spark, tmp_path):
    # same synthetic daily cycle: acf at lag 24 should be near 1,
    # and far above lag 3 (quarter-phase of a 24h sine is negative or
    # small)
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(hours=i), 1, "view",
         round(10.0 + 5.0 * math.sin(2 * math.pi * (i % 24) / 24), 2))
        for i in range(24 * 14)
    ]
    _events(spark, rows).write.parquet(str(tmp_path / "events.parquet"))
    r = q_ts_acf(spark, str(tmp_path)).collect()[0]
    assert r.acf_24 > 0.99
    assert r.acf_24 > r.acf_3


def test_skyline_equals_bruteforce_dominance(spark):
    from smart_energy_consumption_analytics_using_big_data_spark.plans.analytics import (
        q_skyline_2d,
    )

    got = {r.user_id for r in q_skyline_2d(spark, "/root/testdata/sf0.001").collect()}
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    import pyspark.sql.functions as F

    u = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"),
        )
        .collect()
    )
    pts = [(r.user_id, r.n, r.c) for r in u]
    brute = {
        uid
        for uid, n, c in pts
        if not any(
            (n2 >= n and c2 >= c and (n2 > n or c2 > c)) for _, n2, c2 in pts
        )
    }
    assert got == brute


def test_auc_known_small_sample(spark, tmp_path):
    """AUC on a hand-computable score/label set with a TIE spanning
    both classes (the tied-average-rank path). One event per user:
    u1 neg view 152.00 -> score 15200; u2 pos purchase 152.00 ->
    15200 (cross-class tie); u3 neg view 1.00 -> 100; u4 pos purchase
    153.00 -> 15300. Pairs: (u3,u2) win, (u3,u4) win, (u1,u2) tie 0.5,
    (u1,u4) win => AUC = 3.5/4 = 0.875."""
    from smart_energy_consumption_analytics_using_big_data_spark.plans.analytics import q_eval_auc

    base = dt.datetime(2024, 5, 1)
    rows = [
        (1, base, 1, "view", 152.00),
        (2, base, 2, "purchase", 152.00),
        (3, base, 3, "view", 1.00),
        (4, base, 4, "purchase", 153.00),
    ]
    _events(spark, rows).write.parquet(str(tmp_path / "events.parquet"))
    r = q_eval_auc(spark, str(tmp_path)).collect()[0]
    assert (r.n_pos, r.n_neg, r.auc) == (2, 2, 0.875)
