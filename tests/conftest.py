from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from smart_energy_consumption_analytics_using_big_data_spark import get_spark

SEED = 42
SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def readings_fixture(tmp_path_factory):
    """Deterministic raw half-hourly readings (FIXTURES.md SS1): 3 CSV
    shards, trailing-space kWh column, 'Null' sentinels, missing rows."""
    rng = np.random.default_rng(SEED)
    households = [f"MAC{n:06d}" for n in range(1, 11)]
    times = pd.date_range("2013-01-01", "2013-02-28 23:30:00", freq="30min")
    frames = []
    for i, hh in enumerate(households):
        level = rng.lognormal(mean=-1.0, sigma=0.3)
        intraday = 0.5 + 0.5 * np.sin(2 * np.pi * (times.hour * 2 + times.minute // 30) / 48)
        noise = rng.lognormal(mean=0, sigma=0.2, size=len(times))
        kwh = level * intraday * noise
        frames.append(
            pd.DataFrame(
                {
                    "LCLid": hh,
                    "stdorToU": "Std" if i % 10 < 7 else "ToU",
                    "DateTime": times.strftime("%Y-%m-%d %H:%M:%S"),
                    "KWH/hh (per half hour) ": np.round(kwh, 4).astype(str),
                }
            )
        )
    pdf = pd.concat(frames, ignore_index=True)
    # ~3% missing rows, ~0.5% "Null" sentinels, ~0.2% empty
    keep = rng.random(len(pdf)) > 0.03
    pdf = pdf[keep].reset_index(drop=True)
    sentinel = rng.random(len(pdf)) < 0.005
    pdf.loc[sentinel, "KWH/hh (per half hour) "] = "Null"
    empty = rng.random(len(pdf)) < 0.002
    pdf.loc[empty, "KWH/hh (per half hour) "] = ""

    out = tmp_path_factory.mktemp("readings")
    shards = np.array_split(pdf, 3)
    for i, shard in enumerate(shards):
        shard.to_csv(out / f"block_{i}.csv", index=False)
    return str(out)


@pytest.fixture(scope="session")
def tariffs_fixture():
    """Half-hourly ToU tariff dimension (FIXTURES.md SS2); covers only
    ~80% of the readings range so the left join leaves NULL tariffs."""
    rng = np.random.default_rng(SEED)
    times = pd.date_range("2013-01-01", "2013-02-15 23:30:00", freq="30min")
    blocks = rng.choice(["Normal", "Low", "High"], size=(len(times) // 48) + 1, p=[0.85, 0.1, 0.05])
    tariff = np.repeat(blocks, 48)[: len(times)]
    return pd.DataFrame({"TariffDateTime": times, "Tariff": tariff})


@pytest.fixture(scope="session")
def daily_ar_fixture():
    """AR(1) daily series per entity (FIXTURES.md SS3): lag-correlated so
    linear forecasting achieves high R2 and rolling features matter."""
    rng = np.random.default_rng(SEED)
    rows = []
    for uid in range(1, 21):
        level = 10 + 5 * rng.random()
        x = level
        for day, date in enumerate(pd.date_range("2013-01-01", periods=100, freq="D")):
            x = level + 0.8 * (x - level) + rng.normal(0, 0.5)
            rows.append((uid, date.date(), float(x)))
    return pd.DataFrame(rows, columns=["user_id", "date", "label_value"])
