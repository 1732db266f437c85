"""Same-session A/B probe: stage-4 forecast training with the LR and
RF grid searches overlapped from two driver threads (r16, VERDICT r15
task 5).

The grid POINTS inside each family already fit concurrently (r3,
forecast.py); what stays sequential in energy_bench stage 4 is the LR
search (9 points + refit) followed by the RF search (4 points + refit)
— two independent job groups over the same cached feature table.
Guide §2.6: submit independent jobs from a small thread pool so the
second search's tasks back-fill executors freed by the first's tail.
Selection is unchanged (each family still picks its own first-minimum;
`best` still compares the two RMSEs), and every fit sees the identical
cached input with the same pinned seed, so models and metrics are
byte-identical.

A = sequential: lr = train_linear(...); rf = train_rf(...)
B = overlapped: both submitted to a 2-thread pool, results joined.

The probe generates one fixture, computes/caches feats once, then
alternates A,B,A,B..., asserting rmse/params equality each rep.

Usage: python scripts/probe_r16_forecast_overlap_ab.py [households] [reps]
(default households=556 ≈ 1/10 of full scale, reference grid)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from smart_energy_consumption_analytics_using_big_data_spark import get_spark
from smart_energy_consumption_analytics_using_big_data_spark.ml import forecast as FC
from smart_energy_consumption_analytics_using_big_data_spark.pipeline.energy_bench import (
    TEST_CUTOFF,
    VAL_CUTOFF,
    make_readings_csv,
)
from smart_energy_consumption_analytics_using_big_data_spark.sources import readers
from smart_energy_consumption_analytics_using_big_data_spark.sources.schemas import (
    RAW_READING_KWH_COL,
    READINGS_CSV_SCHEMA,
)

LR_GRID = dict(reg_params=(0.01, 0.1, 1.0), elastic_net_params=(0.0, 0.5, 1.0))
RF_GRID = ((50, 5), (50, 10), (100, 5), (100, 10))


def fit_sequential(feats):
    lr = FC.train_linear_forecast(feats, TEST_CUTOFF, VAL_CUTOFF, **LR_GRID)
    rf = FC.train_rf_forecast(feats, TEST_CUTOFF, grid=RF_GRID, val_cutoff=VAL_CUTOFF)
    return lr, rf


def fit_overlapped(feats):
    with ThreadPoolExecutor(max_workers=2) as ex:
        lr_f = ex.submit(
            FC.train_linear_forecast, feats, TEST_CUTOFF, VAL_CUTOFF, **LR_GRID
        )
        rf_f = ex.submit(
            FC.train_rf_forecast, feats, TEST_CUTOFF, grid=RF_GRID, val_cutoff=VAL_CUTOFF
        )
        return lr_f.result(), rf_f.result()


def main() -> None:
    households = int(sys.argv[1]) if len(sys.argv) > 1 else 556
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("probe-r16-forecast-overlap")
    spark.sparkContext.setLogLevel("ERROR")

    workdir = tempfile.mkdtemp(prefix="forecast_overlap_")
    csv_dir = os.path.join(workdir, "csv")
    make_readings_csv(csv_dir, households, shards=12)
    raw = readers.read_csv(spark, csv_dir, READINGS_CSV_SCHEMA)
    daily = (
        raw.select(
            F.col("LCLid").alias("user_id"),
            F.to_date("DateTime").alias("date"),
            F.col(RAW_READING_KWH_COL).alias("kwh"),
        )
        .filter(F.col("kwh").isNotNull())
        .groupBy("user_id", "date")
        .agg(F.sum("kwh").alias("label_value"))
    )
    feats = FC.add_forecast_features(daily, entity="user_id").cache()
    feats.count()

    # warm both shapes once (plan/codegen/MLlib class loading)
    fit_sequential(feats)
    fit_overlapped(feats)

    samples = {"A_sequential": [], "B_overlapped": []}
    ref = None
    for rep in range(reps):
        for name, fn in (("A_sequential", fit_sequential), ("B_overlapped", fit_overlapped)):
            spark.sparkContext.setJobDescription(f"forecast-overlap {name} rep{rep}")
            t0 = time.time()
            lr, rf = fn(feats)
            dt = round(time.time() - t0, 3)
            samples[name].append(dt)
            sig = (
                round(lr.metrics["rmse"], 10),
                lr.best_params["regParam"],
                lr.best_params["elasticNetParam"],
                round(rf.metrics["rmse"], 10),
                rf.best_params["numTrees"],
                rf.best_params["maxDepth"],
            )
            if ref is None:
                ref = sig
            elif sig != ref:
                raise RuntimeError(f"results differ: {sig} != {ref}")
    spark.sparkContext.setJobDescription(None)

    def med(v):
        s = sorted(v)
        n = len(s)
        return s[n // 2] if n % 2 else round((s[n // 2 - 1] + s[n // 2]) / 2, 3)

    print(
        json.dumps(
            {
                "households": households,
                "signature": ref,
                "samples": samples,
                "median": {n: med(v) for n, v in samples.items()},
                "B_faster_pairwise": f"{sum(1 for a, b in zip(samples['A_sequential'], samples['B_overlapped']) if b < a)}/{reps}",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
