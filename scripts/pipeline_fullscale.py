"""Five-stage energy pipeline at the reference's published scale:
5,566 households / ~167.9M raw rows (VERDICT r10 item 1).

This is the one configuration BASELINE.md actually publishes end to
end (`README.md:291-292`: 114.05 min total on 167.9M rows;
`HADOOP_MAPREDUCE_ANALYSIS.md:274-280` per stage: ingest 9.55 min,
preprocess 41.72, features 26.62, training 35.98, anomaly 0.88).
Stage 4 runs `--grid reference` (the reference's exact 9-point LR +
4-point RF search with inner time-split validation) so every stage is
apples-to-apples.

Fixture: the household count is the reference's (5,566); the
half-hourly grid is extended back to 2012-03-24 (31,104 slots, ~648
days) so count x slots x 0.97 keep-rate lands on ~167.9M raw rows —
matching BOTH published dimensions, which the one-year grid cannot
(5,566 x 17,520 x 0.97 = 94.6M). Generation uses the sharded
process-pool generator (112 shards, the LCL dataset's own block-CSV
layout) and is untimed, like every other curve point.

Usage: python scripts/pipeline_fullscale.py [workdir]
Prints one JSON line; also appends nothing — PERFORMANCE.md is
updated by hand from the output.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from smart_energy_consumption_analytics_using_big_data_spark import get_spark
from smart_energy_consumption_analytics_using_big_data_spark.pipeline.energy_bench import (
    run_pipeline_bench,
)

HOUSEHOLDS = 5566
RANGE_START = "2012-03-24"  # 31,104 half-hour slots -> ~167.9M raw rows
SHARDS = 112


def main() -> None:
    # Same session shape as bench.py (local[$SPARK_GRAFT_CPUS], AQE on)
    # with two scale-sized knobs, both of which the first (cold, 32-
    # partition) full-scale run proved out (PERFORMANCE.md r11):
    # - driver heap 64g: the single JVM holds executors + shuffle state
    #   for a 168M-row aggregation;
    # - shuffle partitions 256: at 32, the 86M-group hourly rollup put
    #   2.7M groups in each reducer's hash map (measured 52 s warm;
    #   23 s at 128, 18 s at 256 — the spill knee). This is the "size
    #   shuffle partitions so partitions fit in memory at the target
    #   SF" rule, applied; AQE still coalesces the small stages.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    spark = get_spark("pipeline-fullscale", shuffle_partitions=256)
    spark.sparkContext.setLogLevel("ERROR")
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="energy_fullscale_"
    )
    # Tiny untimed warm pass (2 households, default grid): the recorded
    # ≤34M curve points all ran in a deep-warm session (bench.py warms
    # the pipeline's plan shapes the same way); the first cold run paid
    # ~1.5-2x on ingest/preprocess for C2 compilation of the CSV parse
    # and agg codegen, which is JVM startup, not scaling.
    with tempfile.TemporaryDirectory() as warmdir:
        run_pipeline_bench(spark, warmdir, households=2, shards=2)
    spark.catalog.clearCache()
    result = run_pipeline_bench(
        spark,
        workdir,
        households=HOUSEHOLDS,
        shards=SHARDS,
        grid="reference",
        range_start=RANGE_START,
        generator="sharded",
    )
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
