"""Round-14 drift attribution: the sf0.1 headline suite read 64.9 s
vs r13's 36.25 s with ZERO suite-query code changes this round, and
the bench's own calibration probes degraded DURING the run (arrow
0.577 start -> 0.905 end vs r13's 0.512/0.444) — the ambient-regime
signature (PERFORMANCE.md r11/r13), worst on Arrow/Python-worker
paths, which is exactly the mover list (simhash_arrow +6.9 s,
dsir +2.6, bfs +2.4, textrank +1.9, kmeans +1.7).

Protocol (the r13 standing answer): run the biggest movers SOLO,
1 warm + 4 reps, count-forced exactly like bench.run_one,
calibration-bracketed, and compare against the committed historical
solo anchors (drift_probe_r13.json). Solo-at-anchor = in-suite read
was regime + interference; solo-above-anchor-by-the-calibration-ratio
= the whole session is in a slow regime; only solo-above-anchor
SURVIVING the calibration division would implicate code (impossible
here — no suite query changed — but the probe proves it rather than
asserts it).

Usage: python scripts/probe_r14_drift.py   (solo; writes
drift_probe_r14.json)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import run_calibration
from probe_r13_drift import solo_medians
from smart_energy_consumption_analytics_using_big_data_spark import get_spark

# r14 in-suite movers (BENCH vs BENCH_r13_local.json) + r13 solo anchors
MOVERS = (
    "q_dedup_simhash_arrow",  # in-suite 9.09 vs r13 2.21; r13 solo 1.25
    "q_sample_dsir",          # 3.68 vs 1.13; no prior solo anchor
    "q_graph_bfs",            # 8.22 vs 5.78; r13 solo 3.84
    "q_text_textrank",        # 4.62 vs 2.70; r13 solo 2.41
    "q_ml_anomaly_kmeans",    # 4.20 vs 2.54; r13 solo 1.99
    "q_dedup_ppjoin",         # 2.94 vs 1.95; r13 solo 1.38
)


def main() -> None:
    spark = get_spark("drift-probe-r14")
    spark.sparkContext.setLogLevel("ERROR")
    cal0 = run_calibration(spark)
    solo = solo_medians(spark, MOVERS)
    cal1 = run_calibration(spark)
    out = {"calibration_start": cal0, "calibration_end": cal1, "solo": solo}
    print(json.dumps(out))
    # anchor to the repo root (the committed artifact's home), not CWD
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "drift_probe_r14.json",
    )
    with open(dest, "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
