"""r14 streaming scale probe (VERDICT r13 task 5): how does the
transformWithState surface scale in EVENTS and in STATE?

SessionTimerProcessor holds a ListState of open sessions per key and
one timer per key; WatermarkTtlCountProcessor (new r14) holds a fixed
(n, anchor) pair per key. Replaying availableNow, the whole input is
one micro-batch processed at watermark 0, so EVERY session of the
replay is simultaneously open in the ListState before the final empty
batch flushes the closed ones — the peak-state worst case, harsher
than any steady-state incremental run.

Two adversarial replication axes over sf0.1 events (100k rows / 1.5k
users), x10 and x100 each:

- churn:   user_id shifted per replica -> keys xR, events xR, per-key
           state constant. Tests state BREADTH (RocksDB key count,
           timer count = O(keys)).
- samekey: user_id kept, ts shifted per replica by span + 2*gap so
           replica sessions can never merge -> keys constant, per-key
           open-session ListState xR deep. Tests state DEPTH (the
           axis a hot key exercises in production).

Linear wall-time in events on both axes = the operator carries no
super-linear state term; a samekey blow-up would mean the per-key
list dominates (quadratic merge, oversized Arrow batches).

Usage: python scripts/probe_r14_streaming.py [out_json]
Writes one JSON object; run solo (ambient-regime rules apply).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from smart_energy_consumption_analytics_using_big_data_spark import get_spark
from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import load_table

SF01 = "/root/testdata/sf0.1"
GAP_S = 1800
DELAY_S = 86400


def build(spark, out_dir: str, replicas: int, mode: str) -> str:
    ev = load_table(spark, SF01, "events").select("user_id", "ts", "event_type", "value")
    span_s = ev.agg(
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias("s")
    ).first()["s"]
    shift_s = int(span_s) + 2 * GAP_S
    parts = []
    for i in range(replicas):
        if mode == "churn":
            parts.append(
                ev.select(
                    (F.col("user_id") + F.lit(i * 1_000_000)).alias("user_id"),
                    "ts", "event_type", "value",
                )
            )
        else:  # samekey: disjoint time bands per replica, same keys
            parts.append(
                ev.select(
                    "user_id",
                    (F.col("ts") + F.expr(f"INTERVAL {i * shift_s} SECONDS")).alias("ts"),
                    "event_type", "value",
                )
            )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    path = f"{out_dir}/events_{mode}_x{replicas}.parquet"
    big.write.mode("overwrite").parquet(path)
    return path


def run_sessions(spark, path: str) -> tuple[float, int]:
    from smart_energy_consumption_analytics_using_big_data_spark.streaming.stateful_v2 import (
        stream_user_sessions_tws,
    )

    t0 = time.time()
    out = stream_user_sessions_tws(spark, path, gap_s=GAP_S, delay_s=DELAY_S)
    n = out.count()
    return time.time() - t0, n


def run_wm_ttl(spark, path: str) -> tuple[float, int]:
    from smart_energy_consumption_analytics_using_big_data_spark.streaming.stateful_v2 import (
        stream_user_counts_wm_ttl,
    )

    t0 = time.time()
    out = stream_user_counts_wm_ttl(spark, path, ttl_s=2 * GAP_S, delay_s=DELAY_S)
    n = out.count()
    return time.time() - t0, n


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "probe_r14_streaming.json"
    work = "/tmp/spark_graft_stream_probe"
    spark = get_spark("stream-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict = {"base_events": 100_000, "base_users": 1_500,
                    "gap_s": GAP_S, "delay_s": DELAY_S}
    # warm the TWS machinery once so JVM/worker startup is off the books
    warm = build(spark, work, 1, "churn")
    run_sessions(spark, warm)
    run_wm_ttl(spark, warm)
    # build each derived dataset ONCE, outside the operator loop (both
    # operators replay the same files)
    paths = {
        (mode, r): (warm if r == 1 else build(spark, work, r, mode))
        for mode in ("churn", "samekey")
        for r in (1, 10, 100)
    }
    for op, runner in (("sessions_timer", run_sessions), ("wm_ttl", run_wm_ttl)):
        report[op] = {}
        for mode in ("churn", "samekey"):
            for replicas in (1, 10, 100):
                secs, n = runner(spark, paths[(mode, replicas)])
                key = f"{mode}_x{replicas}"
                report[op][key] = {"s": round(secs, 2), "out_rows": n}
                print(json.dumps({op: {key: report[op][key]}}), file=sys.stderr)
                # the memory sinks are uuid-named and otherwise live for
                # the whole process — the x100 legs alone would pin two
                # ~9.5M-row tables on the driver
                for tbl in spark.catalog.listTables():
                    if tbl.name.startswith("stateful_v2_"):
                        spark.catalog.dropTempView(tbl.name)
    # events-per-second curve: linear state handling shows as flat-ish
    for op in ("sessions_timer", "wm_ttl"):
        for mode in ("churn", "samekey"):
            b = report[op][f"{mode}_x1"]["s"]
            report[op][f"{mode}_ratio_x10"] = round(report[op][f"{mode}_x10"]["s"] / b, 2)
            report[op][f"{mode}_ratio_x100"] = round(report[op][f"{mode}_x100"]["s"] / b, 2)
    print(json.dumps(report))
    with open(out_json, "w") as f:
        json.dump(report, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
