"""Standing gate-on A/B for q_sql_min_cost_supplier's size-gated
semi-join pre-filter (r16, VERDICT r15 task 6).

r15 shipped the pre-filter behind a 64 MB fact-size gate, measured
FASTER at 108 MB only via a raw-SQL replica of the query
(scripts/probe_r15_mcs_scale.py). This probe closes the gap: it drives
the REGISTERED query through its own gate on a standing >=64 MB
dataset — sf0.1 with lineitem and part replicated 10x (same key shift
as scripts/scale_probe.build_derived, preserving the part filter's
2.7% key selectivity), every other table copied as-is so
register_views works unchanged. The gate turns itself ON from
table_size_bytes (108 MB >= 64 MB); the OFF branch is forced with
SPARK_GRAFT_MCS_PREFILTER_BYTES, exactly the cluster-override knob.

Equality (exceptAll both ways) gates the timing; the gated plan is
written to plans/r16/q_sql_min_cost_supplier_scale_prefilter.txt so
the LeftSemi-below-both-agg-exchanges claim is checkable offline.

Usage: python scripts/probe_r16_mcs_gate_ab.py [probe_dir] [reps]
"""

from __future__ import annotations

import io
import json
import os
import shutil
import statistics
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from smart_energy_consumption_analytics_using_big_data_spark import get_spark
from smart_energy_consumption_analytics_using_big_data_spark.plans import QUERIES
from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import (
    TESTDATA_TABLES,
    load_table,
    table_size_bytes,
)

SF01 = "/root/testdata/sf0.1"
REPLICAS = 10
L_SHIFT = 10_000_000  # scale_probe.build_derived's l_partkey shift
O_SHIFT = 100_000_000


def build_probe_dir(spark, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    li = load_table(spark, SF01, "lineitem")
    l_parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * O_SHIFT))
        .withColumn("l_partkey", F.col("l_partkey") + F.lit(i * L_SHIFT))
        for i in range(REPLICAS)
    ]
    big_l = l_parts[0]
    for p in l_parts[1:]:
        big_l = big_l.unionByName(p)
    big_l.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")
    part = load_table(spark, SF01, "part")
    p_parts = [
        part.withColumn("p_partkey", F.col("p_partkey") + F.lit(i * L_SHIFT))
        for i in range(REPLICAS)
    ]
    big_p = p_parts[0]
    for p in p_parts[1:]:
        big_p = big_p.unionByName(p)
    big_p.write.mode("overwrite").parquet(f"{out_dir}/part.parquet")
    for name in TESTDATA_TABLES:
        if name in ("lineitem", "part"):
            continue
        src = f"{SF01}/{name}.parquet"
        dst = f"{out_dir}/{name}.parquet"
        if os.path.exists(src) and not os.path.exists(dst):
            (shutil.copytree if os.path.isdir(src) else shutil.copyfile)(src, dst)


def main() -> None:
    probe_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_mcs10x"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("probe-r16-mcs-gate")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(f"{probe_dir}/lineitem.parquet"):
        build_probe_dir(spark, probe_dir)
    li_bytes = table_size_bytes(spark, probe_dir, "lineitem")
    print(f"lineitem bytes: {li_bytes} ({li_bytes / 2**20:.1f} MiB)", flush=True)
    if li_bytes < 64 * 1024 * 1024:
        raise RuntimeError("probe dataset below the 64 MB gate — rebuild it")

    def build(gated: bool):
        if gated:
            os.environ.pop("SPARK_GRAFT_MCS_PREFILTER_BYTES", None)
        else:
            os.environ["SPARK_GRAFT_MCS_PREFILTER_BYTES"] = str(1 << 60)
        return QUERIES["q_sql_min_cost_supplier"](spark, probe_dir)

    on, off = build(True), build(False)
    extra = on.exceptAll(off).count()
    missing = off.exceptAll(on).count()
    print(f"equality: on\\off={extra} off\\on={missing}", flush=True)
    if extra or missing:
        raise RuntimeError("gated branch changes results — abort")

    # committed evidence: the gated plan at gate-on size
    buf = io.StringIO()
    with redirect_stdout(buf):
        build(True).explain("formatted")
    plan_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r16",
        "q_sql_min_cost_supplier_scale_prefilter.txt",
    )
    os.makedirs(os.path.dirname(plan_path), exist_ok=True)
    with open(plan_path, "w") as fh:
        fh.write(f"== q_sql_min_cost_supplier (gate ON, dir={probe_dir}) ==\n")
        fh.write(buf.getvalue())
    txt = buf.getvalue()
    print(
        f"gated plan: LeftSemi={txt.count('LeftSemi')} "
        f"Exchange={txt.count('Exchange')}",
        flush=True,
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(build(True))  # warm both shapes
    noop(build(False))
    t_on, t_off = [], []
    for r in range(reps):
        spark.sparkContext.setJobDescription(f"mcs gate OFF rep{r}")
        t0 = time.monotonic(); noop(build(False)); t_off.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(f"mcs gate ON rep{r}")
        t0 = time.monotonic(); noop(build(True)); t_on.append(round(time.monotonic() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    os.environ.pop("SPARK_GRAFT_MCS_PREFILTER_BYTES", None)
    print(
        json.dumps(
            {
                "lineitem_bytes": li_bytes,
                "gate_off_samples": t_off,
                "gate_on_samples": t_on,
                "median_off": statistics.median(t_off),
                "median_on": statistics.median(t_on),
                "on_faster_pairwise": f"{sum(1 for a, b in zip(t_off, t_on) if b < a)}/{reps}",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
