"""Interleaved A/B/C: join-strategy conf for the three bench queries
whose final plans still carry SortMergeJoin sections

  - q_dedup_semantic        (in-cell pair SMJ Inner + final LeftOuter)
  - q_text_textrank         (per-iteration edges x ranks SMJ)
  - q_sql_min_cost_supplier (agg-output x agg-output SMJ)

All three variants run in ONE session (the regime-noise protocol):

  A = defaults (preferSortMergeJoin=true, AQE SHJ conversion off)
  B = spark.sql.join.preferSortMergeJoin=false   (planner-time SHJ)
  C = spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=128m
      (AQE runtime SMJ->SHJ when every post-shuffle partition fits)

Join strategy cannot change the join's output multiset, and the
driver's comparator is order-insensitive; equality is still verified
with exceptAll both ways per variant before timing. The query is
REBUILT after each conf flip (planning happens at action time, but
rebuild removes any capture ambiguity) and timed through the noop sink
with the same build+execute window as bench.run_one.

Usage: python scripts/probe_r15_shj_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_energy_consumption_analytics_using_big_data_spark import get_spark
from smart_energy_consumption_analytics_using_big_data_spark.plans import QUERIES

CASES = ["q_dedup_semantic", "q_text_textrank", "q_sql_min_cost_supplier"]

VARIANTS = {
    "A_smj": {
        "spark.sql.join.preferSortMergeJoin": "true",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "0",
    },
    "B_planner_shj": {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "0",
    },
    "C_aqe_shj": {
        "spark.sql.join.preferSortMergeJoin": "true",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "128m",
    },
}


def set_variant(spark, conf: dict[str, str]) -> None:
    for k, v in conf.items():
        spark.conf.set(k, v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("probe-r15-shj-ab")
    spark.sparkContext.setLogLevel("ERROR")

    # --- equality + plan-shape check per query/variant ---------------
    # ADVICE r15: compare on live DataFrames with lineage cut by an
    # EAGER localCheckpoint (no full collect to the driver, scales past
    # sf0.1; eager so the baseline materializes under variant A's conf,
    # not lazily under whichever variant runs the first action), and
    # raise an explicit error instead of a bare assert (which
    # `python -O` would silently skip).
    for name in CASES:
        set_variant(spark, VARIANTS["A_smj"])
        base_df = QUERIES[name](spark, sf_dir).localCheckpoint()
        for vn in ("B_planner_shj", "C_aqe_shj"):
            set_variant(spark, VARIANTS[vn])
            df = QUERIES[name](spark, sf_dir)
            extra = df.exceptAll(base_df).count()
            missing = base_df.exceptAll(df).count()
            print(f"[{name}][{vn}] exceptAll: new-base={extra} base-new={missing}",
                  flush=True)
            if extra or missing:
                raise RuntimeError(f"{name}/{vn} results differ")
            spark.catalog.clearCache()
        set_variant(spark, VARIANTS["A_smj"])
        spark.catalog.clearCache()

    # --- plan shape: does the variant actually change the join? ------
    plan_changed: dict[str, set[str]] = {}
    for name in CASES:
        shapes = {}
        for vn, conf in VARIANTS.items():
            set_variant(spark, conf)
            df = QUERIES[name](spark, sf_dir)
            # executed plan (AQE final) needs a run; use the noop sink
            df.write.format("noop").mode("overwrite").save()
            plan = df._jdf.queryExecution().executedPlan().toString()
            shapes[vn] = (plan.count("SortMergeJoin"), plan.count("ShuffledHashJoin"))
            spark.catalog.clearCache()
        print(f"[{name}] (SMJ, SHJ) per variant: {shapes}", flush=True)
        # ADVICE r15: a variant whose executed join mix matches the
        # baseline is a no-op — timing it adds a third of the probe's
        # wall time as pure position-bias ballast. Time only variants
        # whose plan actually changed (plus the baseline).
        plan_changed[name] = {"A_smj"} | {
            vn for vn in VARIANTS if vn != "A_smj" and shapes[vn] != shapes["A_smj"]
        }
    set_variant(spark, VARIANTS["A_smj"])

    # --- interleaved timing ------------------------------------------
    for name in CASES:
        timed = {vn: VARIANTS[vn] for vn in VARIANTS if vn in plan_changed[name]}
        skipped = [vn for vn in VARIANTS if vn not in plan_changed[name]]
        if skipped:
            print(f"[{name}] skipping plan-identical variants: {skipped}", flush=True)
        ts: dict[str, list[float]] = {vn: [] for vn in timed}
        for r in range(reps):
            for vn, conf in timed.items():
                set_variant(spark, conf)
                spark.sparkContext.setJobDescription(f"{name} {vn} rep{r}")
                t0 = time.monotonic()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                ts[vn].append(time.monotonic() - t0)
                spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        for vn, xs in ts.items():
            print(
                f"[{name}] {vn} median={statistics.median(xs):.3f} "
                f"{['%.2f' % x for x in xs]}",
                flush=True,
            )


if __name__ == "__main__":
    main()
