"""Same-session A/B probe: winnow_pairs collect_set skew guard (r16,
VERDICT r15 item 2 / next-round task 3).

A = shipped winnow_pairs: groupBy(fp).agg(array_sort(collect_set(doc)))
    then filter(size <= max_df) — a degenerate hot fingerprint's FULL
    doc set is buffered in one aggregation buffer before the size
    filter drops it (single-buffer OOM candidate at scale).
B = count-gated rewrite: repartition fps by fp ONCE, then (1) a
    count(*)-per-fp aggregation (buffer = one long per group — skew-
    safe partial agg) filtered to df <= max_df, (2) a left-semi join of
    the SAME repartitioned fps against the surviving fp set, (3) the
    collect_set aggregation over the pruned rows only — no over-max_df
    doc array is ever buffered. The explicit repartition makes the two
    fps consumers share ONE exchange (ReusedExchange / AQE stage
    reuse), so the fingerprint pipeline (the Arrow kernel on the arrow
    path) executes once, and both the semi join and the final agg
    reuse the fp partitioning — no additional exchange.

Output-identical: fps rows are distinct (doc, fp) on every hash path,
so count(*) per fp == size(collect_set(doc)); dropping groups before
the collect == dropping them after by the size filter.

Usage: python scripts/probe_r16_winnow_gate_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from smart_energy_consumption_analytics_using_big_data_spark import get_spark
from smart_energy_consumption_analytics_using_big_data_spark.ext import dedup as D
from smart_energy_consumption_analytics_using_big_data_spark.plans._registry import t

TRI = (
    "flatten(transform(__docs, (x, i) -> "
    "transform(slice(__docs, i + 2, size(__docs) - i - 1), "
    "y -> struct(x AS doc_a, y AS doc_b))))"
)


def winnow_pairs_gated(
    docs: DataFrame,
    k: int = 8,
    w: int = 16,
    max_df: int = 16,
    min_shared: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
) -> DataFrame:
    if hash_fn == "arrow":
        fps = D.winnow_fingerprints_arrow(docs, k, w, text_col, id_col)
    else:
        fps = D.winnow_fingerprints(docs, k, w, text_col, id_col, hash_fn)
    fps = fps.filter(F.col("fp").isNotNull()).repartition("fp")
    ok = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= max_df)
        .select("fp")
    )
    return (
        fps.join(ok.hint("shuffle_hash"), "fp", "left_semi")
        .groupBy("fp")
        .agg(F.array_sort(F.collect_set(id_col)).alias("__docs"))
        .select(F.explode(F.expr(TRI)).alias("__p"))
        .select("__p.doc_a", "__p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("probe-r16-winnow-gate-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = t(spark, sf_dir, "documents")

    # equality gates first, every hash path
    for hf in ("arrow", "xxhash64", "md5"):
        a = D.winnow_pairs(docs, hash_fn=hf)
        b = winnow_pairs_gated(docs, hash_fn=hf)
        extra = a.exceptAll(b).count()
        missing = b.exceptAll(a).count()
        print(f"equality[{hf}]: A\\B={extra} B\\A={missing}", flush=True)
        if extra or missing:
            raise RuntimeError(f"gated rewrite changes results on {hf} — abort")

    # plan shape: the gated form must not add an exchange and must
    # reuse the fps subtree (one Arrow kernel on the arrow path)
    import io
    from contextlib import redirect_stdout

    for hf in ("arrow", "md5"):
        buf = io.StringIO()
        with redirect_stdout(buf):
            winnow_pairs_gated(docs, hash_fn=hf).explain("formatted")
        text = buf.getvalue()
        n_ex = text.count("Exchange")
        n_reuse = text.count("ReusedExchange")
        n_py = text.count("MapInPandas")
        print(f"plan[{hf}] gated: Exchange={n_ex} ReusedExchange={n_reuse} MapInPandas={n_py}")
        buf = io.StringIO()
        with redirect_stdout(buf):
            D.winnow_pairs(docs, hash_fn=hf).explain("formatted")
        text = buf.getvalue()
        print(
            f"plan[{hf}] shipped: Exchange={text.count('Exchange')} "
            f"ReusedExchange={text.count('ReusedExchange')} MapInPandas={text.count('MapInPandas')}"
        )

    variants = {"A_shipped": D.winnow_pairs, "B_gated": winnow_pairs_gated}
    report = {}
    for hf in ("arrow", "xxhash64"):
        for fn in variants.values():  # warm both shapes
            noop(fn(docs, hash_fn=hf))
        samples = {n: [] for n in variants}
        for rep in range(reps):
            for name, fn in variants.items():
                spark.sparkContext.setJobDescription(f"winnow-gate {hf} {name} rep{rep}")
                t0 = time.time()
                noop(fn(docs, hash_fn=hf))
                samples[name].append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)

        def med(v):
            s = sorted(v)
            n = len(s)
            return s[n // 2] if n % 2 else round((s[n // 2 - 1] + s[n // 2]) / 2, 3)

        report[hf] = {
            "samples": samples,
            "median": {n: med(v) for n, v in samples.items()},
            "B_faster_pairwise": f"{sum(1 for a, b in zip(samples['A_shipped'], samples['B_gated']) if b < a)}/{reps}",
        }
        print(json.dumps({hf: report[hf]}), flush=True)

    # skew ramp: one fingerprint family shared by 10^4 docs (a 30-char
    # boilerplate prefix guarantees >= w+k-1 = 23 shared chars, so every
    # doc shares winnowing fingerprints). The gated shape must complete
    # with bounded aggregation buffers; the hot fps are dropped at the
    # count gate, never collected.
    boiler = "the quick brown fox jumps over the lazy dog "  # 45 chars
    skew = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(boiler), F.col("id").cast("string")).alias("text"),
    )
    t0 = time.time()
    n_b = winnow_pairs_gated(skew, hash_fn="xxhash64").count()
    tb = time.time() - t0
    t0 = time.time()
    n_a = D.winnow_pairs(skew, hash_fn="xxhash64").count()
    ta = time.time() - t0
    print(
        json.dumps(
            {"skew_10k_hot_fp": {"A_shipped": {"rows": n_a, "sec": round(ta, 3)},
                                 "B_gated": {"rows": n_b, "sec": round(tb, 3)}}}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
