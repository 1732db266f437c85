"""Same-session interleaved A/B for the three r15 duplicated-subtree
materializations (lazy localCheckpoint of a narrow intermediate that
two join branches consume):

* ppjoin    — prefix_filtered_pairs' post-filter prefix table
              (A = checkpoint_prefix=False, the shipped r14 shape;
               B = checkpoint_prefix=True, the r15 default)
* semantic  — semantic_dedup's (id, vec, cell) tagged table
              (A = inline copy of the r14 body; B = library r15)
* qnorm     — q_feature_quantile_norm's (gv, gi) global index
              (A = inline copy of the r14 body; B = registry r15)

Each: exact equality first (exceptAll both ways), then interleaved
timed reps.

Usage: python scripts/probe_r15_ckpt_ab.py [sf_dir] [reps] [which...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window, functions as F

from smart_energy_consumption_analytics_using_big_data_spark import get_spark
from smart_energy_consumption_analytics_using_big_data_spark.ext import dedup as D
from smart_energy_consumption_analytics_using_big_data_spark.ext import similarity as S
from smart_energy_consumption_analytics_using_big_data_spark.ext.similarity import (
    cosine,
    ivf_assign,
    ivf_centroids,
)
from smart_energy_consumption_analytics_using_big_data_spark.operators.windows import (
    with_global_row_number,
)
from smart_energy_consumption_analytics_using_big_data_spark.plans import QUERIES
from smart_energy_consumption_analytics_using_big_data_spark.plans._registry import t


def semantic_dedup_r14(
    embeddings: DataFrame,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Verbatim r14 semantic_dedup body (tagged NOT checkpointed)."""
    cells = (
        ivf_assign(embeddings, ivf_centroids(embeddings, vec_col, label_col),
                   vec_col, id_col)
        .select(id_col, "cell")
        .persist()
    )
    tagged = embeddings.select(id_col, vec_col).join(cells, id_col)
    a = tagged.select(
        F.col(id_col).alias("id_a"), F.col("cell"), F.col(vec_col).alias("va")
    )
    b = tagged.select(
        F.col(id_col).alias("id_b"), F.col("cell"), F.col(vec_col).alias("vb")
    )
    dups = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.round(cosine(F.col("va"), F.col("vb")), 6) >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return (
        cells.join(dups.withColumn("__dup", F.lit(True)), id_col, "left")
        .select(
            id_col,
            "cell",
            F.coalesce(~F.col("__dup"), F.lit(True)).alias("kept"),
        )
    )


def qnorm_r14(spark, sf_dir):
    """Verbatim r14 q_feature_quantile_norm body (g NOT checkpointed)."""
    d = t(spark, sf_dir, "documents")
    nrow = d.agg(F.count(F.lit(1)).alias("__N"))
    ws = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("source")
    s = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(ws).alias("r"),
        F.count(F.lit(1)).over(wn).alias("ns"),
    )
    g = with_global_row_number(
        d.select("n_chars", "doc_id"),
        order=[F.asc("n_chars"), F.asc("doc_id")],
        bucket_by="n_chars",
        out="gi",
    ).select(F.col("n_chars").cast("double").alias("gv"), "gi")
    pos = (
        F.when(F.col("ns") == 1, F.lit(0.0)).otherwise(
            (F.col("r") - 1).cast("double") / (F.col("ns") - 1).cast("double")
        )
    ) * (F.col("__N") - 1).cast("double")
    posd = s.crossJoin(F.broadcast(nrow)).select(
        "doc_id", "source", "n_chars", pos.alias("pos")
    )
    idx0 = F.floor("pos").cast("bigint")
    p0 = posd.select("*", (idx0 + 1).alias("gi0"), (idx0 + 2).alias("gi1"))
    g0 = g.select(F.col("gi").alias("gi0"), F.col("gv").alias("gv0"))
    g1 = g.select(F.col("gi").alias("gi1"), F.col("gv").alias("gv1"))
    return (
        p0.join(g0, "gi0")
        .join(g1, "gi1", "left")
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.round(
                F.col("gv0")
                + (F.col("pos") - F.floor("pos"))
                * (F.coalesce("gv1", "gv0") - F.col("gv0")),
                6,
            ).alias("qnorm"),
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    which = sys.argv[3:] or ["ppjoin", "semantic", "qnorm"]
    spark = get_spark("probe-r15-ckpt-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def sh():
        return D.shingle_table(
            t(spark, sf_dir, "documents"), n=3, max_df=100, keep_df=True
        )

    pairs = {
        "ppjoin": (
            lambda: D.prefix_filtered_pairs(sh(), 3, 5, checkpoint_prefix=False),
            lambda: D.prefix_filtered_pairs(sh(), 3, 5, checkpoint_prefix=True),
        ),
        "semantic": (
            lambda: semantic_dedup_r14(t(spark, sf_dir, "embeddings")),
            lambda: S.semantic_dedup(t(spark, sf_dir, "embeddings")),
        ),
        "qnorm": (
            lambda: qnorm_r14(spark, sf_dir),
            lambda: QUERIES["q_feature_quantile_norm"](spark, sf_dir),
        ),
    }

    report = {}
    for name in which:
        fa, fb = pairs[name]
        ra, rb = fa(), fb()
        extra = ra.exceptAll(rb).count()
        missing = rb.exceptAll(ra).count()
        spark.catalog.clearCache()
        print(f"{name} equality: A\\B={extra} B\\A={missing}", flush=True)
        assert extra == 0 and missing == 0, f"{name}: rewrite changes results"
        for fn in (fa, fb):
            fn().count()
            spark.catalog.clearCache()
        samples = {"A": [], "B": []}
        for _ in range(reps):
            for key, fn in (("A", fa), ("B", fb)):
                t0 = time.time()
                fn().count()
                samples[key].append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
        med = {k: sorted(v)[len(v) // 2] for k, v in samples.items()}
        report[name] = {"samples": samples, "median": med}
        print(json.dumps({name: report[name]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
