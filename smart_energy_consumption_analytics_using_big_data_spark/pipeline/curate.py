"""Embedding-corpus curation chain: integrity filter -> semantic dedup
-> k-center coreset -> deterministic shard/order export (`cli.py
curate`).

Each stage is the same declarative plan the registry oracles
individually (q_emb_quality_audit's checks, q_dedup_semantic,
q_sample_kcenter, q_corpus_shuffle); this module composes them over one
lineage, so the full build stays a handful of plans with one action per
stage boundary - the embedding-side mirror of pipeline/corpus.py's
text chain.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from smart_energy_consumption_analytics_using_big_data_spark.ext.similarity import (
    kcenter_select,
    semantic_dedup,
)
from smart_energy_consumption_analytics_using_big_data_spark.pipeline.corpus import shuffle_order
from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import load_table


def integrity_filter(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Drop vectors a similarity kernel cannot use: NaN components,
    zero norm, or a dimension different from the corpus's modal dim
    (deterministic: max count, tie -> smaller dim). One scan plus a
    broadcast of the 1-row modal dim."""
    xd = F.transform(vec_col, lambda x: x.cast("double"))
    has_nan = F.size(F.filter(xd, lambda x: F.isnan(x))) > 0
    norm2 = F.aggregate(xd, F.lit(0.0), lambda a, x: a + x * x)
    flagged = emb.withColumn("__dim", F.size(vec_col)).withColumn(
        "__bad", has_nan | (norm2 < F.lit(1e-24))
    )
    modal = (
        flagged.groupBy("__dim")
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy(F.desc("__n"), F.asc("__dim"))
        .limit(1)
        .select(F.col("__dim").alias("__modal_dim"))
    )
    return (
        flagged.crossJoin(F.broadcast(modal))
        .filter((~F.col("__bad")) & (F.col("__dim") == F.col("__modal_dim")))
        .drop("__dim", "__bad", "__modal_dim")
    )


def curate_embeddings(
    spark: SparkSession,
    emb_dir: str,
    out_dir: str,
    dedup_threshold: float = 0.4,
    coreset_k: int = 6,
    shards: int = 8,
    seed: int = 42,
) -> dict:
    """Run the four-stage curation chain and write:

    * ``curated.parquet`` - surviving vectors with (shard, pos)
      training slots;
    * ``coreset.parquet`` - the k-center representatives.

    Returns the per-stage count summary (also written as
    ``summary.json``).
    """
    emb = load_table(spark, emb_dir, "embeddings")
    n_raw = emb.count()

    clean = integrity_filter(emb)
    n_clean = clean.count()

    kept_flags = semantic_dedup(clean, threshold=dedup_threshold)
    kept = clean.join(kept_flags.filter(F.col("kept")).select("vec_id"), "vec_id")
    n_kept = kept.count()

    coreset = kcenter_select(kept, k=coreset_k)

    order = shuffle_order(
        kept.select(F.col("vec_id").alias("doc_id")), seed=seed, shards=shards
    ).select(F.col("doc_id").alias("vec_id"), "shard", "pos")
    curated = kept.join(order, "vec_id")

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    curated.write.mode("overwrite").parquet(str(out / "curated.parquet"))
    coreset.write.mode("overwrite").parquet(str(out / "coreset.parquet"))
    summary = {
        "n_raw": n_raw,
        "n_after_integrity": n_clean,
        "n_after_semantic_dedup": n_kept,
        "coreset_k": coreset_k,
        "shards": shards,
        "seed": seed,
    }
    (out / "summary.json").write_text(json.dumps(summary))
    return summary
