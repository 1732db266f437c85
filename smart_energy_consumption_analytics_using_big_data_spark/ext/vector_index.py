"""Persisted IVF vector index: train once, probe many.

`ann_topk_ivf` (ext/similarity.py) trains the coarse quantizer and
builds the inverted lists inside every query — right for the oracled
one-shot query, wrong for production retrieval where the corpus is
indexed once and probed millions of times. This module freezes that
split as an on-disk artifact (the Spark-native analogue of a FAISS
IVF index file):

- ``centroids.parquet`` — (cell, centroid array<double>), always
  broadcast-sized;
- ``lists.parquet`` — the corpus packed as (id, vector) rows written
  ``partitionBy(cell)``: the inverted lists ARE hive partitions, so a
  probe's ``cell IN (...)`` filter becomes PARTITION PRUNING — the
  fine-scoring scan physically reads only ``nprobe`` cells' files, the
  property that makes IVF sublinear at 100 TB (test-pinned via the
  plan's PartitionFilters);
- ``index_meta.json`` — dims/counts/cell count + provenance.

Search parity with the train-inline path is exact by construction
(same centroids -> same assignment -> same probe + scoring argsort;
pinned in tests/test_vector_index.py).
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from smart_energy_consumption_analytics_using_big_data_spark.ext.similarity import (
    ivf_assign,
    ivf_centroids,
)
from smart_energy_consumption_analytics_using_big_data_spark.functions.vectorfns import cosine


def build_ivf_index(
    embeddings: DataFrame,
    index_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> dict:
    """Train the coarse quantizer and write the index artifact.

    One centroid pass + one assignment pass over the corpus; the lists
    write shuffles once on ``cell`` so each inverted list lands as one
    hive partition (files-per-cell ~ 1 at dimension-table scale; a
    100 TB corpus raises it naturally with input splits).
    Returns the meta dict (also persisted as index_meta.json).
    """
    root = Path(index_dir)
    root.mkdir(parents=True, exist_ok=True)
    cents = ivf_centroids(embeddings, vec_col, label_col)
    cents.coalesce(1).write.mode("overwrite").parquet(str(root / "centroids.parquet"))
    assigned = ivf_assign(embeddings, cents, vec_col, id_col).select(id_col, "cell")
    packed = embeddings.select(id_col, vec_col).join(assigned, id_col)
    (
        packed.repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(str(root / "lists.parquet"))
    )
    spark = embeddings.sparkSession
    lists = spark.read.parquet(str(root / "lists.parquet"))
    n_cells = lists.select("cell").distinct().count()
    meta = {
        "n_vectors": lists.count(),
        "n_cells": n_cells,
        "dim": len(embeddings.select(vec_col).first()[0]),
        "vec_col": vec_col,
        "id_col": id_col,
    }
    (root / "index_meta.json").write_text(json.dumps(meta, indent=2))
    return meta


def search_ivf_index(
    spark: SparkSession,
    index_dir: str,
    query: DataFrame,
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """Probe the persisted index: rank cells by centroid cosine
    (broadcast-sized, collected to drive partition pruning), then
    brute-force ONLY the probed cells' partitions.

    The probed cell ids become a LITERAL isin() filter on the lists
    scan — visible as PartitionFilters in the physical plan, so the
    fine scoring reads nprobe/n_cells of the index bytes. Ranking is
    identical to ann_topk_ivf (round(,6) cosine, id tiebreak), so a
    frozen index returns exactly what the train-inline path returns on
    the same corpus snapshot.
    """
    root = Path(index_dir)
    meta = json.loads((root / "index_meta.json").read_text())
    vec_col, id_col = meta["vec_col"], meta["id_col"]
    cents = spark.read.parquet(str(root / "centroids.parquet"))
    qv = query.select(F.col(vec_col).alias("__qvec"))
    probed = [
        r["cell"]
        for r in cents.crossJoin(F.broadcast(qv))
        .withColumn("qcos", F.round(cosine(F.col("centroid"), F.col("__qvec")), 6))
        .orderBy(F.desc("qcos"), F.asc("cell"))
        .limit(nprobe)
        .select("cell")
        .collect()
    ]
    lists = spark.read.parquet(str(root / "lists.parquet")).filter(
        F.col("cell").isin(probed)
    )
    scored = lists.crossJoin(F.broadcast(qv)).withColumn(
        "cosine", F.round(cosine(F.col(vec_col), F.col("__qvec")), 6)
    )
    return (
        scored.select(id_col, "cell", "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
