"""Persisted IVF vector index: train once, probe many.

`ann_topk_ivf` (ext/similarity.py) trains the coarse quantizer and
builds the inverted lists inside every query — right for the oracled
one-shot query, wrong for production retrieval where the corpus is
indexed once and probed millions of times. This module freezes that
split as an on-disk artifact (the Spark-native analogue of a FAISS
IVF index file):

- ``centroids.parquet`` — (cell, centroid array<double>), always
  broadcast-sized;
- ``lists.parquet`` — the corpus packed as (id, vector, cell) rows
  written ``partitionBy(cell_part)``: the inverted lists ARE hive
  partitions, so a probe's ``cell_part IN (...)`` filter becomes
  PARTITION PRUNING — the fine-scoring scan physically reads only
  ``nprobe`` cells' files, the property that makes IVF sublinear at
  100 TB (test-pinned via the plan's PartitionFilters contents). The
  partition column is a ``c_``-prefixed STRING derived from the cell:
  hive partition-value type inference would otherwise silently retype
  numeric-looking labels on read ("01" -> 1) and break the isin probe;
  the true ``cell`` rides along as a normal data column with its exact
  original dtype, so search output is schema-identical to
  ``ann_topk_ivf``;
- ``index_meta.json`` — written THROUGH the Hadoop filesystem of the
  index path (not driver-local pathlib), so ``s3://``/``hdfs://``
  index dirs work and any driver can open the index.

Probe ranking and fine scoring are the SAME code as the train-inline
path (`ivf_probe_cells` / `ivf_score_topk` in ext/similarity.py), so
parity cannot drift; pinned in tests/test_vector_index.py.

``append_ivf_index`` adds new vectors without retraining: assign to
the frozen centroids, ``mode("append")`` into the hive partitions —
the index-once / append-deltas / probe-many production lifecycle.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

from smart_energy_consumption_analytics_using_big_data_spark.ext.similarity import (
    ivf_assign,
    ivf_centroids,
    ivf_probe_cells,
    ivf_score_topk,
)


def _fs_write_text(spark: SparkSession, path: str, text: str) -> None:
    """Write a small text file through the path's Hadoop filesystem
    (works for file://, hdfs://, s3a:// alike — unlike driver pathlib)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _fs_read_text(spark: SparkSession, path: str) -> str:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(p)
    try:
        # decode JVM-side (commons-io ships with Spark): py4j passes
        # arrays BY COPY, so a readFully into a Python bytearray would
        # fill the JVM copy and leave the local buffer zeroed
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def _cell_part(cell):
    # inference-proof partition value: always a non-numeric string
    return F.concat(F.lit("c_"), cell.cast("string"))


def _assert_uniform_dim(embeddings: DataFrame, vec_col: str, want: int | None, who: str) -> int:
    """One cheap agg pass: every vector in the batch must share one
    dimension (and match `want` if given). A mixed-dimension batch
    would otherwise be written permanently: zip_with pads unequal
    arrays with NULLs, so the corrupt rows get NULL cosines and
    silently never rank — no error would ever surface."""
    row = embeddings.agg(
        F.min(F.size(vec_col)).alias("lo"), F.max(F.size(vec_col)).alias("hi")
    ).first()
    if row["lo"] is None:
        raise ValueError(f"{who}: batch is empty")
    if row["lo"] != row["hi"]:
        raise ValueError(
            f"{who}: mixed vector dimensions in batch ({row['lo']}..{row['hi']})"
        )
    if want is not None and row["lo"] != want:
        raise ValueError(f"{who}: batch dim {row['lo']} != index dim {want}")
    return int(row["lo"])


def _pack_lists(
    embeddings: DataFrame,
    cents: DataFrame,
    index_dir: str,
    vec_col: str,
    id_col: str,
    mode: str,
) -> None:
    """Assign to centroids and write the cell-partitioned lists — the
    ONE packing definition shared by build (overwrite) and append
    (append), so the artifact layout cannot drift between them."""
    assigned = ivf_assign(embeddings, cents, vec_col, id_col).select(id_col, "cell")
    packed = (
        embeddings.select(id_col, vec_col)
        .join(assigned, id_col)
        .withColumn("cell_part", _cell_part(F.col("cell")))
    )
    (
        packed.repartition("cell_part")
        .write.mode(mode)
        .partitionBy("cell_part")
        .parquet(f"{index_dir}/lists.parquet")
    )


def _refresh_meta(
    spark: SparkSession, index_dir: str, vec_col: str, id_col: str
) -> dict:
    """Recompute and persist index_meta.json from the written artifact.

    One groupBy over the lists' PARTITION column only (count(*) per
    hive partition is served from parquet footers, not vector bytes)
    plus the broadcast-sized centroids — shared by build and append so
    the meta can never drift from the artifact."""
    lists = spark.read.parquet(f"{index_dir}/lists.parquet")
    cents = spark.read.parquet(f"{index_dir}/centroids.parquet")
    per_cell = lists.groupBy("cell_part").agg(F.count(F.lit(1)).alias("n")).collect()
    cent_rows = cents.select("cell", F.size("centroid").alias("dim")).collect()
    meta = {
        "n_vectors": int(sum(r["n"] for r in per_cell)),
        "n_cells": len(cent_rows),
        "n_nonempty_cells": len(per_cell),
        "dim": int(cent_rows[0]["dim"]),
        "vec_col": vec_col,
        "id_col": id_col,
    }
    _fs_write_text(spark, f"{index_dir}/index_meta.json", json.dumps(meta, indent=2))
    return meta


def build_ivf_index(
    embeddings: DataFrame,
    index_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> dict:
    """Train the coarse quantizer and write the index artifact.

    The centroids are computed once, WRITTEN, then read back for the
    assignment pass (re-using the materialized result instead of
    re-running the corpus-wide aggregation inside the lists job); the
    lists write shuffles once on the cell. All post-write stats come
    from one groupBy pass over the written lists plus the
    broadcast-sized centroids — no extra corpus scans. Returns the
    meta dict (also persisted as index_meta.json).
    """
    if embeddings.isEmpty():
        raise ValueError("build_ivf_index: embeddings corpus is empty")
    _assert_uniform_dim(embeddings, vec_col, None, "build_ivf_index")
    spark = embeddings.sparkSession
    cents = ivf_centroids(embeddings, vec_col, label_col)
    cents.coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/centroids.parquet")
    cents = spark.read.parquet(f"{index_dir}/centroids.parquet")
    _pack_lists(embeddings, cents, index_dir, vec_col, id_col, "overwrite")
    return _refresh_meta(spark, index_dir, vec_col, id_col)


def append_ivf_index(embeddings: DataFrame, index_dir: str) -> dict:
    """Incrementally add vectors to a persisted index WITHOUT
    retraining: assign the new batch to the FROZEN centroids and
    append its rows to the hive-partitioned lists.

    This is the production retrieval shape (index once, append the
    daily delta, probe many): the coarse quantizer is an artifact of
    the original training corpus and must stay frozen so existing
    list assignments — and therefore existing probe results — never
    move. The write is ``mode("append") + partitionBy``: new rows land
    as extra files INSIDE their cell's hive partition (creating the
    partition directory if that cell was empty), so the probe-side
    partition pruning is untouched. Cost is one scan over the DELTA
    (broadcast centroids, k cosines per row) plus a footer-only stats
    pass — never a rewrite of the existing lists.

    The appended artifact is byte-equivalent (as a rowset) to packing
    the full corpus with these same centroids in one shot — pinned in
    tests/test_vector_index.py. Caller contract: the batch's ids are
    new (an id-collision check would be a full-index scan; dedup
    upstream if ids can repeat).
    """
    if embeddings.isEmpty():
        raise ValueError("append_ivf_index: appended batch is empty")
    spark = embeddings.sparkSession
    meta = json.loads(_fs_read_text(spark, f"{index_dir}/index_meta.json"))
    vec_col, id_col = meta["vec_col"], meta["id_col"]
    _assert_uniform_dim(embeddings, vec_col, meta["dim"], "append_ivf_index")
    cents = spark.read.parquet(f"{index_dir}/centroids.parquet")
    _pack_lists(embeddings, cents, index_dir, vec_col, id_col, "append")
    return _refresh_meta(spark, index_dir, vec_col, id_col)


def compact_ivf_index(
    spark: SparkSession, index_dir: str, target_rows_per_file: int = 1_000_000
) -> dict:
    """Rewrite the inverted lists so each cell holds few, full-sized
    files — the lifecycle step that keeps probe latency flat after many
    appends (each ``mode("append")`` lands AT LEAST one new file per
    touched cell, so a daily-append index degrades into the classic
    small-files problem: a probe's partition pruning still skips other
    cells, but within a probed cell every tiny file costs an open).

    One shuffle sized by ``ceil(rows / target_rows_per_file)`` output
    files per cell (repartition on cell_part + a within-cell bucket
    id). The rewrite goes to a staging directory first, so a crash
    during the (long) rewrite leaves the live lists untouched; the
    swap itself is delete-live + rename-staged through the path's
    Hadoop filesystem — a crash INSIDE that short window loses only
    the live copy while the fully-written staged directory remains on
    disk for manual rename recovery (rename is metadata-only on
    file://-/hdfs://, a copy on s3a). Returns the refreshed meta plus
    files_before/files_after. Row set, meta, and the probe's
    PartitionFilters pruning are invariant (tests/test_vector_index.py).
    """
    meta0 = json.loads(_fs_read_text(spark, f"{index_dir}/index_meta.json"))
    id_col = meta0["id_col"]
    lists_path = f"{index_dir}/lists.parquet"
    staged_path = f"{index_dir}/lists.parquet.compacting"
    lists = spark.read.parquet(lists_path)
    per_cell = {
        r["cell_part"]: r["n"]
        for r in lists.groupBy("cell_part")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    files_before = lists.select(F.input_file_name()).distinct().count()
    # within-cell bucket count = ceil(rows / target): one file per cell
    # for normal cells, several writer tasks (no straggler) for a cell
    # bigger than the target. Broadcast-joined, never collected per row.
    n_buckets = {
        part: max(1, -(-n // target_rows_per_file)) for part, n in per_cell.items()
    }
    buckets = spark.createDataFrame(
        list(n_buckets.items()), "cell_part string, __k int"
    )
    # EXPLICIT partition count: a bare repartition(cols) lets AQE
    # coalesce the tiny (cell, bucket) shuffle partitions back together
    # by byte size, silently undoing the bucket split the row-count
    # target asked for — the explicit count pins the exchange so the
    # file-count contract is deterministic
    (
        lists.join(F.broadcast(buckets), "cell_part")
        .withColumn("__bucket", F.pmod(F.xxhash64(F.col(id_col)), F.col("__k")))
        .repartition(max(1, sum(n_buckets.values())), "cell_part", "__bucket")
        .drop("__bucket", "__k")
        .write.mode("overwrite")
        .partitionBy("cell_part")
        .parquet(staged_path)
    )
    # atomic-enough swap through the Hadoop FS (works for file://,
    # hdfs://; on s3a rename is a copy, still crash-safe: the live
    # path is replaced only after the staged write fully succeeded)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    live = jvm.org.apache.hadoop.fs.Path(lists_path)
    staged = jvm.org.apache.hadoop.fs.Path(staged_path)
    fs = live.getFileSystem(conf)
    fs.delete(live, True)
    if not fs.rename(staged, live):
        raise IOError(f"compact_ivf_index: rename {staged_path} -> {lists_path} failed")
    compacted = spark.read.parquet(lists_path)
    files_after = compacted.select(F.input_file_name()).distinct().count()
    meta = _refresh_meta(spark, index_dir, meta0["vec_col"], id_col)
    return {**meta, "files_before": files_before, "files_after": files_after}


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

    The probed cells become a LITERAL isin() filter on the lists
    scan's string partition column — visible as PartitionFilters in
    the physical plan, so the fine scoring reads nprobe/n_cells of the
    index bytes. Ranking is the shared ivf_probe_cells/ivf_score_topk
    code, so a frozen index returns exactly what the train-inline path
    returns on the same corpus snapshot (``nprobe >= meta["n_cells"]``
    degenerates to exact search — the CENTROID count, which can exceed
    the non-empty list count).
    """
    meta = json.loads(_fs_read_text(spark, f"{index_dir}/index_meta.json"))
    vec_col, id_col = meta["vec_col"], meta["id_col"]
    cents = spark.read.parquet(f"{index_dir}/centroids.parquet")
    qv = query.select(F.col(vec_col).alias("__qvec"))
    qrow = qv.select(F.size("__qvec").alias("d")).first()
    if qrow is None:
        raise ValueError("search_ivf_index: query has no rows")
    if qrow["d"] != meta["dim"]:
        raise ValueError(
            f"search_ivf_index: query dim {qrow['d']} != index dim {meta['dim']}"
        )
    # render the probed partition values with the SAME Spark expression
    # the build used (_cell_part): a Python f-string rendering can
    # diverge from Spark's cast('string') for non-int/string cell
    # dtypes (boolean 'True' vs 'true', decimal trailing zeros) and a
    # diverged isin() silently prunes ALL partitions (ADVICE r12)
    probed = [
        r["__part"]
        for r in ivf_probe_cells(cents, qv, nprobe)
        .select(_cell_part(F.col("cell")).alias("__part"))
        .collect()
    ]
    lists = spark.read.parquet(f"{index_dir}/lists.parquet").filter(
        F.col("cell_part").isin(probed)
    )
    return ivf_score_topk(lists.drop("cell_part"), qv, k, vec_col, id_col)
