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
``delete_from_ivf_index`` retires vectors logically (tombstone table,
anti-joined away by every probe); ``compact_ivf_index`` reclaims them
physically while fixing small-files decay, behind a verified staged
rewrite and a rename-aside swap that ``recover_ivf_index`` can heal
from any crash point. Maintenance is SINGLE-WRITER (see
compact_ivf_index's docstring for the probe-racing contract).
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from smart_energy_consumption_analytics_using_big_data_spark.ext.similarity import (
    ivf_assign,
    ivf_centroids,
    ivf_probe_cells,
    ivf_score_topk,
)


def _fs(spark: SparkSession, path: str):
    """(FileSystem, Path-factory) for a path's Hadoop filesystem."""
    jvm = spark._jvm
    mk = jvm.org.apache.hadoop.fs.Path
    return mk(path).getFileSystem(spark._jsc.hadoopConfiguration()), mk


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
    tomb = _read_tombstones(spark, index_dir, id_col)
    meta = {
        "n_vectors": int(sum(r["n"] for r in per_cell)),
        "n_cells": len(cent_rows),
        "n_nonempty_cells": len(per_cell),
        "dim": int(cent_rows[0]["dim"]),
        "vec_col": vec_col,
        "id_col": id_col,
        # PHYSICAL rows above; tombstoned ids stay in the lists (and in
        # n_vectors) until compaction reclaims them — the tiny tombstone
        # table is the only extra read this count costs
        "n_tombstones": int(tomb.count()) if tomb is not None else 0,
    }
    _fs_write_text(spark, f"{index_dir}/index_meta.json", json.dumps(meta, indent=2))
    return meta


def _read_tombstones(
    spark: SparkSession, index_dir: str, id_col: str
) -> DataFrame | None:
    """The DISTINCT tombstoned ids, or None when nothing was ever
    deleted. Tombstones accumulate as appended parquet (each delete is
    one tiny file); distinct here makes repeat-deletes idempotent."""
    path = f"{index_dir}/tombstones.parquet"
    fs, mk = _fs(spark, path)
    if not fs.exists(mk(path)):
        return None
    return spark.read.parquet(path).select(id_col).distinct()


def delete_from_ivf_index(spark: SparkSession, index_dir: str, ids) -> dict:
    """LOGICAL vector removal (retired documents): record the ids in a
    tombstone table that every probe anti-joins away; the rows are
    physically reclaimed by the next ``compact_ivf_index`` (which also
    clears the tombstones). O(batch) — no list rewrite, no index scan:
    the delete is one tiny parquet append, exactly like the append
    path never rewrites existing lists.

    ``ids`` is an iterable of id values or a single-column DataFrame
    (named anything; it is cast to the index's id column). Deleting an
    id absent from the lists is a harmless no-op (same contract as
    re-deleting an id — distinct at read makes it idempotent), so a
    delete can also back out a FAILED append batch: tombstone the
    batch's ids, compact, re-append — the recovery path that makes the
    non-atomic append safe to retry. Returns the refreshed meta
    (``n_tombstones`` counts distinct tombstoned ids).

    Heals a crashed compaction first when one is pending (marker on
    disk) — code-review r15: a tombstone appended AFTER a post-swap
    crash but BEFORE the next recovery would otherwise be wiped by
    recovery's clear-applied-tombstones step, silently resurrecting
    the deleted vector."""
    _heal_if_swap_pending(spark, index_dir)
    meta = json.loads(_fs_read_text(spark, f"{index_dir}/index_meta.json"))
    id_col = meta["id_col"]
    if isinstance(ids, DataFrame):
        cols = ids.columns
        if len(cols) != 1:
            raise ValueError(
                f"delete_from_ivf_index: ids DataFrame must have exactly "
                f"one column, got {cols}"
            )
        tomb = ids.select(F.col(cols[0]).alias(id_col))
    else:
        vals = list(ids)
        if not vals:
            raise ValueError("delete_from_ivf_index: no ids given")
        tomb = spark.createDataFrame([(v,) for v in vals], [id_col])
    # match the lists' id dtype so the anti-join never compares across
    # types (a long-vs-int mismatch would silently delete nothing)
    lists_id_type = dict(
        spark.read.parquet(f"{index_dir}/lists.parquet").dtypes
    )[id_col]
    tomb = tomb.select(F.col(id_col).cast(lists_id_type))
    if tomb.filter(F.col(id_col).isNull()).limit(1).count():
        raise ValueError("delete_from_ivf_index: NULL id in delete batch")
    tomb.coalesce(1).write.mode("append").parquet(f"{index_dir}/tombstones.parquet")
    return _refresh_meta(spark, index_dir, meta["vec_col"], id_col)


def _heal_if_swap_pending(spark: SparkSession, index_dir: str) -> None:
    """Run recover_ivf_index iff a swap marker is on disk — the cheap
    (one fs.exists) guard every maintenance writer calls before
    touching tombstones or lists, so crash healing is not deferred to
    the next compact (single-writer contract: these never race a live
    compaction, only its remains)."""
    fs, mk = _fs(spark, index_dir)
    if fs.exists(mk(f"{index_dir}/swap_pending.json")):
        recover_ivf_index(spark, index_dir)


def _live_rows_or_none(spark: SparkSession, lists_path: str) -> int | None:
    """Row count of the live lists, or None when the directory is
    unreadable (a torn object-store copy can leave truncated parquet
    files a count() cannot scan)."""
    try:
        return int(spark.read.parquet(lists_path).count())
    except Exception:
        return None


def recover_ivf_index(spark: SparkSession, index_dir: str) -> dict:
    """Heal the on-disk states an interrupted compaction can leave
    (also runs automatically at the start of every compact).

    The swap protocol writes ``swap_pending.json`` (carrying the
    verified staged row count) BEFORE the first rename and deletes it
    as the swap's last step, so recovery can tell which side of the
    swap a crash landed on — required on object stores (s3a), where a
    Hadoop "rename" is copy+delete and a crash mid staged->live copy
    leaves a PARTIAL live directory alongside the complete .old and
    .compacting copies. "Live exists" is therefore NOT trusted as
    "live is complete" while a swap is pending; the live copy must
    row-count-match the marker (the same verification strength the
    pre-swap staged check uses).

    No marker (no swap in flight, or a pre-marker build/append state):

    - live MISSING + staged present  -> promote the staged copy;
    - live MISSING + only ``.old``   -> restore the old copy;
    - live present + leftovers       -> drop the leftovers (a ``.old``
      is a crash after promotion — or, on s3a, a partial copy from a
      crash mid live->.old while live is still complete; a
      ``.compacting`` is a partial rewrite that never reached the
      marker, let alone the swap).

    Marker present (crash inside the swap window):

    - live readable and row count == marker -> live is a COMPLETE
      copy of the expected rowset: drop leftovers AND clear the
      tombstone table — the tombstoned rows are absent from this copy
      (either it is the compacted copy, or it is the pre-swap copy in
      the zero-rows-removed case where the two rowsets coincide), and
      leaving the tombstones would silently hide (then destroy on the
      next compact) rows legitimately re-appended by the documented
      failed-append recovery (tombstone -> compact -> re-append).
      Caveat (benign): when the compaction removed no rows, this state
      cannot distinguish a pre-first-rename crash from a post-swap
      one, so it may keep the pre-swap FILE LAYOUT and discard the
      staged rewrite — the rowset is identical either way; re-run
      compact to redo the small-files fix;
    - live unreadable/mismatched + staged present -> the crash tore
      the staged->live copy (or never started it): replace live with
      the verified staged copy, then clear tombstones as above;
    - live mismatched + NO staged -> live is the complete OLD copy
      (the only state that produces this: crash mid live->.old copy —
      a torn live implies an intact staged, because rename deletes its
      source only after the copy completes): keep live, drop the
      partial ``.old``, KEEP the tombstones (they were never applied);
    - live MISSING -> promote staged (clear tombstones) or restore
      ``.old`` (keep tombstones).

    Returns {"actions": [...]} naming what it did (empty = clean)."""
    lists_path = f"{index_dir}/lists.parquet"
    fs, mk = _fs(spark, lists_path)
    live, old, staged = (
        mk(lists_path), mk(f"{lists_path}.old"), mk(f"{lists_path}.compacting")
    )
    marker = mk(f"{index_dir}/swap_pending.json")
    actions: list[str] = []

    def clear_tombstones() -> None:
        tomb = mk(f"{index_dir}/tombstones.parquet")
        if fs.exists(tomb):
            fs.delete(tomb, True)
            actions.append("cleared_applied_tombstones")

    swap_pending = fs.exists(marker)
    if swap_pending:
        try:
            expected = int(
                json.loads(_fs_read_text(spark, f"{index_dir}/swap_pending.json"))[
                    "expected_rows"
                ]
            )
        except Exception:
            # a torn/empty marker means the crash hit between the
            # marker's create and its write — strictly BEFORE the
            # first rename, so the live copy is the intact pre-swap
            # index: drop the unreadable marker and heal as no-swap
            # (code-review r15: an unhandled parse error here would
            # permanently wedge every future compact on exactly the
            # crash artifact recovery exists to clean up)
            fs.delete(marker, False)
            actions.append("dropped_corrupt_marker")
            swap_pending = False
    if swap_pending:
        live_ok = (
            fs.exists(live)
            and _live_rows_or_none(spark, lists_path) == expected
        )
        if live_ok:
            actions.append("confirmed_live")
            clear_tombstones()
        elif fs.exists(staged):
            if fs.exists(live):
                fs.delete(live, True)
                actions.append("dropped_partial_live")
            if not fs.rename(staged, live):
                raise IOError(
                    f"recover_ivf_index: could not promote {staged} — "
                    f"manual recovery required"
                )
            actions.append("promoted_staged")
            clear_tombstones()
        elif fs.exists(live):
            # mismatched live, no staged: the complete pre-swap copy
            # (see docstring) — keep it and the unapplied tombstones
            actions.append("kept_preswap_live")
        elif fs.exists(old):
            if not fs.rename(old, live):
                raise IOError(
                    f"recover_ivf_index: could not restore {old} — "
                    f"manual recovery required"
                )
            actions.append("restored_old")
        else:
            raise IOError(
                f"recover_ivf_index: swap pending but no live, staged or "
                f"old lists under {index_dir} — the index is gone, rebuild it"
            )
    elif not fs.exists(live):
        if fs.exists(staged) and fs.rename(staged, live):
            actions.append("promoted_staged")
        elif fs.exists(old):
            # either no staged copy, or promoting it failed (corrupt /
            # locked / s3a copy failure): the .old copy is complete —
            # restore it rather than leaving the index unreadable
            if not fs.rename(old, live):
                raise IOError(
                    f"recover_ivf_index: could not promote staged OR "
                    f"restore {old} — manual recovery required"
                )
            actions.append("restored_old")
        elif fs.exists(staged):
            raise IOError(
                f"recover_ivf_index: promote {staged} failed and no "
                f".old copy exists — manual recovery required"
            )
        else:
            raise IOError(
                f"recover_ivf_index: no live, staged or old lists under "
                f"{index_dir} — the index is gone, rebuild it"
            )
    if fs.exists(old):
        fs.delete(old, True)
        actions.append("dropped_old")
    if fs.exists(staged) and fs.exists(live):
        fs.delete(staged, True)
        actions.append("dropped_staged")
    if swap_pending:
        fs.delete(marker, False)
        actions.append("cleared_swap_marker")
    return {"actions": actions}


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
    # a REBUILD into an existing index dir starts a new life: stale
    # tombstones (and interrupted-compaction leftovers) from the old
    # index must not hide — and on next compact, destroy — the new
    # vectors, which can share ids with deleted old ones
    fs, mk = _fs(spark, index_dir)
    for leftover in (
        "tombstones.parquet",
        "lists.parquet.old",
        "lists.parquet.compacting",
        "swap_pending.json",
    ):
        fs.delete(mk(f"{index_dir}/{leftover}"), True)
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

    NOT crash-atomic (ADVICE r13): ``mode("append")`` has no staging,
    so a mid-write failure leaves a partial batch in the lists (with
    index_meta.json then stale), and blindly retrying the same batch
    would duplicate the rows that did land. Recovery WITHOUT a rebuild:
    tombstone the batch's ids (``delete_from_ivf_index`` — absent ids
    are harmless no-ops), ``compact_ivf_index`` to reclaim, then
    re-append the batch. Same single-writer contract as compaction.
    """
    if embeddings.isEmpty():
        raise ValueError("append_ivf_index: appended batch is empty")
    spark = embeddings.sparkSession
    _heal_if_swap_pending(spark, index_dir)
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

    Compaction is also the PHYSICAL reclaim step for deletes: rows
    whose id is tombstoned (delete_from_ivf_index) are filtered out of
    the rewrite, and the tombstone table is cleared once the swap
    lands — after which the lists are byte-equivalent (as a rowset) to
    packing the surviving corpus with the same frozen centroids.

    One shuffle sized by ``ceil(rows / target_rows_per_file)`` output
    files per cell (repartition on cell_part + a within-cell bucket
    id). Crash safety: the rewrite goes to a staging directory and its
    row count is VERIFIED against the filtered source before anything
    touches the live lists; a ``swap_pending.json`` marker carrying
    that count is written, then the swap runs rename-live-aside ->
    rename-staged-in -> drop-old -> drop-tombstones -> drop-marker
    (each rename metadata-atomic on file:///hdfs://, a copy on s3a).
    Every crash point leaves a complete copy on disk and
    ``recover_ivf_index`` (run automatically at the start of every
    compact) heals it without data loss — the marker is what lets
    recovery verify the live copy's completeness on object stores
    (where a torn copy can masquerade as a live directory) and decide
    whether the tombstones were applied by this swap or not.

    SINGLE-WRITER CONTRACT: one maintenance writer at a time (appends,
    deletes and compactions serialize with each other). Probes racing
    the swap are retried transparently: in the two-rename window the
    live path briefly does not exist, and ``search_ivf_index`` retries
    its listing with bounded backoff (test-pinned by
    test_ivf_search_retries_through_swap_window) — the race never
    surfaces as silently mixed or partial results, because each probe
    resolves one directory listing. The narrower residue — a caller
    holding a search plan across the swap and acting on it after —
    still surfaces as a read error to re-plan; pin a probe fleet to a
    snapshot copy if even that is unacceptable.

    Returns the refreshed meta plus files_before/files_after. Row set
    (minus tombstoned rows), meta, and the probe's PartitionFilters
    pruning are invariant (tests/test_vector_index.py).
    """
    recover_ivf_index(spark, index_dir)
    meta0 = json.loads(_fs_read_text(spark, f"{index_dir}/index_meta.json"))
    id_col = meta0["id_col"]
    lists_path = f"{index_dir}/lists.parquet"
    staged_path = f"{index_dir}/lists.parquet.compacting"
    old_path = f"{index_dir}/lists.parquet.old"
    lists = spark.read.parquet(lists_path)
    files_before = lists.select(F.input_file_name()).distinct().count()
    tomb = _read_tombstones(spark, index_dir, id_col)
    if tomb is not None:
        lists = lists.join(F.broadcast(tomb), id_col, "left_anti")
    per_cell = {
        r["cell_part"]: r["n"]
        for r in lists.groupBy("cell_part")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # within-cell bucket count = ceil(rows / target): one file per cell
    # for normal cells, several writer tasks (no straggler) for a cell
    # bigger than the target. Broadcast-joined, never collected per row.
    expected_rows = int(sum(per_cell.values()))
    if expected_rows == 0:
        raise ValueError(
            "compact_ivf_index: every row is tombstoned — compaction "
            "would write an empty index; rebuild instead"
        )
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
    # VERIFY before touching the live lists: a short staged write (lost
    # executor, partial job cleanup bug) must fail here, with the live
    # index untouched and the staged leftovers dropped
    fs, mk = _fs(spark, lists_path)
    staged_rows = spark.read.parquet(staged_path).count()
    if staged_rows != expected_rows:
        fs.delete(mk(staged_path), True)
        raise IOError(
            f"compact_ivf_index: staged rewrite has {staged_rows} rows, "
            f"expected {expected_rows} — live lists left untouched"
        )
    # rename-aside swap (ADVICE r13): live -> .old, staged -> live,
    # drop .old. Every crash point leaves a complete copy on disk
    # (recover_ivf_index heals all three states); the old delete-live-
    # then-rename order had a window with NO live copy at all. The
    # swap_pending marker (ADVICE r14) brackets the window: it carries
    # the verified staged row count so recovery can detect a torn
    # object-store copy (where "rename" is copy+delete and a partial
    # live directory can coexist with complete .old/.compacting
    # copies) and can tell applied from unapplied tombstones.
    live, old, staged = mk(lists_path), mk(old_path), mk(staged_path)
    marker = mk(f"{index_dir}/swap_pending.json")
    _fs_write_text(
        spark, f"{index_dir}/swap_pending.json",
        json.dumps({"expected_rows": int(expected_rows)}),
    )
    # on either rename failure the marker is deliberately LEFT IN
    # PLACE (code-review r15): a failed rename on an object store can
    # itself leave a torn directory, and deleting the marker would
    # hand recovery the trusted no-swap-in-flight path over exactly
    # the states the marker exists to disambiguate. recover_ivf_index
    # heals a marker-present state from any of these crash points.
    if not fs.rename(live, old):
        raise IOError(
            f"compact_ivf_index: rename {lists_path} -> {old_path} failed "
            f"(swap marker left for recover_ivf_index)"
        )
    if not fs.rename(staged, live):
        # best-effort rollback so the index stays probe-able; marker
        # stays either way, so recovery re-verifies whatever this left
        fs.rename(old, live)
        raise IOError(
            f"compact_ivf_index: rename {staged_path} -> {lists_path} failed "
            f"(swap marker left for recover_ivf_index)"
        )
    fs.delete(old, True)
    # tombstoned rows are physically gone now — clear the tombstones
    # (AFTER the swap; a crash between the swap and here is healed by
    # recover_ivf_index, which sees the pending marker, confirms the
    # live copy and clears the tombstones itself — leaving them would
    # hide, then destroy, rows re-appended by failed-append recovery)
    fs.delete(mk(f"{index_dir}/tombstones.parquet"), True)
    fs.delete(marker, False)
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
    lists_path = f"{index_dir}/lists.parquet"
    # crashed-compaction guard (code-review r15): a swap marker on
    # disk means a compact crashed mid-swap; on an object store the
    # live dir can then be a partial-but-READABLE copy, which without
    # this check would silently rank over a fraction of the corpus.
    # Probes are read-only (single-writer contract), so verify rather
    # than heal: count == marker -> complete expected rowset, proceed;
    # count > marker -> the complete PRE-swap copy (tombstones still
    # anti-joined below), proceed; count < marker (or unreadable) ->
    # torn copy, refuse and name the fix. An unreadable marker means
    # the crash predates the first rename — live is intact.
    fs_g, mk_g = _fs(spark, index_dir)
    if fs_g.exists(mk_g(f"{index_dir}/swap_pending.json")):
        try:
            expected = int(
                json.loads(_fs_read_text(spark, f"{index_dir}/swap_pending.json"))[
                    "expected_rows"
                ]
            )
        except Exception:
            expected = None
        if expected is not None:
            n_live = _live_rows_or_none(spark, lists_path)
            if n_live is None or n_live < expected:
                raise IOError(
                    f"search_ivf_index: a compaction crashed mid-swap and "
                    f"the live lists are incomplete ({n_live} rows, swap "
                    f"expected {expected}) — run recover_ivf_index({index_dir!r})"
                )
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
    def read_plan() -> DataFrame:
        lists = spark.read.parquet(lists_path).filter(
            F.col("cell_part").isin(probed)
        )
        # logical deletes: tombstoned ids never rank. The anti-join
        # sits ON TOP of the partition-pruned scan (broadcast, no
        # shuffle), so the nprobe-cells-only read is untouched;
        # compaction reclaims the rows and drops this join's input.
        tomb = _read_tombstones(spark, index_dir, id_col)
        if tomb is not None:
            lists = lists.join(F.broadcast(tomb), id_col, "left_anti")
        return lists

    # a probe racing the compaction swap can catch the live path in
    # the two-rename window where it briefly does not exist — a
    # TRANSIENT state by the single-writer contract, so retry the
    # listing (both reads together: the tombstone table is deleted in
    # the same window, and a torn lists+tombstones pairing must not
    # mix swap generations) instead of surfacing the race to callers
    lists = _retry_transient_read(read_plan)
    return ivf_score_topk(lists.drop("cell_part"), qv, k, vec_col, id_col)


def _retry_transient_read(
    fn, attempts: int = 6, base_sleep_s: float = 0.1
):
    """Bounded exponential-backoff retry for reads racing the
    compaction swap's missing-path window (compact_ivf_index's
    single-writer contract). Only path-existence failures retry —
    anything else propagates immediately. ~6 s worst case, sized to
    dwarf the two metadata renames on file:///hdfs:// (an s3a
    copy-based swap window can exceed it; pin probe fleets to a
    snapshot copy there)."""
    last: Exception | None = None
    for i in range(attempts):
        try:
            return fn()
        except Exception as exc:
            msg = str(exc)
            if not any(
                s in msg
                for s in (
                    "PATH_NOT_FOUND",
                    "FileNotFoundException",
                    "does not exist",
                )
            ):
                raise
            last = exc
            time.sleep(base_sleep_s * (2**i))
    assert last is not None
    raise last
