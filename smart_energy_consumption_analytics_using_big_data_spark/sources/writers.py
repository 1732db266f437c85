"""Sinks.

Covers the reference's sink surface (SURVEY.md SS2.1 S6-S10): Parquet
overwrite with snappy, optional repartition/coalesce for output-file
sizing, and CSV export as an explicit option (the reference used CSV
only as an exception fallback, `forecasting_model.py:552-555`).

Scale note: `target_partitions` mirrors the reference's
``max(20, n // 50_000)`` heuristic (`anomaly_detection.py:159-163`) but
callers should normally leave partitioning to AQE; explicit coalesce is
for file-count control on final outputs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def target_partitions(row_count: int, rows_per_partition: int = 50_000, floor: int = 20) -> int:
    """Output partition heuristic (anomaly_detection.py:159-163)."""
    return max(floor, row_count // rows_per_partition)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str = "snappy",
    num_files: int | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink (S6/S7). `partition_by` adds hive-style partition
    pruning for downstream scans - the scale-path replacement for the
    reference's flat directories."""
    if num_files is not None:
        df = df.coalesce(num_files)
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    num_files: int | None = None,
) -> None:
    """CSV sink (S8), as a first-class option rather than a fallback."""
    if num_files is not None:
        df = df.coalesce(num_files)
    df.write.mode(mode).option("header", header).csv(path)
