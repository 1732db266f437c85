"""Streaming exactly-once dedup via dropDuplicatesWithinWatermark.

The ingest-side half of the dedup story (SURVEY.md SS2.9 extension +
the training-data-pipeline north star): at-least-once sources (Kafka
replays, file re-deliveries) are deduped on a business key inside the
watermark horizon, so state stays bounded - keys older than the
watermark are evicted instead of accumulating forever, which is what
makes this viable on an unbounded 100 TB/day stream (a plain
``dropDuplicates`` on a stream grows state without bound).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from smart_energy_consumption_analytics_using_big_data_spark.streaming.rollup import (
    _run_to_memory,
    _streaming_events,
)


def stream_dedup_within_watermark(
    spark: SparkSession,
    events_path: str,
    keys: tuple[str, ...] = ("event_id",),
    watermark: str = "3650 days",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Replay events as a stream, dropping duplicate keys that arrive
    within the watermark horizon; returns the deduped rows.

    Append mode: deduped rows flow through immediately (no windows to
    close); only the key-set lives in the state store.

    Cross-batch semantics (pinned empirically, asserted by
    tests/test_streaming_differential.py): a key's state expires at its
    FIRST occurrence's event time + delay — later duplicates do NOT
    extend it; eviction runs at the end of batch N with the in-effect
    watermark (max event time over batches < N, minus delay); a key
    re-appearing after eviction is emitted AGAIN (at-least-once beyond
    the horizon — dedup is exact only within it); input rows with
    ts <= the PREVIOUS batch's watermark are dropped outright (the
    lagged dual-watermark late filter; NON-strict at the boundary —
    a row at exactly the lagged watermark drops, pinned by the r14
    tie probe after the original strict reading turned out to be an
    artifact of tie-free test seeds).
    """
    events = _streaming_events(
        spark, events_path, max_files_per_trigger
    ).withWatermark("ts", watermark)
    deduped = events.dropDuplicatesWithinWatermark(list(keys))
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    query = _run_to_memory(spark, deduped, name, "append")
    query.awaitTermination()
    return spark.table(name)
