"""Stream-stream join (SURVEY.md SS2.9 extension).

The one stateful streaming shape the rollup/dedup/enrich family does
not cover: joining two live streams against each other. Spark keeps
both sides in state stores and matches across micro-batches; the
watermarks plus the time-bound join condition let it evict state
instead of buffering the streams forever - the only way a
stream-stream join survives a 100 TB/day feed.

Replayed with availableNow in append mode, the inner join emits
exactly the batch interval-join result, so it carries a full SQL
oracle (plans/streamq.q_stream_join).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from smart_energy_consumption_analytics_using_big_data_spark.streaming.rollup import (
    _run_to_memory,
    _streaming_events,
)


def stream_stream_join(
    spark: SparkSession,
    events_path: str,
    left_type: str = "view",
    right_type: str = "purchase",
    within: str = "6 hours",
    watermark: str = "1 day",
    how: str = "inner",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Pair each `left_type` event with the same user's `right_type`
    events arriving within `within` after it.

    Both sides are branches of one source, each watermarked; the join
    condition bounds right_ts to [left_ts, left_ts + within], which is
    what lets the engine drop a buffered left row as soon as the right
    watermark passes left_ts + within (bounded state). Equi-key
    `user_id` keeps it a hash join on the stream partitioning.

    ``how="leftOuter"`` adds the watermark-gated NULL emissions: an
    unmatched left row may only emit once the GLOBAL watermark (min
    over both inputs) passes ``l_ts + within`` — before that a future
    right-side match is still admissible, so the row sits in state.
    Replayed with availableNow this is deterministic (the engine runs
    the no-data batch that advances the final watermark and flushes
    evictable state), so even the outer variant carries a SQL oracle.
    """
    src = _streaming_events(spark, events_path, max_files_per_trigger)
    left = (
        src.where(F.col("event_type") == left_type)
        .select(
            F.col("user_id").alias("l_user"),
            F.col("event_id").alias("left_id"),
            F.col("ts").alias("l_ts"),
        )
        .withWatermark("l_ts", watermark)
    )
    right = (
        _streaming_events(spark, events_path, max_files_per_trigger)
        .where(F.col("event_type") == right_type)
        .select(
            F.col("user_id").alias("r_user"),
            F.col("event_id").alias("right_id"),
            F.col("ts").alias("r_ts"),
        )
        .withWatermark("r_ts", watermark)
    )
    cond = (
        (left["l_user"] == right["r_user"])
        & (right["r_ts"] >= left["l_ts"])
        & (right["r_ts"] <= left["l_ts"] + F.expr(f"INTERVAL {within}"))
    )
    pairs = left.join(right, cond, how).select(
        F.col("l_user").alias("user_id"),
        F.col("left_id").alias(f"{left_type}_id"),
        F.col("right_id").alias(f"{right_type}_id"),
        (F.unix_micros("r_ts") - F.unix_micros("l_ts")).alias("delay_us"),
    )
    name = f"stream_join_{uuid.uuid4().hex[:8]}"
    query = _run_to_memory(spark, pairs, name, "append")
    query.awaitTermination()
    return spark.table(name)
