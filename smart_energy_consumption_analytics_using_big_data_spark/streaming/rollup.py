"""Structured Streaming rollups over the events stream (SURVEY.md SS2.9).

The reference is strictly batch ("real-time" is marketing, SURVEY.md
SS2.9); this extension mirrors the A1 rollup semantics as a streaming
aggregation: readStream -> event-time window agg -> sink.

Two shapes:

* `stream_daily_rollup` - complete-mode aggregation replayed with the
  availableNow trigger; deterministic, equals the batch rollup, so it
  IS oracle-checkable against plain SQL.
* `stream_daily_rollup_append` - watermarked append mode, the shape a
  live 100 TB/day ingest would run (state eviction past the watermark,
  late data within it merged); only closed windows emit.
"""

from __future__ import annotations

import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from smart_energy_consumption_analytics_using_big_data_spark.streaming._staging import (
    staged_stream_dir,
)

from smart_energy_consumption_analytics_using_big_data_spark.operators.aggregates import sum_exact
from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import (
    configure_runtime,
    normalize_ts,
)

def _streaming_events(
    spark: SparkSession,
    events_path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over the events table, `ts` normalized to TimestampType.

    readStream needs an explicit schema, and the testdata's physical
    `ts` representation has drifted across generator versions (INT64
    TIMESTAMP(NANOS) admitted as long -> TIMESTAMP_NTZ micros). Probing
    the batch schema of the same files (one footer read at plan build,
    no data scan) and branching on the dtype mirrors the batch
    catalog's guard (sources/catalog.py:load_table) instead of baking
    one representation into the stream schema.

    ``max_files_per_trigger``: bound each micro-batch to that many
    landing files (oldest modification time first). The default (None)
    drains everything in one availableNow batch — right for replay
    determinism; the bounded form is the live-ingest shape AND the knob
    that makes CROSS-batch semantics (watermark advancement, late-data
    drops, state re-reads) actually exercisable in tests — a single
    batch never reads back its own state or drops a late row.
    """
    configure_runtime(spark)
    # The file stream source only accepts directories; when handed a
    # bare parquet file, stage it into a temp dir (stand-in for the
    # landing directory a real ingest would tail).
    path = Path(events_path)
    if path.is_file():
        events_path = staged_stream_dir("stream_events_", {path.name: str(path)})
    schema = spark.read.parquet(events_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    raw = reader.parquet(events_path)
    return normalize_ts(raw, "ts")


def _windowed_agg(events: DataFrame, window: str) -> DataFrame:
    return (
        events.groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(sum_exact("value").alias("total_value"), F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "total_value",
            "n",
        )
    )


def stream_daily_rollup(
    spark: SparkSession,
    events_glob: str,
    window: str = "1 day",
    state_store_provider: str | None = None,
) -> DataFrame:
    """Replay the events table as a stream; return the final rollup.

    availableNow processes all existing files then stops; complete mode
    emits every window, so the result equals the batch GROUP BY.
    """
    agg = _windowed_agg(_streaming_events(spark, events_glob), window)
    name = f"stream_rollup_{uuid.uuid4().hex[:8]}"
    query = _run_to_memory(
        spark, agg, name, "complete", state_store_provider=state_store_provider
    )
    query.awaitTermination()
    return spark.table(name)


DEFAULT_STATE_PARTITIONS = 8


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _run_to_memory(
    spark: SparkSession,
    agg: DataFrame,
    name: str,
    mode: str,
    state_partitions: int = DEFAULT_STATE_PARTITIONS,
    state_store_provider: str | None = None,
):
    """Start a memory-sink stream with a bounded state-partition count.

    Streaming state partitioning is fixed by spark.sql.shuffle.partitions
    at query start and AQE does NOT coalesce it - on a foreign session
    (default 200) a replay would spin 200 state-store tasks per batch.
    Scope the conf to the stream start, then restore.

    Each state partition pays a per-batch state-store open/commit, so
    size to STATE volume, not input volume: 8 vs 32 measured 1.2s vs
    3.9s on a 150-window rollup at sf0.1. A genuinely large keyspace
    (billions of session keys) wants hundreds of partitions instead -
    callers pass `state_partitions` accordingly.

    ``state_store_provider``: pass ROCKSDB_PROVIDER to keep state
    off-heap in RocksDB - the production choice when per-partition
    state (sessions, join buffers) outgrows executor heap; the default
    HDFS-backed in-memory store is fine for windowed rollup state.
    Result-identical either way (tests pin this).
    """
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    if state_store_provider:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", state_store_provider
        )
    try:
        return (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        if state_store_provider:
            if prev_provider:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", prev_provider
                )
            else:
                spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def stream_daily_rollup_append(
    spark: SparkSession,
    events_glob: str,
    window: str = "1 day",
    watermark: str = "1 day",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Watermarked append-mode variant (the live-ingest shape).

    Late events inside the watermark still merge into their window;
    state for windows older than the watermark is evicted. Only windows
    the watermark has passed are emitted - by design the trailing
    window stays open.

    Cross-batch watermark semantics (pinned empirically on Spark 4 and
    by tests/test_streaming_differential.py): for micro-batch N,
    eviction uses wm_evict(N) = max event time over batches < N minus
    the delay, while the LATE-ROW filter uses the previous batch's
    value wm_late(N) = wm_evict(N-1) (Spark's dual
    watermarkForEviction / watermarkForLateEvents). A window emits
    exactly once, when window.end <= wm_evict; an input row is dropped
    iff its window.end <= wm_late (its state was already evicted).
    """
    events = _streaming_events(
        spark, events_glob, max_files_per_trigger
    ).withWatermark("ts", watermark)
    agg = _windowed_agg(events, window)
    name = f"stream_rollup_append_{uuid.uuid4().hex[:8]}"
    query = _run_to_memory(spark, agg, name, "append")
    query.awaitTermination()
    return spark.table(name)


def stream_sliding_rollup(
    spark: SparkSession,
    events_glob: str,
    window: str = "12 hours",
    slide: str = "6 hours",
) -> DataFrame:
    """Sliding-window streaming rollup (each event lands in
    window/slide overlapping buckets); availableNow replay + complete
    mode makes it equal the batch sliding aggregation exactly."""
    events = _streaming_events(spark, events_glob)
    agg = (
        events.groupBy(F.window("ts", window, slide).alias("win"), F.col("event_type"))
        .agg(sum_exact("value").alias("total_value"), F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            "event_type",
            "total_value",
            "n",
        )
    )
    name = f"stream_sliding_{uuid.uuid4().hex[:8]}"
    query = _run_to_memory(spark, agg, name, "complete")
    query.awaitTermination()
    return spark.table(name)


def stream_static_enrich(
    spark: SparkSession,
    events_path: str,
    customer_path: str,
) -> DataFrame:
    """Stream-static join: enrich the event stream with a broadcast
    static dimension, then aggregate per dimension attribute.

    The static side is re-read per micro-batch by the engine but never
    shuffles the stream side (broadcast hash join), which is exactly
    the live-enrichment shape at scale: the 100 TB/day stream flows
    map-side; only the dimension-sized side moves. Replayed with
    availableNow + complete mode, the result equals the batch join -
    so this streaming op carries a full SQL oracle.
    """
    configure_runtime(spark)
    events = _streaming_events(spark, events_path)
    dim = spark.read.parquet(customer_path).select("c_custkey", "c_mktsegment")
    enriched = events.join(
        F.broadcast(dim), events["user_id"] == dim["c_custkey"], "inner"
    )
    agg = enriched.groupBy("c_mktsegment").agg(
        sum_exact("value").alias("total_value"), F.count(F.lit(1)).alias("n")
    )
    name = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    query = _run_to_memory(spark, agg, name, "complete")
    query.awaitTermination()
    return spark.table(name)


def stream_session_rollup(
    spark: SparkSession,
    events_glob: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Streaming SESSION windows: F.session_window merges events into
    dynamic per-user sessions that close after `gap` of inactivity -
    the native streaming form of q_session_window's lag/cumsum
    sessionization. availableNow replay + complete mode sees the whole
    history, so the merged sessions equal the batch formulation exactly
    and the op carries the same SQL oracle. In production this runs
    append-mode behind a watermark (state evicts as sessions close);
    keys scale the state store, so callers with billions of users size
    state_partitions up accordingly.
    """
    events = _streaming_events(spark, events_glob)
    agg = (
        events.groupBy(
            F.session_window("ts", gap).alias("win"), F.col("user_id")
        )
        .agg(sum_exact("value").alias("total_value"), F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
            "total_value",
        )
    )
    name = f"stream_session_{uuid.uuid4().hex[:8]}"
    query = _run_to_memory(spark, agg, name, "complete")
    query.awaitTermination()
    return spark.table(name)


def stream_sliding_rollup_append(
    spark: SparkSession,
    events_glob: str,
    window: str = "12 hours",
    slide: str = "6 hours",
    watermark: str = "1 day",
) -> DataFrame:
    """Watermarked APPEND-mode sliding rollup — the live-ingest form of
    `stream_sliding_rollup`: overlapping windows emit once, when the
    watermark passes their end, and their state evicts. Deterministic
    under availableNow replay (final watermark = max(ts) - watermark),
    so the emitted set equals the batch sliding aggregation restricted
    to closed windows — SQL-expressible, which keeps even the
    eviction path oracle-checked."""
    events = _streaming_events(spark, events_glob).withWatermark("ts", watermark)
    agg = (
        events.groupBy(F.window("ts", window, slide).alias("win"), F.col("event_type"))
        .agg(sum_exact("value").alias("total_value"), F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "bucket_start"
            ),
            "event_type",
            "total_value",
            "n",
        )
    )
    name = f"stream_sliding_append_{uuid.uuid4().hex[:8]}"
    query = _run_to_memory(spark, agg, name, "append")
    query.awaitTermination()
    return spark.table(name)


def stream_session_rollup_append(
    spark: SparkSession,
    events_glob: str,
    gap: str = "30 minutes",
    watermark: str = "1 day",
) -> DataFrame:
    """Watermarked APPEND-mode session windows — the production form of
    `stream_session_rollup`: a session emits exactly once, when the
    watermark passes its end (last event + gap), and its merge state
    evicts. Under availableNow replay the final watermark is
    max(ts) - watermark, so the emitted set equals the batch
    sessionization restricted to sessions closed before it —
    SQL-expressible, so the session-merge eviction path carries a full
    oracle too."""
    events = _streaming_events(spark, events_glob).withWatermark("ts", watermark)
    agg = (
        events.groupBy(F.session_window("ts", gap).alias("win"), F.col("user_id"))
        .agg(
            sum_exact("value").alias("total_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
            "total_value",
        )
    )
    name = f"stream_session_append_{uuid.uuid4().hex[:8]}"
    query = _run_to_memory(spark, agg, name, "append")
    query.awaitTermination()
    return spark.table(name)
