"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md SS7 extension - the reference has no streaming at all).

Per-user running aggregate maintained as explicit state across
micro-batches: the shape for operators Structured Streaming's built-in
windows can't express (running counters, custom session logic,
model-state updates). State lives in the state store, partitioned by
key - nothing driver-side.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from smart_energy_consumption_analytics_using_big_data_spark.streaming.rollup import (
    _streaming_events,
)

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, max_value double"
STATE_SCHEMA = "n bigint, total double, mx double"


def _update_user_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch's rows for one user into running state."""
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total], "max_value": [mx]}
    )


def stream_user_running_stats(
    spark: SparkSession,
    events_path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Replay events through a custom stateful operator; returns the
    final per-user running stats (update-mode memory sink). Bounded
    ``max_files_per_trigger`` splits the replay into real micro-batches
    so the state get/update round-trip is exercised across batches."""
    events = _streaming_events(spark, events_path, max_files_per_trigger)

    stats = events.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"stateful_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        query = (
            stats.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    query.awaitTermination()
    return spark.table(name)


DELTA_OUTPUT_SCHEMA = "user_id bigint, consumed double, n_resets bigint"
DELTA_STATE_SCHEMA = "has_last boolean, last_cents bigint, consumed_cents bigint, resets bigint"


def _update_counter_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold one user's micro-batch into (last reading, consumption,
    resets) state - the streaming form of q_ts_counter_delta's
    cumulative-counter semantics (a drop is a meter reset; the
    post-reset absolute reading is the consumption since reset)."""
    has_last, last, consumed, resets = (
        state.get if state.exists else (False, 0, 0, 0)
    )
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
    for cents in (rows["value"] * 100).round().astype("int64"):
        if not has_last:
            has_last = True
        elif cents >= last:
            consumed += int(cents - last)
        else:
            consumed += int(cents)
            resets += 1
        last = int(cents)
    state.update((has_last, last, consumed, resets))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "consumed": [consumed / 100.0],
            "n_resets": [resets],
        }
    )


def stream_counter_delta(spark: SparkSession, events_path: str) -> DataFrame:
    """Counter-to-consumption over a replayed event stream: per-user
    meter state (last reading + running consumption + reset count)
    lives in the state store, keyed and partitioned by user - no
    driver-side state, horizontal scale by key like any stateful agg.
    Rows are folded in (ts, event_id) order WITHIN each micro-batch;
    across batches the file-stream source replays landing files in
    arrival order, the same monotone assumption a real meter ingest
    gives (late readings belong in the as-of/backfill path, not here).
    Update-mode memory sink; the final micro-batch row per user is the
    stream's answer and equals the batch q_ts_counter_delta rollup
    summed over days (pinned in tests/test_streaming.py)."""
    events = _streaming_events(spark, events_path)
    deltas = events.select("user_id", "ts", "event_id", "value").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _update_counter_state,
        outputStructType=DELTA_OUTPUT_SCHEMA,
        stateStructType=DELTA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"counter_delta_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        query = (
            deltas.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    query.awaitTermination()
    # update-mode emits one row per user per micro-batch; both running
    # totals are monotone nondecreasing, so max() IS the final state
    # (order-independent, unlike last()).
    out = spark.table(name)
    return out.groupBy("user_id").agg(
        F.round(F.max("consumed"), 6).alias("consumed"),
        F.max("n_resets").alias("n_resets"),
    )
