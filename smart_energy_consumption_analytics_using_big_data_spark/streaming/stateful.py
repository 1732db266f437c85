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
from pyspark.sql import DataFrame, SparkSession
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


def stream_user_running_stats(spark: SparkSession, events_path: str) -> DataFrame:
    """Replay events through a custom stateful operator; returns the
    final per-user running stats (update-mode memory sink)."""
    events = _streaming_events(spark, events_path)

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
