"""Custom stateful streaming operator via transformWithStateInPandas —
Spark 4's arbitrary-state API (SURVEY.md §7 extension; the reference
has no streaming at all).

Where ``applyInPandasWithState`` (streaming/stateful.py) exposes one
opaque state tuple per key, ``transformWithState`` gives the processor
NAMED, TYPED state variables backed individually by the state store:
here a ValueState for the per-user running (n, max) plus a MapState
keyed by event_type for per-type counts. Each variable is read/written
independently — the engine only serializes what the batch touched —
and the API is the one that carries Spark's new state features (TTL,
timers, initial state, state-v2 checkpoint format). State lives in
RocksDB (transformWithState requires the RocksDB provider), partitioned
by user key — nothing driver-side, so a billion-user keyspace shards
across executors exactly like any other keyed state.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from smart_energy_consumption_analytics_using_big_data_spark.streaming.pbcompat import ensure_protobuf
from smart_energy_consumption_analytics_using_big_data_spark.streaming.rollup import (
    ROCKSDB_PROVIDER,
    _streaming_events,
)

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, max_value double, n_types bigint"

# transformWithState's Python worker speaks protobuf to the JVM state
# server; without the google.protobuf package the worker crashes at
# startup with an opaque STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE.
# ensure_protobuf() resolves the runtime (native install, else the
# Cloud-SDK-bundled fallback — see pbcompat); callers get a clear,
# immediate error only when neither exists. Runs at IMPORT time on
# purpose: unpickling UserTypedStatsProcessor in a Spark worker imports
# this module, which installs the alias in that worker before the state
# client's lazy StateMessage_pb2 import.
HAS_TWS_DEPS = ensure_protobuf()


class UserTypedStatsProcessor(StatefulProcessor):
    """Per-user running stats across two independent typed state vars.

    Emits one update row per (user, micro-batch): the running event
    count, running max value, and the number of DISTINCT event types
    seen so far (the MapState's key count — state the old API could
    only model by packing a dict into one opaque blob).
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._stats = handle.getValueState("stats", "n bigint, mx double")
        self._type_counts = handle.getMapState(
            "type_counts", "event_type string", "c bigint"
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, mx = self._stats.get() if self._stats.exists() else (0, float("-inf"))
        for pdf in rows:
            if not len(pdf):
                continue
            n += len(pdf)
            mx = max(mx, float(pdf["value"].max()))
            for etype, cnt in pdf["event_type"].value_counts().items():
                prev = (
                    self._type_counts.getValue((etype,))[0]
                    if self._type_counts.containsKey((etype,))
                    else 0
                )
                self._type_counts.updateValue((etype,), (prev + int(cnt),))
        self._stats.update((n, mx))
        n_types = sum(1 for _ in self._type_counts.keys())
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "max_value": [mx],
                "n_types": [n_types],
            }
        )

    def close(self) -> None:
        pass


def stream_user_typed_stats(
    spark: SparkSession,
    events_path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Replay events through the transformWithState processor; returns
    every per-batch update row (update-mode memory sink). With bounded
    ``max_files_per_trigger`` the replay becomes multiple micro-batches,
    exercising ValueState/MapState persistence across batches (a
    single-batch replay never reads back its own state)."""
    if not HAS_TWS_DEPS:
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(google.protobuf) for its Python<->state-server protocol; "
            "it is not installed in this environment. The equivalent "
            "applyInPandasWithState operator (streaming/stateful.py) "
            "covers the custom-stateful surface without it."
        )
    events = _streaming_events(spark, events_path, max_files_per_trigger)
    stats = events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTypedStatsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    name = f"stateful_v2_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
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
        if prev_provider is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    query.awaitTermination()
    return spark.table(name)
