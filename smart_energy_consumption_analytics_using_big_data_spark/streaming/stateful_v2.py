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
from pyspark.sql import DataFrame, SparkSession, functions as F
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


def _run_tws_to_memory(
    spark: SparkSession, stream_df: DataFrame, name_prefix: str, output_mode: str
) -> DataFrame:
    """Run a transformWithState stream into a uuid-named memory sink
    (availableNow replay) and return the sink table — the one runner
    all four operators in this module share. The RocksDB provider
    (transformWithState requires it) and 8 shuffle partitions are
    pinned only around query START (streaming confs are captured at
    start) and restored immediately, so concurrent batch work in the
    session keeps its own settings."""
    name = f"{name_prefix}_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        query = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
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
    return _run_tws_to_memory(spark, stats, "stateful_v2", "update")


SESSION_SCHEMA = "user_id bigint, start_ms bigint, end_ms bigint, n_events bigint"


class SessionTimerProcessor(StatefulProcessor):
    """Gap-based session windows with EVENT-TIME TIMERS — the Flink-style
    formulation: a key holds a LIST of open sessions (interval merging
    with the gap, so out-of-order batches can bridge two open sessions
    into one), and a session closes ONLY when the watermark passes its
    last event + gap. Input-carrying batches emit newly-expired sessions
    inline (against the batch's eviction watermark); keys with NO input
    rely on the registered timer firing `handleExpiredTimer` — the
    parameter family nothing else in the suite exercises. One timer per
    key at the EARLIEST open-session expiry (re-registered as sessions
    merge/extend), so timer count stays O(keys), not O(sessions).

    Session semantics match the pinned session-window facts
    (tests/test_streaming_differential.py header): an event at EXACTLY
    last + gap merges; strictly-greater silence opens a new session.
    Emitted sessions report [start_ms, end_ms] of their events and the
    event count; still-open sessions at end-of-replay are never emitted
    (they have not closed — availableNow's final empty batch fires
    timers against the fully-advanced watermark, nothing more).
    """

    def __init__(self, gap_s: int) -> None:
        self._gap_ms = int(gap_s) * 1000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._open = handle.getListState(
            "open_sessions", "start_ms bigint, last_ms bigint, n bigint"
        )

    def _merge(self, sessions: list[list[int]]) -> list[list[int]]:
        sessions.sort()
        merged: list[list[int]] = []
        for s in sessions:
            if merged and s[0] - merged[-1][1] <= self._gap_ms:
                merged[-1][1] = max(merged[-1][1], s[1])
                merged[-1][2] += s[2]
            else:
                merged.append(list(s))
        return merged

    def _flush(self, key, merged: list[list[int]], wm_ms: int):
        """Split expired/open, emit expired, persist + re-time open."""
        closed = [s for s in merged if s[1] + self._gap_ms <= wm_ms]
        still = [s for s in merged if s[1] + self._gap_ms > wm_ms]
        for t in list(self._handle.listTimers()):
            self._handle.deleteTimer(t)
        if still:
            self._open.put([tuple(s) for s in still])
            self._handle.registerTimer(min(s[1] for s in still) + self._gap_ms)
        else:
            self._open.clear()
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "start_ms": [s[0] for s in closed],
                    "end_ms": [s[1] for s in closed],
                    "n_events": [s[2] for s in closed],
                }
            )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        events: list[list[int]] = []
        for pdf in rows:
            if len(pdf):
                # pin the unit: astype("int64") on a datetime64 column
                # yields whatever resolution pandas delivered (ns today,
                # us under future Arrow-dtype defaults) — normalize to
                # ms explicitly so a resolution change can't silently
                # shrink every session 1000x
                ms = pdf["ts"].astype("datetime64[ms]").astype("int64")
                events.extend([int(v), int(v), 1] for v in ms)
        prior = [list(s) for s in self._open.get()] if self._open.exists() else []
        merged = self._merge(prior + events)
        yield from self._flush(key, merged, timerValues.getCurrentWatermarkInMs())

    def handleExpiredTimer(
        self, key: tuple, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        prior = [list(s) for s in self._open.get()] if self._open.exists() else []
        yield from self._flush(key, prior, timerValues.getCurrentWatermarkInMs())

    def close(self) -> None:
        pass


def stream_user_sessions_tws(
    spark: SparkSession,
    events_path: str,
    gap_s: int = 1800,
    delay_s: int = 3600,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Replay events through the timer-driven session processor
    (event-time timeMode, append output: a session row appears exactly
    once, when the watermark closes it)."""
    if not HAS_TWS_DEPS:
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(google.protobuf); the applyInPandasWithState sessionizer "
            "(streaming/stateful.py) covers this surface without it."
        )
    events = _streaming_events(spark, events_path, max_files_per_trigger).withWatermark(
        "ts", f"{delay_s} seconds"
    )
    sessions = events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionTimerProcessor(gap_s),
        outputStructType=SESSION_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )
    return _run_tws_to_memory(spark, sessions, "stateful_v2_sess", "append")


WM_TTL_SCHEMA = (
    "user_id bigint, n_events bigint, anchor_ms bigint, expired_by bigint"
)


class WatermarkTtlCountProcessor(StatefulProcessor):
    """Per-user running count with WATERMARK-DRIVEN (event-time) TTL —
    the verified state-expiry operator for this engine (VERDICT r13
    task 1). The semantics mirror ValueState ttlDurationMs but anchor
    expiry to EVENT time, which makes them replay-deterministic and
    therefore testable: a key's count "span" expires when the
    watermark passes its anchor (the max event-time ms written since
    the span started) + TTL. Expiry is enforced three ways, all
    against the same non-strict ``anchor + ttl <= wm`` condition
    (matching the pinned timer-fire semantics):

      - LAZY at read: an input batch that finds its prior span expired
        flushes it first (``expired_by = 0``) and starts a fresh span —
        the "expired value reads as absent" TTL contract;
      - PROACTIVE via an event-time timer at ``anchor + ttl`` (re-armed
        on every write, so TTL refreshes on update exactly like
        ttlDurationMs), which flushes and CLEARS state for keys that go
        quiet (``expired_by = 1``) — dead keys hold no memory, the
        property raw lazy-TTL lacks;
      - at write: a fresh span already past the watermark (possible
        only when one batch advances the watermark by more than TTL)
        flushes immediately instead of arming a past-due timer, so a
        registered timer is always strictly in the future — no
        intra-batch fire-ordering ambiguity (the SessionTimerProcessor
        pattern, differential-proven).

    Emits one row per EXPIRED span (append mode): the span's event
    count, its anchor, and which path flushed it. Still-open spans at
    end-of-replay are never emitted. Timer count stays at one per live
    key. The ProcessingTime TtlUserCountProcessor above remains the
    literal ttlDurationMs surface; this operator is the one with
    executed evidence here (4-seed clock-skewed differential in
    tests/test_streaming_differential.py + the q_stream_ttl_expiry
    DuckDB value check).
    """

    def __init__(self, ttl_s: int) -> None:
        self._ttl_ms = int(ttl_s) * 1000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._span = handle.getValueState("span", "n bigint, anchor_ms bigint")

    def _expired_row(self, key, n: int, anchor: int, by: int) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "anchor_ms": [anchor],
                "expired_by": [by],
            }
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        wm = timerValues.getCurrentWatermarkInMs()
        batch_n, batch_max = 0, -1
        for pdf in rows:
            if len(pdf):
                ms = pdf["ts"].astype("datetime64[ms]").astype("int64")
                batch_n += len(pdf)
                batch_max = max(batch_max, int(ms.max()))
        if batch_n == 0:
            # defensive (keys normally only appear with rows): a TRUE
            # no-op visit — state and timers untouched, so an expired
            # span still flushes via its timer with expired_by=1,
            # matching the simulator's no-input path (lazy-flushing it
            # here would mislabel it 0 and fire early)
            return
        n, anchor = (
            (int(v[0]), int(v[1])) if (v := self._span.get() if self._span.exists() else None)
            else (0, -1)
        )
        if n and anchor + self._ttl_ms <= wm:
            # prior span expired: flush it (state + timer cleared so a
            # later timer fire can't re-emit); the batch starts fresh
            yield self._expired_row(key, n, anchor, 0)
            self._span.clear()
            for t in list(self._handle.listTimers()):
                self._handle.deleteTimer(t)
            n, anchor = 0, -1
        n += batch_n
        anchor = max(anchor, batch_max)
        for t in list(self._handle.listTimers()):
            self._handle.deleteTimer(t)
        if anchor + self._ttl_ms <= wm:
            # watermark jumped past the fresh span's whole TTL in one
            # batch: flush now rather than arm a past-due timer
            yield self._expired_row(key, n, anchor, 0)
            self._span.clear()
        else:
            self._span.update((n, anchor))
            self._handle.registerTimer(anchor + self._ttl_ms)

    def handleExpiredTimer(
        self, key: tuple, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        wm = timerValues.getCurrentWatermarkInMs()
        if not self._span.exists():
            return
        n, anchor = (int(v) for v in self._span.get())
        if anchor + self._ttl_ms <= wm:
            yield self._expired_row(key, n, anchor, 1)
            self._span.clear()
            for t in list(self._handle.listTimers()):
                self._handle.deleteTimer(t)

    def close(self) -> None:
        pass


def stream_user_counts_wm_ttl(
    spark: SparkSession,
    events_path: str,
    ttl_s: int = 7200,
    delay_s: int = 86400,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Replay events through the watermark-driven TTL counter
    (event-time timeMode, append output: one row per expired span,
    emitted exactly once when the watermark passes anchor + TTL)."""
    if not HAS_TWS_DEPS:
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(google.protobuf) for its Python<->state-server protocol."
        )
    events = _streaming_events(spark, events_path, max_files_per_trigger).withWatermark(
        "ts", f"{delay_s} seconds"
    )
    expired = events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=WatermarkTtlCountProcessor(ttl_s),
        outputStructType=WM_TTL_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )
    return _run_tws_to_memory(spark, expired, "stateful_v2_wmttl", "append")


TTL_SCHEMA = "user_id bigint, n_since_expiry bigint, state_was_live bigint"


class TtlUserCountProcessor(StatefulProcessor):
    """Per-user running count in a ValueState with a PROCESSING-TIME
    TTL — the state-v2 feature family (ttlDurationMs) nothing else in
    the suite exercises. Semantics under test: an expired value reads
    as absent (`exists()` False) at the NEXT access after write-time +
    TTL, so the count restarts instead of accumulating; a live value
    accumulates normally. Each update row also reports whether prior
    state was live (state_was_live), so tests can pin exactly WHERE
    expiry happened rather than inferring it from totals.

    UNVALIDATED IN THIS ENVIRONMENT: every timeMode=ProcessingTime
    transformWithState batch stalls here (worker blocks in the state
    server read; forensics in COVERAGE.md round 13), so this
    processor's expiry path has never executed locally — its only
    green test is the EventTime TTL-rejection pin. The expiry
    differential is @skip'd with the un-skip condition written into
    tests/test_streaming_differential.py. For verified TTL semantics
    use WatermarkTtlCountProcessor below (event-time, watermark-driven
    expiry — the production-preferable formulation anyway, since it is
    replay-deterministic).
    """

    def __init__(self, ttl_ms: int) -> None:
        self._ttl_ms = int(ttl_ms)

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._cnt = handle.getValueState("cnt", "n bigint", ttlDurationMs=self._ttl_ms)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        live = 1 if self._cnt.exists() else 0
        n = self._cnt.get()[0] if live else 0
        n += sum(len(pdf) for pdf in rows)
        self._cnt.update((n,))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_since_expiry": [n], "state_was_live": [live]}
        )

    def close(self) -> None:
        pass


def stream_user_counts_ttl(
    spark: SparkSession,
    events_path: str,
    ttl_ms: int,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Replay events through the TTL'd counter (processing-time
    timeMode — state TTL is a processing-time feature). See the
    processor docstring: unvalidated in this environment (ProcessingTime
    batches stall); prefer stream_user_counts_wm_ttl."""
    if not HAS_TWS_DEPS:
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(google.protobuf) for its Python<->state-server protocol."
        )
    events = _streaming_events(spark, events_path, max_files_per_trigger)
    counts = events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=TtlUserCountProcessor(ttl_ms),
        outputStructType=TTL_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime",
    )
    return _run_tws_to_memory(spark, counts, "stateful_v2_ttl", "update")


def stage_keyed_batches(
    spark: SparkSession, events_path: str, n_batches: int = 3, key: str = "user_id"
) -> str:
    """Split the events table into ``n_batches`` DETERMINISTIC landing
    files (one per ``key % n_batches`` residue, replayed in residue
    order via forced mtimes) so a multi-batch availableNow replay has a
    reproducible micro-batch structure an external oracle can model:
    batch b's contents are a pure function of the data, wm_evict(b) is
    the running max event time of residues < b minus the delay, and the
    late filter is the pinned non-strict ``ts <= wm_late(b)``. A
    key-residue split (unlike a time split) guarantees every batch
    after the first carries genuinely late rows, so the cross-batch
    paths — late drops, state re-reads, timer closes — all execute
    under the driver's value check, not just under pytest differentials.
    Staging cost: one filtered single-file write per batch over the
    events table (a test/verification harness, not a production path —
    live ingest already arrives in files). Landing dirs are memoized
    per (events_path, n_batches, key) and removed at interpreter exit
    (memoized_landing) — repeated driver/bench runs in one process
    reuse the staged copy instead of leaking /tmp space."""
    import os

    from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import load_table
    from smart_energy_consumption_analytics_using_big_data_spark.streaming._staging import (
        memoized_landing,
    )

    def build(land: str) -> None:
        ev = load_table(spark, os.path.dirname(events_path), "events")
        for i in range(n_batches):
            _write_batch_file(
                ev.filter(F.col(key) % n_batches == i), land, i
            )

    return memoized_landing("tws_mb_", (events_path, n_batches, key), build)


def _write_batch_file(df: DataFrame, land: str, i: int) -> None:
    """Write one micro-batch landing file: single parquet named
    batch_{i}.parquet with a forced mtime so availableNow +
    maxFilesPerTrigger=1 replays the files in batch order."""
    import os
    import shutil

    part_dir = os.path.join(land, f"_stage_{i}")
    df.coalesce(1).write.mode("overwrite").parquet(part_dir)
    part = next(
        p for p in os.listdir(part_dir)
        if p.startswith("part-") and p.endswith(".parquet")
    )
    dest = os.path.join(land, f"batch_{i}.parquet")
    os.replace(os.path.join(part_dir, part), dest)
    t = 1_700_000_000 + i * 60
    os.utime(dest, (t, t))
    shutil.rmtree(part_dir)


def stage_time_batches(
    spark: SparkSession, events_path: str, n_batches: int = 3
) -> str:
    """Split the events table into ``n_batches`` landing files by TIME
    tertiles (fixed fractions of [min_us, max_us], integer arithmetic
    so both engines compute the identical split — double division
    loses precision at epoch-microsecond magnitudes), replayed oldest
    band first. Arrival order == event-time order, so the late filter
    is provably vacuous and what a multi-batch replay isolates is pure
    STATE EVICTION: a buffered row must survive every end-of-batch
    eviction (each using the watermark in effect DURING that batch —
    the binding pinned by
    test_stream_join_eviction_uses_during_batch_wm) to match a later
    batch's rows. The complement of stage_keyed_batches, which
    maximizes late drops instead. Landing dirs memoized + cleaned at
    exit like stage_keyed_batches."""
    import os

    from smart_energy_consumption_analytics_using_big_data_spark.functions.timefns import epoch_us
    from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import load_table
    from smart_energy_consumption_analytics_using_big_data_spark.streaming._staging import (
        memoized_landing,
    )

    def build(land: str) -> None:
        ev = load_table(spark, os.path.dirname(events_path), "events").withColumn(
            "__us", epoch_us("ts")
        )
        rng = ev.agg(F.min("__us").alias("lo"), F.max("__us").alias("hi")).first()
        lo, hi = rng["lo"], rng["hi"]
        band = F.expr(
            f"CAST(((__us - {lo}) * {n_batches}) DIV ({hi} - {lo} + 1) AS INT)"
        )
        for i in range(n_batches):
            _write_batch_file(ev.filter(band == i).drop("__us"), land, i)

    return memoized_landing("tws_tmb_", (events_path, n_batches), build)


def stage_redelivery_batches(
    spark: SparkSession,
    events_path: str,
    n_batches: int = 3,
    shift_s: int = 259200,
    delay_s: int = 86400,
) -> str:
    """Stage an AT-LEAST-ONCE redelivery stream for the multi-batch
    dropDuplicatesWithinWatermark value check (q_stream_dedup_wm_mb):
    batch b carries residue b's original rows (event_id % n_batches)
    PLUS a redelivery of residue b-1's rows with ts shifted forward by
    ``shift_s`` — the delayed duplicate a replaying at-least-once
    source produces. Every duplicate therefore straddles a micro-batch
    boundary, so the paths under test are all CROSS-batch: state-hit
    suppression (residue-0 redeliveries in batch 1 — state always
    live), late drops (shifted ts still at or below the lagged
    watermark), and post-eviction re-emission (residue-1 keys whose
    state expired at end of batch 1 re-emit their shifted copy in
    batch 2 — possible because shift_s > delay_s). One residue-2 row
    (the min event_id) has its ts OVERRIDDEN to exactly
    max_ts(residue 0) − delay_s == wm_late(batch 2), pinning the
    non-strict late-filter boundary (the r14 tie probe's finding) in
    batch ≥ 2 under the driver's value check. All arithmetic stays in
    the integer microsecond domain so the DuckDB oracle reproduces the
    staged contents exactly. Memoized + cleaned at exit."""
    import os

    from smart_energy_consumption_analytics_using_big_data_spark.functions.timefns import epoch_us
    from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import load_table
    from smart_energy_consumption_analytics_using_big_data_spark.streaming._staging import (
        memoized_landing,
    )

    def build(land: str) -> None:
        ev = load_table(spark, os.path.dirname(events_path), "events")
        cols = ev.columns
        m0_us, tie_id = ev.agg(
            F.max(F.when(F.col("event_id") % n_batches == 0, epoch_us("ts"))),
            F.min(
                F.when(F.col("event_id") % n_batches == n_batches - 1, F.col("event_id"))
            ),
        ).first()
        # the engine's watermark is ms-precision: floor the anchor to a
        # whole ms so the tie row sits at EXACTLY wm_late(last batch)
        tie_us = (m0_us // 1000) * 1000 - delay_s * 1_000_000
        for i in range(n_batches):
            orig = ev.filter(F.col("event_id") % n_batches == i)
            if i == n_batches - 1:
                orig = orig.withColumn(
                    "ts",
                    F.when(
                        F.col("event_id") == tie_id, F.timestamp_micros(F.lit(tie_us))
                    ).otherwise(F.col("ts")),
                )
            batch = orig
            if i > 0:
                redeliver = (
                    ev.filter(F.col("event_id") % n_batches == i - 1)
                    .withColumn(
                        "ts", F.timestamp_micros(epoch_us("ts") + shift_s * 1_000_000)
                    )
                    .select(*cols)
                )
                batch = orig.select(*cols).unionByName(redeliver)
            _write_batch_file(batch, land, i)

    return memoized_landing(
        "tws_rdmb_", (events_path, n_batches, shift_s, delay_s), build
    )
