"""Streaming semantics: availableNow replay equals the batch rollup;
watermarked append mode withholds the still-open trailing window
(deterministic micro-batch replay per SURVEY.md SS7)."""

from __future__ import annotations

from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import load_table
from smart_energy_consumption_analytics_using_big_data_spark.streaming.rollup import (
    stream_daily_rollup,
    stream_daily_rollup_append,
)
from smart_energy_consumption_analytics_using_big_data_spark.operators.aggregates import sum_exact

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _batch_rollup(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    return (
        ev.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"), "event_type")
        .agg(sum_exact("value").alias("total_value"), F.count(F.lit(1)).alias("n"))
    )


def _as_set(df):
    return {(r["day"], r["event_type"], r["total_value"], r["n"]) for r in df.collect()}


def test_stream_complete_equals_batch(spark):
    streamed = stream_daily_rollup(spark, f"{SF_SMOKE}/events.parquet")
    assert _as_set(streamed) == _as_set(_batch_rollup(spark))


def test_stateful_running_stats_equal_batch(spark):
    from smart_energy_consumption_analytics_using_big_data_spark.streaming.stateful import (
        stream_user_running_stats,
    )

    streamed = {
        r["user_id"]: r
        for r in stream_user_running_stats(spark, f"{SF_SMOKE}/events.parquet").collect()
    }
    batch = {
        r["user_id"]: r
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert set(streamed) == set(batch)
    for uid, b in batch.items():
        s = streamed[uid]
        assert s["n_events"] == b["n_events"]
        assert abs(s["total_value"] - b["total_value"]) < 1e-6
        assert s["max_value"] == b["max_value"]


def test_stream_append_withholds_open_window(spark):
    import datetime as dt

    batch = _as_set(_batch_rollup(spark))
    appended = _as_set(stream_daily_rollup_append(spark, f"{SF_SMOKE}/events.parquet"))
    # append-mode output is a subset: closed windows only
    assert appended < batch
    # a window emits only once the watermark (max_ts - 1 day) passes its
    # END; every day whose end lies beyond the watermark is withheld
    max_ts = load_table(spark, SF_SMOKE, "events").agg(F.max("ts")).collect()[0][0]
    watermark = max_ts - dt.timedelta(days=1)
    batch_days = {d for d, *_ in batch}
    appended_days = {d for d, *_ in appended}
    expected_withheld = {
        d
        for d in batch_days
        if dt.datetime.strptime(d, "%Y-%m-%d") + dt.timedelta(days=1) > watermark
    }
    assert batch_days - appended_days == expected_withheld


def test_stream_staging_memoized_and_tracked():
    # Re-invoking the same query must reuse one staging dir (no temp
    # leak growth), and every staged dir is registered for exit cleanup.
    import os

    from smart_energy_consumption_analytics_using_big_data_spark.streaming import _staging

    src = "/root/testdata/sf0.001/events.parquet"
    a = _staging.staged_stream_dir("leaktest_", {"a.parquet": src})
    b = _staging.staged_stream_dir("leaktest_", {"a.parquet": src})
    assert a == b
    assert os.path.isdir(a) and os.listdir(a) == ["a.parquet"]
    assert any(str(p) == a for p in _staging._STAGED.values())


def test_stream_upsert_snapshot_converges_and_is_idempotent(spark, tmp_path):
    import pandas as pd

    from smart_energy_consumption_analytics_using_big_data_spark.streaming.upsert import (
        SnapshotUpsertSink,
        stream_upsert_snapshot,
    )

    # two landing files = two micro-batches (maxFilesPerTrigger=1);
    # later versions must overwrite, new keys must insert
    land = tmp_path / "landing"
    land.mkdir()
    b1 = pd.DataFrame({"uid": [1, 2, 3], "ver": [1, 1, 1], "val": ["a1", "b1", "c1"]})
    b2 = pd.DataFrame({"uid": [2, 2, 4], "ver": [3, 2, 1], "val": ["b3", "b2", "d1"]})
    spark.createDataFrame(b1).coalesce(1).write.parquet(str(land / "f1"))
    spark.createDataFrame(b2).coalesce(1).write.parquet(str(land / "f2"))

    sink = SnapshotUpsertSink(spark, str(tmp_path / "snap"), ["uid"], ["ver"])
    stream = (
        spark.readStream.schema("uid long, ver long, val string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land) + "/*")
    )
    q = stream_upsert_snapshot(stream, sink, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = {r["uid"]: (r["ver"], r["val"]) for r in sink.current().collect()}
    assert got == {1: (1, "a1"), 2: (3, "b3"), 3: (1, "c1"), 4: (1, "d1")}

    # crash-replay: re-applying the last batch must not change the
    # snapshot (upsert-by-key is idempotent)
    sink.process_batch(spark.createDataFrame(b2), batch_id=99)
    again = {r["uid"]: (r["ver"], r["val"]) for r in sink.current().collect()}
    assert again == got

    # restart with the same checkpoint and no new files: no-op
    q2 = stream_upsert_snapshot(stream, sink, str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    final = {r["uid"]: (r["ver"], r["val"]) for r in sink.current().collect()}
    assert final == got


def test_rocksdb_state_store_equals_default(spark):
    """The RocksDB state store (the off-heap production choice for
    large streaming state) must be a pure physical swap: same rollup
    answer as the default HDFS-backed in-memory provider, and the
    session conf is restored afterwards."""
    from smart_energy_consumption_analytics_using_big_data_spark.streaming.rollup import (
        ROCKSDB_PROVIDER,
        stream_daily_rollup,
    )

    src = "/root/testdata/sf0.001/events.parquet"
    default = sorted(map(tuple, stream_daily_rollup(spark, src).collect()))
    rocks = sorted(
        map(
            tuple,
            stream_daily_rollup(
                spark, src, state_store_provider=ROCKSDB_PROVIDER
            ).collect(),
        )
    )
    assert default == rocks and len(default) > 0
    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
        != ROCKSDB_PROVIDER
    )


def test_stream_scoring_equals_batch(spark):
    """Applying the SAME fitted model to the stream replay and to the
    batch table must produce identical rollups (per-row rounding +
    exact decimal sums make this partition-invariant)."""
    from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import load_table
    from smart_energy_consumption_analytics_using_big_data_spark.streaming.scoring import (
        score_events,
        stream_model_scoring,
        train_event_value_model,
    )

    src = "/root/testdata/sf0.001/events.parquet"
    model = train_event_value_model(spark, src)
    streamed = stream_model_scoring(spark, src, model)
    batch = score_events(load_table(spark, "/root/testdata/sf0.001", "events"), model)
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, batch.collect()))


def test_replay_datasource_offsets_and_parity(spark):
    """Custom Python streaming DataSource (format 'replay'): emits the
    parquet file in fixed-size offset ranges; the aggregate over the
    replay must equal the batch aggregate. availableNow drains ONE
    prefetched range per run for a simple reader, so the stream leg
    sizes the range to cover the file and the offset mechanics
    (half-open ranges, replay, exhaustion) are asserted directly."""
    from pyspark.sql import functions as F

    from smart_energy_consumption_analytics_using_big_data_spark.sources.replay_stream import (
        register_replay_source,
    )

    register_replay_source(spark)
    src = "/root/testdata/sf0.001/events.parquet"
    stream = (
        spark.readStream.format("replay")
        .option("path", src)
        .option("rows_per_batch", 2000)
        .option("order_col", "event_id")
        .load()
    )
    agg = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    name = "replay_parity_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.table(name).collect()))
    want = sorted(
        map(
            tuple,
            spark.read.parquet(src)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect(),
        )
    )
    assert got == want

    # offset contract, asserted on the reader directly (availableNow
    # prefetches a simple reader into one batch, so micro-batch counts
    # can't witness it): half-open ranges, exhaustion, exact replay.
    from smart_energy_consumption_analytics_using_big_data_spark.sources.replay_stream import (
        ReplayStreamReader,
    )

    r = ReplayStreamReader({"path": src, "rows_per_batch": "300", "order_col": "event_id"})
    off0 = r.initialOffset()
    assert off0 == {"row": 0}
    it1, off1 = r.read(off0)
    rows1 = list(it1)
    assert len(rows1) == 300 and off1 == {"row": 300}
    it2, off2 = r.read(off1)
    assert len(list(it2)) == 300 and off2 == {"row": 600}
    # exactly-once replay: same range -> same rows
    assert list(r.readBetweenOffsets(off0, off1)) == rows1
    # exhaustion: offsets stop advancing at EOF
    it_last, off_last = r.read({"row": 1000})
    assert list(it_last) == [] and off_last == {"row": 1000}


def test_stream_outer_join_gates_null_rows_on_watermark(spark, tmp_path):
    """Left-outer stream-stream join: an unmatched view emits its NULL
    row only once the global watermark (max ts - 1 day) passes
    view_ts + 6h; a fresher unmatched view stays withheld in state."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from smart_energy_consumption_analytics_using_big_data_spark.streaming.joins import (
        stream_stream_join,
    )

    base = dt.datetime(2024, 3, 1)
    rows = [
        # old unmatched view: window closed long before the watermark
        (1, base, 101, "view", 1.0),
        # matched pair
        (2, base + dt.timedelta(days=1), 102, "view", 1.0),
        (3, base + dt.timedelta(days=1, hours=2), 102, "purchase", 1.0),
        # fresh unmatched view: inside the watermark horizon -> withheld
        (4, base + dt.timedelta(days=3, hours=20), 103, "view", 1.0),
        # late purchase fixes the right-side max ts (watermark anchor)
        (5, base + dt.timedelta(days=4), 104, "purchase", 1.0),
    ]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    path = tmp_path / "events.parquet"
    pq.write_table(table, str(path), version="2.6")

    got = {
        (r.view_id, r.purchase_id)
        for r in stream_stream_join(spark, str(path), how="leftOuter").collect()
    }
    # global watermark = min(max view ts, max purchase ts) - 1 day
    #                  = min(base+3d20h, base+4d) - 1d = base+2d20h.
    # view 1's match window closed at base+6h, before it -> NULL row
    # emits; view 4's window closes at base+4d2h, beyond it ->
    # withheld; pair (2,3) matches normally.
    assert got == {(1, None), (2, 3)}


def test_snapshot_time_travel_and_vacuum(spark, tmp_path):
    """Retained generations are time-travel-readable; vacuum drops all
    but the newest keep_last and never the current one."""
    import pandas as pd

    from smart_energy_consumption_analytics_using_big_data_spark.streaming.upsert import (
        SnapshotUpsertSink,
    )

    sink = SnapshotUpsertSink(spark, str(tmp_path / "snap"), ["uid"], ["ver"])
    b1 = pd.DataFrame({"uid": [1, 2], "ver": [1, 1], "val": ["a1", "b1"]})
    b2 = pd.DataFrame({"uid": [2, 3], "ver": [2, 1], "val": ["b2", "c1"]})
    b3 = pd.DataFrame({"uid": [1, 1], "ver": [3, 2], "val": ["a3", "a2"]})
    for i, b in enumerate((b1, b2, b3)):
        sink.process_batch(spark.createDataFrame(b), batch_id=i)

    assert sink.generations() == [0, 1, 2]
    # time travel: generation 0 is the pre-merge state of batch 1
    g0 = {r["uid"]: (r["ver"], r["val"]) for r in sink.snapshot_at(0).collect()}
    assert g0 == {1: (1, "a1"), 2: (1, "b1")}
    g2 = {r["uid"]: (r["ver"], r["val"]) for r in sink.snapshot_at(2).collect()}
    assert g2 == {1: (3, "a3"), 2: (2, "b2"), 3: (1, "c1")}
    assert g2 == {r["uid"]: (r["ver"], r["val"]) for r in sink.current().collect()}

    removed = sink.vacuum(keep_last=2)
    assert removed == [0]
    assert sink.generations() == [1, 2]
    # current survives even with keep_last=1
    assert sink.vacuum(keep_last=1) == [1]
    assert sink.generations() == [2]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sink.snapshot_at(0)
