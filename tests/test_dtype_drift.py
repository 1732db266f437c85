"""Regression guard for testdata timestamp-representation drift.

Between rounds the generator silently migrated `events.ts` from INT64
TIMESTAMP(NANOS) (read as bigint under nanosAsLong) to TIMESTAMP_NTZ
micros, breaking every site that hard-coded one representation
(VERDICT r2: 9 gate FAILs, 13 red tests, one root cause). This test
writes the SAME 10 events in three physical parquet flavors and
asserts the whole time-handling stack — catalog load, epoch helpers,
epoch-deriving query plans, and the streaming reader — produces
identical answers for all of them. The next silent migration fails
loudly here instead of in the driver gate.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from smart_energy_consumption_analytics_using_big_data_spark.functions.timefns import epoch_s, epoch_us
from smart_energy_consumption_analytics_using_big_data_spark.operators.joins import range_join_bucketed
from smart_energy_consumption_analytics_using_big_data_spark.plans.analytics import (
    q_cohort_retention,
    q_funnel,
    q_sessionize,
    q_window_range_7d,
)
from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import load_table
from smart_energy_consumption_analytics_using_big_data_spark.streaming.rollup import (
    stream_daily_rollup,
)

FLAVORS = ("nanos_int64", "ntz_micros", "utc_micros")

# 10 fixed events: 3 users, multi-day span, a 30-min session gap, a
# click->purchase pair within an hour (exercises funnel/sessionize/
# range-frame/cohort arithmetic).
_ROWS = [
    (1, "2024-01-01T00:00:00", 101, "click", 1.0),
    (2, "2024-01-01T00:10:00", 101, "view", 2.0),
    (3, "2024-01-01T00:50:00", 101, "purchase", 3.0),  # 40-min gap: new session
    (4, "2024-01-03T12:00:00", 101, "view", 4.0),
    (5, "2024-01-01T06:00:00", 202, "click", 5.0),
    (6, "2024-01-09T06:30:00", 202, "view", 6.0),  # > 7 days after ev 5
    (7, "2024-01-09T06:45:00", 202, "purchase", 7.0),
    (8, "2024-02-15T09:00:00", 303, "signup", 8.0),
    (9, "2024-02-15T09:20:00", 303, "click", 9.0),
    (10, "2024-02-22T10:00:00", 303, "purchase", 10.0),
]


def _write_events(path: str, flavor: str) -> None:
    ts = [dt.datetime.fromisoformat(r[1]) for r in _ROWS]
    unit_type = {
        "nanos_int64": pa.timestamp("ns"),
        "ntz_micros": pa.timestamp("us"),
        "utc_micros": pa.timestamp("us", tz="UTC"),
    }[flavor]
    if flavor == "utc_micros":
        ts = [t.replace(tzinfo=dt.timezone.utc) for t in ts]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in _ROWS], pa.int64()),
            "ts": pa.array(ts, unit_type),
            "user_id": pa.array([r[2] for r in _ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in _ROWS], pa.string()),
            "value": pa.array([r[4] for r in _ROWS], pa.float64()),
            "props": pa.array(["{}"] * len(_ROWS), pa.string()),
        }
    )
    # parquet format 2.6 keeps the NANOS annotation instead of
    # coercing to micros — the flavor round 1 actually saw.
    pq.write_table(table, path, version="2.6")


@pytest.fixture(scope="module")
def flavor_dirs(tmp_path_factory):
    dirs = {}
    for flavor in FLAVORS:
        d = tmp_path_factory.mktemp(f"events_{flavor}")
        _write_events(str(d / "events.parquet"), flavor)
        dirs[flavor] = str(d)
    return dirs


def _collected(df, cols=None):
    cols = cols or df.columns
    return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())


def test_physical_flavors_differ(flavor_dirs, spark):
    """Sanity: the fixture really produces three distinct raw dtypes."""
    raw = {
        f: dict(spark.read.parquet(f"{d}/events.parquet").dtypes)["ts"]
        for f, d in flavor_dirs.items()
    }
    assert raw["nanos_int64"] == "bigint"
    assert raw["ntz_micros"] == "timestamp_ntz"
    assert raw["utc_micros"] == "timestamp"


def test_epoch_helpers_agree_across_flavors(flavor_dirs, spark):
    out = {}
    for flavor, d in flavor_dirs.items():
        ev = load_table(spark, d, "events")
        out[flavor] = _collected(
            ev.select("event_id", epoch_us("ts").alias("us"), epoch_s("ts").alias("s"))
        )
    assert out["nanos_int64"] == out["ntz_micros"] == out["utc_micros"]
    # spot value: event 1 = 2024-01-01T00:00Z
    assert ("1", "1704067200000000", "1704067200") in out["ntz_micros"]


@pytest.mark.parametrize(
    "query", [q_sessionize, q_funnel, q_cohort_retention, q_window_range_7d]
)
def test_epoch_queries_agree_across_flavors(flavor_dirs, spark, query):
    results = [_collected(query(spark, d)) for d in flavor_dirs.values()]
    assert results[0] == results[1] == results[2]
    assert results[0]  # non-empty


def test_range_join_agrees_across_flavors(flavor_dirs, spark):
    out = {}
    for flavor, d in flavor_dirs.items():
        ev = load_table(spark, d, "events")
        points = ev.select("event_id", "user_id", "ts")
        intervals = ev.filter(F.col("event_type") == "click").select(
            F.col("user_id"),
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end_ts"),
        )
        joined = range_join_bucketed(
            points, intervals, "ts", "start_ts", "end_ts", on=["user_id"], bucket_s=3600
        )
        out[flavor] = _collected(joined.select("event_id", "user_id"))
    assert out["nanos_int64"] == out["ntz_micros"] == out["utc_micros"]
    assert out["ntz_micros"]


def test_streaming_reader_agrees_across_flavors(flavor_dirs, spark):
    out = {
        flavor: _collected(stream_daily_rollup(spark, f"{d}/events.parquet"))
        for flavor, d in flavor_dirs.items()
    }
    assert out["nanos_int64"] == out["ntz_micros"] == out["utc_micros"]
    days = {r[0] for r in out["ntz_micros"]}
    assert "2024-01-01" in days and "2024-02-22" in days


def test_model_trainer_features_agree_across_flavors(flavor_dirs, spark):
    """The batch model-training leg goes through the same dtype guard
    as the stream leg (ADVICE r3): a hard-coded cast('timestamp') would
    read INT64-nanos as epoch SECONDS and produce garbage calendar
    features that the stream==batch parity test can't see (both legs
    share the mis-trained model). Pin the feature frame itself."""
    from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import normalize_ts
    from smart_energy_consumption_analytics_using_big_data_spark.streaming.scoring import (
        _with_event_features,
    )

    out = {}
    for flavor, d in flavor_dirs.items():
        raw = normalize_ts(spark.read.parquet(f"{d}/events.parquet"), "ts")
        out[flavor] = _collected(
            _with_event_features(raw).select("event_id", "hour", "dow", "day")
        )
    assert out["nanos_int64"] == out["ntz_micros"] == out["utc_micros"]
    # spot value: event 8 = 2024-02-15T09:00 -> hour 9, Thursday (dow 5), day 15
    assert ("8", "9.0", "5.0", "15.0") in out["ntz_micros"]


# ---------------------------------------------------------------------------
# Numeric/array dtype drift (VERDICT r3 item 6): the same generator that
# migrated events.ts could drift embeddings.embedding element type
# (float <-> double) or events.value width. All fixture values are exact
# in float32 (multiples of 1/64 for embeddings, halves for values), so
# any cross-flavor difference is a code-path divergence, not rounding.

_EMB_FLAVORS = ("emb_f32", "emb_f64")
_VAL_FLAVORS = ("val_f32", "val_f64")
_DIM = 64


def _emb_value(i: int, j: int) -> float:
    return ((i * 67 + j * 13) % 128 - 64) / 64.0


@pytest.fixture(scope="module")
def emb_flavor_dirs(tmp_path_factory):
    dirs = {}
    vecs = [[_emb_value(i, j) for j in range(_DIM)] for i in range(20)]
    for flavor, elem in (("emb_f32", pa.float32()), ("emb_f64", pa.float64())):
        d = tmp_path_factory.mktemp(flavor)
        table = pa.table(
            {
                "vec_id": pa.array(range(20), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(elem)),
                "label": pa.array([i % 3 for i in range(20)], pa.int32()),
            }
        )
        pq.write_table(table, str(d / "embeddings.parquet"), version="2.6")
        dirs[flavor] = str(d)
    return dirs


@pytest.fixture(scope="module")
def value_flavor_dirs(tmp_path_factory):
    dirs = {}
    for flavor, typ in (("val_f32", pa.float32()), ("val_f64", pa.float64())):
        d = tmp_path_factory.mktemp(flavor)
        ts = [dt.datetime.fromisoformat(r[1]) for r in _ROWS]
        table = pa.table(
            {
                "event_id": pa.array([r[0] for r in _ROWS], pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in _ROWS], pa.int64()),
                "event_type": pa.array([r[3] for r in _ROWS], pa.string()),
                "value": pa.array([r[4] for r in _ROWS], typ),
                "props": pa.array(["{}"] * len(_ROWS), pa.string()),
            }
        )
        pq.write_table(table, str(d / "events.parquet"), version="2.6")
        dirs[flavor] = str(d)
    return dirs


def test_embedding_element_flavors_differ(emb_flavor_dirs, spark):
    raw = {
        f: dict(spark.read.parquet(f"{d}/embeddings.parquet").dtypes)["embedding"]
        for f, d in emb_flavor_dirs.items()
    }
    assert raw["emb_f32"] == "array<float>" and raw["emb_f64"] == "array<double>"


def test_similarity_family_agrees_across_embedding_flavors(emb_flavor_dirs, spark):
    from smart_energy_consumption_analytics_using_big_data_spark.ext.similarity import (
        cosine_topk,
        knn_join,
        pq_codebook,
        pq_encode,
    )

    from smart_energy_consumption_analytics_using_big_data_spark.ext.embeddings import (
        covariance_matrix,
    )

    out = {}
    for flavor, d in emb_flavor_dirs.items():
        emb = load_table(spark, d, "embeddings")
        query = emb.orderBy("vec_id").limit(1)
        out[flavor] = {
            "cos": _collected(cosine_topk(emb, query, k=5)),
            "cb": _collected(pq_codebook(emb)),
            "enc": _collected(pq_encode(emb)),
            "knn": _collected(knn_join(emb, emb.orderBy("vec_id").limit(2), k=3)),
            "cov": _collected(covariance_matrix(emb)),
        }
    assert out["emb_f32"] == out["emb_f64"]
    assert out["emb_f32"]["cos"]  # non-empty
    assert out["emb_f32"]["cov"]


def test_agg_family_agrees_across_value_flavors(value_flavor_dirs, spark):
    from smart_energy_consumption_analytics_using_big_data_spark.plans.registry import flagship

    out = {}
    for flavor, d in value_flavor_dirs.items():
        ev = load_table(spark, d, "events")
        rollup = ev.groupBy("event_type").agg(
            F.sum(F.col("value").cast("double")).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        out[flavor] = {
            "rollup": _collected(rollup),
            "flagship": _collected(flagship(spark, d)),
        }
    assert out["val_f32"] == out["val_f64"]
    assert out["val_f32"]["rollup"]
