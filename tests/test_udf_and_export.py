"""Pandas-UDF surface (D2), GBT (M5), export merge (S12), multimodal
decode plumbing."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from smart_energy_consumption_analytics_using_big_data_spark.functions import pandasfns as PF


def test_grouped_weighted_mean_udaf(spark):
    pdf = pd.DataFrame(
        {"k": ["a", "a", "b"], "v": [1.0, 3.0, 10.0], "w": [1.0, 3.0, 2.0]}
    )
    out = {
        r["k"]: r["wmean"]
        for r in PF.grouped_weighted_mean(spark.createDataFrame(pdf), "k", "v", "w").collect()
    }
    assert abs(out["a"] - 2.5) < 1e-9  # (1*1 + 3*3) / 4
    assert abs(out["b"] - 10.0) < 1e-9


def test_normalize_per_group_apply_in_pandas(spark):
    pdf = pd.DataFrame({"k": ["a", "a", "a", "b"], "v": [0.0, 5.0, 10.0, 7.0]})
    out = PF.normalize_per_group(
        spark.createDataFrame(pdf), "k", "v", "k string, v double, normalized double"
    ).collect()
    by = {(r["k"], r["v"]): r["normalized"] for r in out}
    assert by[("a", 0.0)] == 0.0 and by[("a", 5.0)] == 0.5 and by[("a", 10.0)] == 1.0
    assert by[("b", 7.0)] == 0.0  # single-row group: span guard


def test_gbt_forecast(spark, daily_ar_fixture):
    from smart_energy_consumption_analytics_using_big_data_spark.ml import forecast as FC

    feats = FC.add_forecast_features(spark.createDataFrame(daily_ar_fixture))
    result = FC.train_gbt_forecast(
        feats, test_cutoff="2013-03-25", max_iter=5, max_depth=3, sample_fraction=0.5
    )
    assert result.metrics["r2"] > 0.0, result.metrics


def test_merge_for_export(spark):
    from smart_energy_consumption_analytics_using_big_data_spark.pipeline.energy import (
        merge_for_export,
    )

    anomalies = spark.createDataFrame(
        pd.DataFrame({"LCLid": ["A", "B"], "date": ["2013-01-01", "2013-01-02"], "z_score": [3.5, 4.0]})
    )
    predictions = spark.createDataFrame(
        pd.DataFrame({"LCLid": ["A"], "date": ["2013-01-01"], "prediction": [1.5]})
    )
    daily = spark.createDataFrame(
        pd.DataFrame(
            {
                "LCLid": ["A", "B"],
                "date": ["2013-01-01", "2013-01-02"],
                "daily_energy_kwh": [2.0, 3.0],
                "avg_hourly_energy": [0.1, 0.2],
                "total_readings": [48, 46],
            }
        )
    )
    out = {r["LCLid"]: r for r in merge_for_export(anomalies, predictions, daily).collect()}
    assert out["A"]["forecast_prediction"] == 1.5
    assert out["B"]["forecast_prediction"] == 0.0  # fillna on missing forecast
    assert out["B"]["daily_energy_kwh"] == 3.0
    assert len(out) == 2  # left joins: no fan-out, no drops


def test_jsonl_shard_sink_commit_protocol(spark, tmp_path):
    """Custom batch DataSource writer: every row lands in exactly one
    committed shard, the manifest names exactly the committed shards,
    a manifest-honoring re-read round-trips, and abort() removes the
    orphans of a failed attempt."""
    import json
    import os

    from pyspark.sql import functions as F

    from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import load_table
    from smart_energy_consumption_analytics_using_big_data_spark.sources.jsonl_sink import (
        JsonlCommit,
        JsonlShardWriter,
        read_manifest,
        register_jsonl_sink,
    )

    register_jsonl_sink(spark)
    out = str(tmp_path / "sink")
    ev = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("event_id", "user_id", "event_type")
        .repartition(4)
    )
    n = ev.count()
    ev.write.format("jsonl_shards").option("path", out).mode("append").save()

    man = read_manifest(out)
    assert man["total_rows"] == n
    shards = {e["shard"] for e in man["shards"]}
    on_disk = {f for f in os.listdir(out) if f.endswith(".jsonl")}
    assert shards == on_disk and len(shards) == 4
    assert not any(f.endswith(".inprogress") for f in os.listdir(out))

    back = spark.read.json(os.path.join(out, "*.jsonl"))
    assert back.count() == n
    a = sorted(
        (int(r["event_id"]), int(r["user_id"]), r["event_type"]) for r in back.collect()
    )
    b = sorted(tuple(r) for r in ev.collect())
    assert a == b

    # abort removes exactly the written (unmanifested) shards
    w = JsonlShardWriter({"path": out})
    fake = json.dumps({"x": 1})
    orphan = os.path.join(out, "part-orphan.jsonl")
    with open(orphan, "w") as fh:
        fh.write(fake + "\n")
    w.abort([JsonlCommit("part-orphan.jsonl", 1), None])
    assert not os.path.exists(orphan)
    assert read_manifest(out) == man  # committed data untouched
