"""Streaming model scoring: apply a batch-trained MLlib model to a
live event stream (SURVEY.md SS2.9 x SS2.10 intersection — the online
inference shape the reference's batch-only pipeline never reaches).

A fitted PipelineModel whose stages are all transformers (assembler,
scaler, regression model) is a stateless row-wise function, so
`model.transform(streaming_df)` is legal Structured Streaming: the
stream flows map-side through the model, no state, no shuffle until
the downstream rollup. This is how a 100 TB/day feed gets scored by a
nightly-retrained model — train batch-side, broadcast the (tiny)
model, transform in-stream.

Determinism contract for tests: predictions are rounded per-row before
the exact decimal rollup, so stream scoring == batch scoring with the
same fitted model regardless of partitioning.
"""

from __future__ import annotations

import uuid

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import LinearRegression
from pyspark.sql import DataFrame, SparkSession, functions as F

from smart_energy_consumption_analytics_using_big_data_spark.operators.aggregates import sum_exact
from smart_energy_consumption_analytics_using_big_data_spark.streaming.rollup import (
    _run_to_memory,
    _streaming_events,
)

_FEATURES = ["hour", "dow", "day"]


def _with_event_features(events: DataFrame) -> DataFrame:
    """Stateless per-event calendar features (no lags: a stream can't
    look backwards without state; stateful features belong in
    applyInPandasWithState, see streaming/stateful.py)."""
    return (
        events.withColumn("hour", F.hour("ts").cast("double"))
        .withColumn("dow", F.dayofweek("ts").cast("double"))
        .withColumn("day", F.dayofmonth("ts").cast("double"))
    )


def train_event_value_model(spark: SparkSession, events_path: str) -> PipelineModel:
    """Batch-train the value regressor the stream will apply.

    The batch leg goes through the same dtype guard as the stream leg
    (`catalog.normalize_ts`): a hard-coded ``cast('timestamp')`` would
    interpret the legacy INT64-nanos bigint flavor as epoch SECONDS and
    silently mis-train the model on garbage calendar features — and the
    stream-equals-batch parity test can't catch it because both legs
    share the fitted model (ADVICE r3)."""
    from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import (
        configure_runtime,
        normalize_ts,
    )

    configure_runtime(spark)
    batch = normalize_ts(spark.read.parquet(events_path), "ts")
    feats = _with_event_features(batch)
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=_FEATURES, outputCol="features"),
            LinearRegression(
                featuresCol="features", labelCol="value", predictionCol="prediction"
            ),
        ]
    )
    return pipe.fit(feats)


def score_events(events: DataFrame, model: PipelineModel) -> DataFrame:
    """Rounded per-event scores + exact per-type rollup (works on batch
    AND streaming inputs — same code path, the parity the test pins)."""
    scored = model.transform(_with_event_features(events)).withColumn(
        "p", F.round("prediction", 6)
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), sum_exact("p").alias("total_pred")
    )


def stream_model_scoring(
    spark: SparkSession, events_path: str, model: PipelineModel | None = None
) -> DataFrame:
    """Replay events through the fitted model; return the final scored
    rollup (complete-mode memory sink, availableNow)."""
    if model is None:
        model = train_event_value_model(spark, events_path)
    agg = score_events(_streaming_events(spark, events_path), model)
    name = f"stream_score_{uuid.uuid4().hex[:8]}"
    query = _run_to_memory(spark, agg, name, "complete")
    query.awaitTermination()
    return spark.table(name)
