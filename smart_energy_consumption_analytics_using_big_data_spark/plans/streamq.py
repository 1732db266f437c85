"""Streaming queries.

`q_stream_rollup` replays the events table through Structured
Streaming (availableNow) and lands on exactly the batch rollup - so it
carries a full SQL oracle, unusual for a streaming op. The watermarked
append-mode variant is covered in tests/test_streaming.py (late-data
semantics have no DuckDB analog; SURVEY.md SS2.9).
"""

from __future__ import annotations

from smart_energy_consumption_analytics_using_big_data_spark.plans._registry import DSUM, q
from smart_energy_consumption_analytics_using_big_data_spark.streaming.rollup import (
    stream_daily_rollup,
)
from smart_energy_consumption_analytics_using_big_data_spark.streaming.stateful import (
    stream_user_running_stats,
)


@q(
    "q_stream_rollup",
    "SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type, "
    "{dsum} AS total_value, count(*) AS n FROM events GROUP BY 1, 2".format(dsum=DSUM("value")),
)
def q_stream_rollup(spark, sf_dir):
    """Structured Streaming daily rollup == batch GROUP BY (A1 mirrored
    into the streaming engine; event-time tumbling window)."""
    return stream_daily_rollup(spark, f"{sf_dir}/events.parquet", window="1 day")


@q("q_stream_stateful")  # rows-only: custom state, float accumulation in pandas
def q_stream_stateful(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState): per-user
    running stats folded across micro-batches; equality with the batch
    aggregate is asserted in tests/test_streaming.py."""
    return stream_user_running_stats(spark, f"{sf_dir}/events.parquet")
