"""Event-time window aggregations.

``F.window`` / ``F.session_window`` work identically over batch and
streaming DataFrames, so each builder here serves both modes: the registered
batch queries (queries/streaming_q.py) get DuckDB oracles, and the streaming
behavioral tests (tests/test_streaming.py) run the same builders under
readStream with watermarks.

Scale notes: windowed aggregation shuffles on (window, key) with map-side
partial aggregation; in streaming mode the watermark bounds state size — no
watermark, unbounded state, so every streaming entry point here requires one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from e2e_etl_pipeline_spark.functions.money import money_sum


def tumbling_agg(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Per (tumbling window, event_type): count + value sum."""
    return (
        events.groupBy(F.window("ts", width), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(
    events: DataFrame, width: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """Per sliding window: count + value sum (each event lands in
    width/slide windows)."""
    return (
        events.groupBy(F.window("ts", width, slide))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("sum_value"),
        )
        .select(F.col("window.start").alias("window_start"), "n_events", "sum_value")
    )


def session_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per (user, session): session bounds + event count, sessions split on
    ≥gap idle time."""
    return (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )
