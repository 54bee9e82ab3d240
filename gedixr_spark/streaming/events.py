"""Structured Streaming variants of the event-time operators
(SURVEY.md §2.6: the reference is batch-only; this is extension
surface). Batch and streaming share semantics: the batch operators in
operators/events.py are the oracle-checkable twins.

Tested with file-source + Trigger.AvailableNow → memory sink, which
exercises the real micro-batch engine incl. watermark bookkeeping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_event_stream(spark: SparkSession, path: str, schema) -> DataFrame:
    """File-based event stream: each new parquet file in ``path`` is a
    micro-batch (the 100 TB pattern: a landing prefix fed by ingest)."""
    return spark.readStream.schema(schema).parquet(path)


def streaming_tumbling_counts(
    events: DataFrame,
    width: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window counts: late events beyond the
    watermark are dropped and window state is evicted — bounded state
    at any scale."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), width).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def streaming_sliding_counts(
    events: DataFrame,
    width: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked SLIDING-window counts + exact value sums — the
    streaming twin of operators/events.sliding_agg (same window/slide
    semantics via the built-in window(width, slide), which assigns each
    event to its ceil(width/slide) containing windows; Spark manages
    the per-window state and watermark eviction)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), width, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def streaming_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Session windows with gap timeout via the built-in session_window
    — Spark manages merge/eviction of session state with the watermark
    (the applyInPandasWithState escape hatch is only needed for custom
    session logic)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col(user_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def run_available_now(stream_df: DataFrame, query_name: str, output_mode: str = "complete") -> list:
    """Drain a file stream with Trigger.AvailableNow into a memory sink
    and return the rows — the test/verification harness for streaming
    operators. Use output_mode='append' for session windows (complete
    mode isn't supported for session aggregations)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}").collect()
