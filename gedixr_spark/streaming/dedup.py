"""Streaming deduplication — the exactly-once ingestion primitive a
continuous training-data pipeline needs (SURVEY.md §7.4 extension;
batch twins live in operators/dedup.py).

Two built-in strategies, both with bounded state:
- id dedup within a watermark (late replays beyond the watermark are
  already impossible upstream, so state evicts);
- content dedup on the md5 of normalized text, same watermark bound.

Spark's ``dropDuplicatesWithinWatermark`` handles the state lifecycle;
no custom applyInPandasWithState needed for this semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup_by_id(
    events: DataFrame, id_col: str = "event_id", ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Drop replayed events (same id) arriving within the watermark
    window — at-least-once ingest → effectively-once downstream."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark([id_col])


def streaming_dedup_by_content(
    events: DataFrame, text_col: str, ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Content-hash dedup for document streams: normalize → md5 → drop
    duplicates within the watermark. The hash column keeps state at
    ~48 B/doc regardless of document size."""
    keyed = events.withColumn(
        "__content_key",
        F.md5(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")),
    )
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__content_key"])
        .drop("__content_key")
    )
