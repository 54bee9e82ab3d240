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


def streaming_incremental_dedup_query(
    docs: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    k: int = 8,
    bands: int = 2,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = False,
):
    """Continuous corpus dedup against a persisted signature store:
    each micro-batch runs `operators.dedup.incremental_dedup` versus
    the store, appends the surviving docs to ``out_dir``, and appends
    the survivors' SIGNATURES to the store — so batch N+1 dedups
    against everything batch N kept, across restarts, without ever
    re-reading historical text (the store carries md5 keys, minhashes
    and shingle-hash sets only).

    Per-batch slot layout (``batch=N`` subdirectories, overwritten on
    replay) makes both appends idempotent — the same exactly-once
    recipe as bronze_with_metrics_query. Within a batch, intra-batch
    duplicates are collapsed first (exact_dedup) so two copies
    arriving together can't both pass the against-history check.

    Backpressure shape at 100 TB: per batch cost = batch-size
    signatures + one band-key equi-join against the store — the store
    side is signature-width, and Spark scans only its parquet (the
    text corpus is never opened).
    """
    from gedixr_spark.operators.dedup import (
        exact_dedup,
        incremental_dedup,
        signature_store,
    )

    spark = docs.sparkSession

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        # lazy pin (r16, same move as the r15 CC-loop change): the
        # first consumer materializes the batch in its own job; every
        # later consumer reuses the pinned rows. eager=True spent a
        # dedicated job per micro-batch purely on materialization.
        batch_df = batch_df.localCheckpoint(eager=False)
        # collapse intra-batch exact duplicates to min-id survivors
        batch_local = batch_df.join(
            exact_dedup(batch_df, text_col=text_col, id_col=id_col).select(id_col),
            id_col,
            "semi",
        )
        try:
            store = spark.read.parquet(store_dir)
            has_store = True
        except Exception:
            has_store = False
        if has_store:
            decisions = incremental_dedup(
                batch_local, store, threshold=threshold, k=k, bands=bands,
                n=n, text_col=text_col, id_col=id_col, history_is_store=True,
            )
            keep_ids = decisions.filter(F.col("action") == "keep").select(id_col)
            survivors = batch_local.join(keep_ids, id_col, "semi").localCheckpoint(
                eager=False  # the write below materializes it
            )
        else:
            survivors = batch_local.localCheckpoint(eager=False)
        survivors.write.mode("overwrite").parquet(
            f"{out_dir.rstrip('/')}/batch={batch_id}"
        )
        sigs = signature_store(survivors, k=k, n=n, text_col=text_col, id_col=id_col)
        sigs.write.mode("overwrite").parquet(
            f"{store_dir.rstrip('/')}/batch={batch_id}"
        )

    writer = docs.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
