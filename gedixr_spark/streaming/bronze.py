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
