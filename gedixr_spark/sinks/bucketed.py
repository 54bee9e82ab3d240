"""Bucketed table writes — pre-shuffled storage layout for co-located,
shuffle-free joins and aggregations.

At 100 TB the single biggest join cost is the exchange: joining the
corpus to its signature store, the L2A table to L2B, or events to a
user dimension shuffles BOTH sides every run. Bucketing pays that
shuffle ONCE at write time: ``bucketBy(n, keys)`` hash-partitions rows
into a fixed number of files per partition, records the layout in the
catalog, and every later equi-join or groupBy on the bucket keys reads
both sides co-located — Spark plans a SortMergeJoin with NO Exchange
on bucketed sides (``spark.sql.sources.bucketing.enabled``, on by
default). This is the storage-level twin of the runtime
``repartition``: pay once, reuse every query.

Rules the helpers below encode:
- both join sides need the SAME bucket count (or a multiple, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``) on the SAME
  keys;
- bucket count is a write-time commitment: pick ~(table size /
  target partition size); at 100 TB and 256 MB targets that is
  O(100k) buckets — set it per table, not globally;
- Spark's bucketing needs ``saveAsTable`` (the catalog carries the
  bucket spec; a bare ``parquet(path)`` write silently drops it).

Reference parity note: the reference (single-process pandas) has no
storage-layout concept at all; this module is pure engine-level scale
surface (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str] | str,
    n_buckets: int,
    sort_keys: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted-within-bucket)
    managed table. ``sort_keys`` additionally sorts rows inside each
    bucket file — with both sides bucketed AND sorted on the join keys,
    the join needs neither Exchange NOR Sort (merge directly on the
    sorted bucket streams)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort_keys is not None:
        sort_keys = [sort_keys] if isinstance(sort_keys, str) else list(sort_keys)
        w = w.sortBy(*sort_keys)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the
    catalog, so joins/aggs on the bucket keys skip their Exchange)."""
    return spark.table(table)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange — the
    assertion helper tests use to prove bucketing removed it."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "Exchange rangepartitioning" in plan
