"""Keyed upsert (MERGE) into a plain-parquet table with partition
pruning — the CDC/ingest primitive a 100 TB pipeline needs when no
transactional table format is available.

Semantics are MERGE WHEN MATCHED THEN UPDATE (full-row replace) WHEN
NOT MATCHED THEN INSERT: target rows whose key appears in the updates
batch are replaced, everything else is carried, new keys are appended.

The scale story is the partition prune: with a ``partition_col``, only
the partitions the updates batch actually touches are read, anti-joined
and rewritten to a staging dir, then swapped in with per-partition
directory renames — every other partition's files are physically
untouched (asserted by mtime in test_merge_upsert). A daily-partitioned
100 TB table taking a 1-partition CDC batch rewrites ~1/N of the data
instead of all of it. The touched-partition list comes from a
driver-side distinct over the updates batch — batch-partition-count
rows, never data-scale. Partition values must round-trip through
Hive-style ``col=value`` path encoding (ints/plain strings/ISO dates);
values needing URL-escaping are out of scope.

Unpartitioned targets fall back to a staged full rewrite with a
FileSystem-rename swap (read and overwrite of the SAME path in one
plan is a lazy-read footgun — Spark would delete the files before the
scan runs; the stage-then-swap avoids it).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gedixr_spark.operators.layout import _hadoop_fs


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: Sequence[str],
    partition_col: str | None = None,
) -> dict:
    """Upsert ``updates`` into the parquet table at ``target_path`` by
    ``keys``. Returns {touched_partitions, n_upserted}. The updates
    batch must carry the target's full schema (full-row replace)."""
    if not keys:
        raise ValueError("merge_upsert needs at least one key column")
    target = spark.read.parquet(target_path)
    missing = [c for c in target.columns if c not in updates.columns]
    if missing:
        raise ValueError(
            f"updates batch is missing target columns {missing} — merge is "
            "full-row replace, partial-column updates need a pre-join"
        )
    updates = updates.select(*target.columns)  # align column order
    n_upserted = updates.count()
    # a batch with two rows for one key would land BOTH (the anti-join
    # removes the old row; the union appends every update row) —
    # silent duplication. Real CDC compacts the batch first (last
    # write wins by its own ordering); enforce that contract here.
    n_keys = updates.select(*keys).distinct().count()
    if n_keys != n_upserted:
        raise ValueError(
            f"updates batch has {n_upserted} rows but {n_keys} distinct "
            f"keys — compact the batch to one row per key (last-write-"
            "wins by your CDC ordering) before merge_upsert"
        )

    if partition_col is not None:
        if partition_col in keys:
            raise ValueError(
                f"partition_col {partition_col!r} must not be a merge key "
                "(a key that moves partitions would duplicate itself)"
            )
        touched = [
            r[0] for r in updates.select(partition_col).distinct().collect()
        ]
        # read ONLY touched partitions; the filter prunes at the
        # partition-directory level before any file is opened
        kept = target.filter(F.col(partition_col).isin(touched)).join(
            updates.select(*keys).distinct(), on=list(keys), how="left_anti"
        )
        merged = kept.unionByName(updates)
        # stage first: writing into the partitions the plan is lazily
        # READING would delete the inputs mid-scan. The staged result
        # is swapped in with one (delete, rename) metadata-op pair per
        # touched partition directory — untouched partitions' files are
        # never opened, written, or moved.
        staging = target_path.rstrip("/") + ".__merging"
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(staging)
        fs, _ = _hadoop_fs(spark, target_path)
        jpath = spark._jvm.org.apache.hadoop.fs.Path
        for v in touched:
            part_dir = f"{partition_col}={v}"
            jdst = jpath(f"{target_path.rstrip('/')}/{part_dir}")
            jsrc = jpath(f"{staging}/{part_dir}")
            fs.delete(jdst, True)
            if not fs.rename(jsrc, jdst):
                raise IOError(
                    f"rename {part_dir} into {target_path} failed; staged "
                    f"data remains at {staging}"
                )
        fs.delete(jpath(staging), True)
        return {"touched_partitions": sorted(touched), "n_upserted": n_upserted}

    # unpartitioned: staged rewrite + rename swap
    kept = target.join(updates.select(*keys).distinct(), on=list(keys), how="left_anti")
    merged = kept.unionByName(updates)
    staging = target_path.rstrip("/") + ".__merging"
    merged.write.mode("overwrite").parquet(staging)
    fs, jtarget = _hadoop_fs(spark, target_path)
    jstaging = spark._jvm.org.apache.hadoop.fs.Path(staging)
    fs.delete(jtarget, True)
    if not fs.rename(jstaging, jtarget):
        raise IOError(f"rename {staging} -> {target_path} failed; data is at {staging}")
    return {"touched_partitions": None, "n_upserted": n_upserted}
