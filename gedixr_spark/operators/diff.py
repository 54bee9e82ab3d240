"""Table diffing and content fingerprinting — the validation side of
the CDC/compaction machinery (sinks/merge.py, layout.py): after a
merge, a backfill, or an engine migration, "did the table change, and
HOW?" must be answerable without eyeballing row dumps.

Both operators are order-independent by construction, because parquet
gives no row-order guarantees and a compaction legitimately reorders
everything: the fingerprint combines per-row hashes with a commutative
reduction, and the diff is keyed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_fingerprint(df: DataFrame, cols: Sequence[str] | None = None) -> dict:
    """Order-independent content fingerprint: {n_rows, fingerprint}.

    Per-row xxhash64 over the selected columns (column order fixed by
    sorting names, so projection order can't change the result),
    combined with bit_xor + an exact sum — both commutative and
    associative, so ANY partitioning/ordering of the same multiset of
    rows fingerprints identically, and any single-row change flips it
    with overwhelming probability. One scan, map-side combined, 3
    longs of driver state.

    Caveat (and why two combiners): xor alone is blind to an even
    number of copies of the same row; carrying the exact sum as well
    closes that hole for duplicate-count changes.
    """
    use = sorted(cols or df.columns)
    h = F.xxhash64(*[F.col(c) for c in use])
    # the sum accumulates in decimal(38,0): a long sum of 64-bit hashes
    # overflows under ANSI mode; decimal38 holds ~1e19 rows' worth and
    # the driver folds it back to 64 bits
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(h).alias("x"),
        F.sum(h.cast("decimal(38,0)")).alias("s"),
    ).collect()[0]
    return {
        "n_rows": row["n"],
        "fingerprint": f"{(row['x'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}"
        f"{int(row['s'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}",
    }


def table_diff(
    old: DataFrame, new: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Keyed diff: one row per key present in either table, classified
    ``added`` / ``removed`` / ``changed`` (same key, any non-key column
    differs by xxhash64) — ``unchanged`` rows are dropped, so the
    output is delta-sized, not table-sized.

    One full-outer join on the keys; non-key payloads travel as ONE
    hash each, never the actual columns — at 100 TB the shuffle
    carries keys + 8-byte digests. Row-count asserts (e.g. "this CDC
    batch should have changed exactly N rows") read the result's
    ``op`` histogram."""
    if not keys:
        raise ValueError("table_diff needs at least one key column")
    payload = [c for c in old.columns if c not in keys]
    if sorted(old.columns) != sorted(new.columns):
        raise ValueError(
            f"schemas differ: {sorted(old.columns)} vs {sorted(new.columns)}"
        )
    digest = F.xxhash64(*[F.col(c) for c in sorted(payload)]) if payload else F.lit(0)
    o = old.select(*keys, digest.alias("__old_h"))
    n = new.select(*keys, digest.alias("__new_h"))
    joined = o.join(n, on=list(keys), how="full_outer")
    op = (
        F.when(F.col("__old_h").isNull(), "added")
        .when(F.col("__new_h").isNull(), "removed")
        .when(F.col("__old_h") != F.col("__new_h"), "changed")
    )
    return (
        joined.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(*keys, "op")
    )
