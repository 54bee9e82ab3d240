"""Z-order (Morton) clustering for data-skipping writes.

Why in a training-data engine: the versioned table's log records
per-file [min, max] stats, and `read_where_all` prunes files whose
stats rule the predicate out — but pruning is only as good as the
physical clustering. A table sorted on ONE column skips perfectly on
that column and not at all on any other; interleaving the bits of
several columns' rank (the Morton / Z-order curve — Delta Lake's
`OPTIMIZE ZORDER BY`, Iceberg's `sort_order` with a z-curve) makes
every clustered dimension's per-file ranges tight SIMULTANEOUSLY, so
a conjunctive box predicate prunes multiplicatively. At 100 TB this
is the difference between scanning the table and scanning the handful
of files the log proves relevant.

Spark-first shape: `fit_zorder` is ONE aggregate job returning dim
quantile boundaries (driver state: d·2^bits floats of write-once
index metadata, the sq8/IVF codebook lifecycle). The z-key itself is
pure whole-stage-codegen column math — boundary arrays ship as one
parsed-expr plan constant each (the `_lit_fmat` single-expr
discipline; per-element `F.lit` costs ~0.7 s per 1k elements in Py4J
round-trips), bucketing is a `size(filter(...))` fold over the
boundary array, interleave is d·bits shift/AND/OR terms. The cluster
write is `repartitionByRange(n_files, z)` (distributed range sort —
Spark samples split points; no single-task global sort) +
`sortWithinPartitions`, so each output file holds one contiguous
z-range.

Quantile bucketing rather than the raw value range: equal-mass
buckets keep the curve balanced under skewed value distributions,
where equal-width buckets collapse most rows into a few z-cells and
pruning degrades to single-column quality. The equal-WIDTH twin for
raw (non-versioned) parquet directories is
`operators/layout.py::zorder_index_columns` / `write_zordered_columns`
— this module deliberately implements only the quantile curve so the
repo has exactly one of each.

No reference counterpart; §7.4 extension surface (lakehouse layout
optimization, the Delta/Iceberg pattern).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gedixr_spark.operators.similarity import _lit_fmat


def _boundary_lit(values: list[float]) -> Column:
    # 1-D float plan constant via the single-expr discipline
    return F.element_at(_lit_fmat([values]), 1)


def fit_zorder(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    accuracy: int = 10_000,
) -> dict:
    """Learn per-column equal-mass bucket boundaries in ONE aggregate
    job: 2^bits − 1 interior quantiles per column (skew-robust — the
    exponential/Zipf columns real corpora have would collapse an
    equal-width grid). Driver state is the boundary lists only —
    write-once index metadata, persisted by the caller alongside the
    table so later appends reuse the SAME curve (a re-fitted curve on
    new data would shear old vs new files apart)."""
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError("z-ordering needs >= 2 columns (sort for 1)")
    if bits < 1 or bits * len(cols) > 63:
        raise ValueError(
            f"bits*len(cols) must fit a signed long: {bits}*{len(cols)}"
        )
    n_b = (1 << bits) - 1
    probs = [i / float(1 << bits) for i in range(1, n_b + 1)]
    parr = _boundary_lit(probs)
    aggs = [
        F.percentile_approx(F.col(c).cast("double"), parr, F.lit(accuracy)).alias(c)
        for c in cols
    ]
    row = df.agg(*aggs).collect()[0]
    bounds = {}
    for c in cols:
        v = row[c]
        if v is None or any(x is None for x in v):
            raise ValueError(f"fit_zorder: column {c} is empty/all-NULL")
        bounds[c] = [float(x) for x in v]
    return {"bits": bits, "cols": cols, "bounds": bounds}


def _bucket(col: str, params: dict) -> Column:
    """Equal-mass bucket index in [0, 2^bits) as a long — count of
    boundaries <= x, an O(2^bits) fold per row inside whole-stage
    codegen. NULLs land in bucket 0 (they sort first; the exact filter
    in read_where drops them anyway)."""
    x = F.col(col).cast("double")
    bnds = _boundary_lit(params["bounds"][col])
    idx = F.size(F.filter(bnds, lambda b: b <= x)).cast("long")
    return F.when(x.isNull(), F.lit(0).cast("long")).otherwise(idx)


def _spread(bucket: Column, i: int, d: int, bits: int) -> Column:
    """Spread ``bucket``'s bits to positions k·d + (d−1−i). The
    single-element `aggregate` binds the bucket expression to a lambda
    variable ONCE — without it each of the ``bits`` shift terms would
    inline its own copy of the O(2^bits)-literal bucket fold into the
    plan (bits× plan bloat and redundant evaluation)."""

    def body(acc: Column, b: Column) -> Column:
        z = acc
        for k in range(bits):
            bit = F.shiftright(b, k).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, k * d + (d - 1 - i)))
        return z

    return F.aggregate(F.array(bucket), F.lit(0).cast("long"), body)


def zorder_key(params: dict) -> Column:
    """Morton-interleaved key over the fitted columns: bit k of column
    i lands at position k·d + (d−1−i), so successive bits cycle
    through the dimensions (column 0 most significant within each
    group). d·bits shift/AND/OR terms, all JVM integer ops; each
    column's bucket fold appears exactly once in the plan."""
    cols, bits = params["cols"], params["bits"]
    d = len(cols)
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        z = z.bitwiseOR(_spread(_bucket(c, params), i, d, bits))
    return z


def cluster_by_zorder(
    df: DataFrame, params: dict, n_partitions: int
) -> DataFrame:
    """Physically cluster ``df`` along the fitted z-curve:
    `repartitionByRange` on the z-key (distributed sample-based range
    split — never a single-task global sort) + an in-partition sort,
    so every output partition (→ data file, via the versioned table's
    partition-per-file write) covers one contiguous z-range and its
    per-column [min, max] stats are tight in EVERY clustered
    dimension."""
    if n_partitions < 1:
        raise ValueError("n_partitions must be >= 1")
    key = "__zorder"
    out = (
        df.withColumn(key, zorder_key(params))
        .repartitionByRange(n_partitions, F.col(key))
        .sortWithinPartitions(key)
    )
    return out.drop(key)


def append_clustered(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    n_files: int = 16,
    params: dict | None = None,
    stats_cols: Sequence[str] | None = None,
    **commit_kw,
) -> dict:
    """Z-order-clustered append to a versioned table: fit (or reuse)
    the curve, cluster, commit with per-file stats on the clustered
    columns — the write path that makes `read_where_all`'s
    multi-column pruning actually bite. Returns the commit entry;
    pass the fitted ``params`` back in for later appends so the whole
    table shares one curve."""
    from gedixr_spark.sinks.versioned import commit_append

    p = params if params is not None else fit_zorder(df, cols, bits)
    clustered = cluster_by_zorder(df, p, n_files)
    sc = sorted(set(list(stats_cols or [])) | set(p["cols"]))
    return commit_append(spark, path, clustered, stats_cols=sc, **commit_kw)
