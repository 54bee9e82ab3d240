"""A1/A2 — filter statistics and error accounting (SURVEY.md §2.5).

The reference logs per-file ``filtered/total (pct%)`` (extract.py:334-338)
and keeps a global mutable error counter (ancillary.py:10-20). Spark-first
replacements: a grouped aggregation over a ``source_file`` column for the
per-file stats, ``df.observe`` for the global ones (no extra pass), and a
LongAccumulator for reader errors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from gedixr_spark.functions.scalar import pct
from gedixr_spark.operators.filters import quality_predicate


def filter_stats_per_file(df: DataFrame, file_col: str = "source_file") -> DataFrame:
    """Per-file quality-filter statistics: total, passed, filtered, pct
    (reference extract.py:329,334-338; format docs/quality.md:25-33) —
    one aggregation, no second scan."""
    passed = F.sum(quality_predicate().cast("long")).alias("passed")
    total = F.count(F.lit(1)).alias("total")
    return (
        df.groupBy(file_col)
        .agg(total, passed)
        .select(
            file_col,
            "total",
            "passed",
            (F.col("total") - F.col("passed")).alias("filtered"),
            pct(F.col("total") - F.col("passed"), F.col("total")).alias("pct_filtered"),
        )
    )


def observe_filter_stats(df: DataFrame, name: str = "quality_stats"):
    """Global filter stats piggybacked on the next action via
    ``df.observe`` — zero extra scans (SURVEY §7.3). Returns
    (instrumented_df, observation)."""
    obs = Observation(name)
    instrumented = df.observe(
        obs,
        F.count(F.lit(1)).alias("total"),
        F.sum(quality_predicate().cast("long")).alias("passed"),
    )
    return instrumented, obs


def error_accumulator(spark):
    """A2 — distributed error counter incremented inside reader UDFs
    (replaces the reference's mutable global, ancillary.py:10-20)."""
    return spark.sparkContext.accumulator(0)
