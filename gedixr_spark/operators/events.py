"""Event-time operators on the events stream table (SURVEY.md §7.4,
§2.6 note: the reference is batch-only; these are the engine's
extension surface, with Structured Streaming variants in
gedixr_spark.streaming).

Scale notes: tumbling/sliding aggs are single hash shuffles keyed by
(bucket, ...); sessionization shuffles once by user and sorts within
partitions (window functions) — the classic sessionize-at-scale plan.
Double sums go through decimal(18,2) so results are exact and
order-independent (events.value carries 2 decimals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _exact_sum(col: str):
    """Order-independent sum of a 2-decimal double: cast to decimal,
    sum exactly, return as double."""
    return F.sum(F.col(col).cast("decimal(18,2)")).cast("double")


def tumbling_agg(
    df: DataFrame, width: str = "hour", ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Tumbling-window aggregate via date_trunc bucket keys (hour/day/
    minute...): counts + exact value sum per (bucket, event_type)."""
    return (
        df.groupBy(
            F.date_trunc(width, F.col(ts_col)).alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _exact_sum(value_col).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def sliding_agg(
    df: DataFrame,
    width_minutes: int = 120,
    slide_minutes: int = 60,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Sliding windows of ``width_minutes`` every ``slide_minutes``:
    each event explodes into the ceil(width/slide) slide-aligned
    windows that contain it, then one plain hash agg — the standard
    shuffle-once sliding-window plan (generalizes the 2h/1h case).

    Window starts are slide-grid-aligned epoch instants computed in
    integer microseconds (no float rounding, engine-portable); when
    slide doesn't divide width, candidate windows that don't actually
    contain the event are filtered out before the explode."""
    if width_minutes <= 0 or slide_minutes <= 0 or width_minutes < slide_minutes:
        raise ValueError(
            f"need width >= slide > 0: width={width_minutes}, slide={slide_minutes}"
        )
    import math

    slide_us = slide_minutes * 60_000_000
    width_us = width_minutes * 60_000_000
    n = math.ceil(width_minutes / slide_minutes)
    us = F.unix_micros(F.col(ts_col))
    # grid-align via exact long modulo (NOT floor(us/slide): the double
    # quotient rounds at ~1e15 µs, off-by-one within ~1 µs of a boundary)
    base_us = us - (us % F.lit(slide_us))
    starts = [base_us - j * slide_us for j in range(n)]
    buckets = F.filter(
        F.array(*[F.timestamp_micros(s) for s in starts]),
        lambda w: us < F.unix_micros(w) + width_us,
    )
    return (
        df.select(F.explode(buckets).alias("window_start"), value_col)
        .groupBy("window_start")
        .agg(F.count(F.lit(1)).alias("n_events"), _exact_sum(value_col).alias("sum_value"))
    )


def sessionize(
    df: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to
    the previous event of the same user exceeds ``gap_minutes``.
    session_n is the per-user running count of session starts — a
    lag + cumulative-sum over one per-user sort (ties broken by
    event_id so the plan is deterministic)."""
    order = [F.col(ts_col).asc(), F.col("event_id").asc()]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    gap_s = F.col(ts_col).cast("double") - prev.cast("double")
    is_new = F.when(prev.isNull() | (gap_s > gap_minutes * 60), 1).otherwise(0)
    wsum = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_n", F.sum(is_new).over(wsum))


def session_stats(
    df: DataFrame, gap_minutes: int = 30, ts_col: str = "ts", user_col: str = "user_id"
) -> DataFrame:
    """Per-session rollup: event count, duration seconds, exact value sum."""
    s = sessionize(df, gap_minutes, ts_col, user_col)
    return s.groupBy(user_col, "session_n").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(ts_col).cast("double") - F.min(ts_col).cast("double")).alias("duration_s"),
        _exact_sum("value").alias("sum_value"),
    )


def top_users_by_activity(df: DataFrame, k: int = 10, user_col: str = "user_id") -> DataFrame:
    """Top-k users by event count (rank with deterministic id
    tie-break) — the sort/limit surface the reference lacks (§2.6)."""
    counts = df.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_events"), _exact_sum("value").alias("sum_value")
    )
    w = Window.orderBy(F.desc("n_events"), F.asc(user_col))
    return counts.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def json_props_extract(df: DataFrame, key: str = "k", props_col: str = "props") -> DataFrame:
    """Scalar JSON extraction from the props column (string JSON), as a
    typed column — the event-enrichment projection."""
    return df.withColumn(
        f"prop_{key}", F.get_json_object(F.col(props_col), f"$.{key}").cast("int")
    )
