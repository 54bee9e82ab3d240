"""gapfill_locf: regular per-key grid + last-observation-carried-
forward, DuckDB-differential on the real events table."""

from __future__ import annotations

import datetime
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from gedixr_spark.operators.events import gapfill_locf


def test_gapfill_small_fixture_exact(spark):
    ts0 = datetime.datetime(2024, 1, 1)
    rows = [
        # key 1: events at hours 0 and 3 → grid 0,1,2,3; 1-2 filled
        (1, ts0, 10.0),
        (1, ts0 + datetime.timedelta(hours=3), 30.0),
        # two events in hour 3: latest (by ts) wins
        (1, ts0 + datetime.timedelta(hours=3, minutes=30), 35.0),
        # key 2: single event → one grid row
        (2, ts0 + datetime.timedelta(hours=1), 7.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r["user_id"], r["bucket"]): (r["value_locf"], r["n_events"], r["filled"])
        for r in gapfill_locf(df).collect()
    }
    h = lambda n: ts0 + datetime.timedelta(hours=n)
    assert got[(1, h(0))] == (10.0, 1, False)
    assert got[(1, h(1))] == (10.0, 0, True)
    assert got[(1, h(2))] == (10.0, 0, True)
    assert got[(1, h(3))] == (35.0, 2, False)  # latest of the two
    assert got[(2, h(1))] == (7.0, 1, False)
    assert len(got) == 5


def test_gapfill_matches_duckdb(spark, sf_dir):
    from gedixr_spark.contract_ext import load_events

    events = load_events(spark, sf_dir)
    got = sorted(
        (r["user_id"], r["bucket"], r["value_locf"], r["n_events"], r["filled"])
        for r in gapfill_locf(events, step_minutes=360).collect()
    )
    want = duckdb.sql(
        f"""
        WITH obs AS (
            SELECT user_id,
                   to_timestamp((epoch_us(ts) - epoch_us(ts) % 21600000000)
                                / 1000000)::timestamp AS bucket,
                   max_by(value, ts) AS last_value,
                   count(*) AS n_events
            FROM '{sf_dir}/events.parquet'
            GROUP BY 1, 2
        ), spans AS (
            SELECT user_id, min(bucket) lo, max(bucket) hi FROM obs GROUP BY 1
        ), grid AS (
            SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 360 MINUTE))
                   AS bucket
            FROM spans
        )
        SELECT g.user_id, g.bucket,
               last_value(o.last_value IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket
                   ROWS UNBOUNDED PRECEDING) AS value_locf,
               coalesce(o.n_events, 0) AS n_events,
               o.last_value IS NULL AS filled
        FROM grid g LEFT JOIN obs o USING (user_id, bucket)
        ORDER BY 1, 2
        """
    ).fetchall()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1], (g, w)
        assert (g[2] is None) == (w[2] is None)
        if g[2] is not None:
            assert g[2] == pytest.approx(w[2])
        assert g[3] == w[3] and g[4] == w[4]


def test_gapfill_validates(spark):
    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 1.0)],
        "user_id long, ts timestamp, value double",
    )
    with pytest.raises(ValueError, match="step_minutes"):
        gapfill_locf(df, step_minutes=0)


def test_gapfill_window_is_key_partitioned(spark, sf_dir):
    """No unpartitioned WindowExec: the LOCF window must partition by
    key (plan shows 'Window' with a partition spec containing user_id
    before the ordering)."""
    from gedixr_spark.contract_ext import load_events

    events = load_events(spark, sf_dir)
    plan = (
        gapfill_locf(events)._jdf.queryExecution().executedPlan().toString()
    )
    win_lines = [ln for ln in plan.splitlines() if "Window" in ln]
    assert win_lines
    assert all("user_id" in ln for ln in win_lines), win_lines


# ---------------------------------------------------------- rolling_stats


def test_rolling_stats_small_fixture_exact(spark):
    from gedixr_spark.operators.events import rolling_stats

    ts0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, ts0, 10.0),
        (1, ts0 + datetime.timedelta(minutes=30), 20.0),
        (1, ts0 + datetime.timedelta(minutes=61), 40.0),  # first drops out
        (2, ts0, 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r["user_id"], r["ts"]): (r["n_trailing"], r["sum_trailing"], r["mean_trailing"])
        for r in rolling_stats(df, window_minutes=60).collect()
    }
    assert got[(1, ts0)] == (1, 10.0, 10.0)
    assert got[(1, ts0 + datetime.timedelta(minutes=30))] == (2, 30.0, 15.0)
    # event at +61min: the 60-min trailing window [+1min1µs, +61min]
    # holds +30 and +61 only
    assert got[(1, ts0 + datetime.timedelta(minutes=61))] == (2, 60.0, 30.0)
    assert got[(2, ts0)] == (1, 5.0, 5.0)


def test_rolling_stats_matches_duckdb(spark, sf_dir):
    from gedixr_spark.contract_ext import load_events
    from gedixr_spark.operators.events import rolling_stats

    events = load_events(spark, sf_dir)
    got = sorted(
        (r["event_id"], r["n_trailing"], r["sum_trailing"])
        for r in rolling_stats(events, window_minutes=120).collect()
    )
    want = duckdb.sql(
        f"""
        SELECT event_id,
               count(*) OVER w AS n_trailing,
               cast(sum(cast(value AS decimal(18,2))) OVER w AS double)
                   AS sum_trailing
        FROM '{sf_dir}/events.parquet'
        WINDOW w AS (
            PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN 7199999999 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
        """
    ).fetchall()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1], (g, w)
        assert g[2] == pytest.approx(w[2])


def test_rolling_stats_validates(spark):
    from gedixr_spark.operators.events import rolling_stats

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 1.0)],
        "user_id long, ts timestamp, value double",
    )
    with pytest.raises(ValueError, match="window_minutes"):
        rolling_stats(df, window_minutes=0)


# ------------------------------------------------- rolling anomaly flags


def test_rolling_anomaly_exact_fixture(spark):
    from gedixr_spark.operators.events import rolling_anomaly_flags

    ts0 = datetime.datetime(2024, 1, 1)
    rows = [(1, ts0 + datetime.timedelta(minutes=i), 10.0 + (i % 2)) for i in range(8)]
    rows.append((1, ts0 + datetime.timedelta(minutes=8), 500.0))  # spike
    rows.append((1, ts0 + datetime.timedelta(minutes=9), 10.0))  # normal after
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        r["ts"]: (r["is_anomaly"], r["n_baseline"])
        for r in rolling_anomaly_flags(df, window_minutes=60, min_baseline=5).collect()
    }
    spike_ts = ts0 + datetime.timedelta(minutes=8)
    assert got[spike_ts][0] is True and got[spike_ts][1] == 8
    # early events lack baseline → never flagged
    for i in range(5):
        assert got[(ts0 + datetime.timedelta(minutes=i))][0] is False
    # the spike sits in the NEXT event's baseline and inflates its std,
    # so the normal event after it must not flag
    assert got[(ts0 + datetime.timedelta(minutes=9))][0] is False


def test_rolling_anomaly_matches_python_reference(spark):
    import math
    import random

    from gedixr_spark.operators.events import rolling_anomaly_flags

    random.seed(3)
    ts0 = datetime.datetime(2024, 1, 1)
    rows = [
        (random.randint(1, 3), ts0 + datetime.timedelta(minutes=m), float(random.randint(0, 40)))
        for m in range(60)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r["user_id"], r["ts"]): r["is_anomaly"]
        for r in rolling_anomaly_flags(
            df, window_minutes=15, threshold=2.0, min_baseline=3
        ).collect()
    }

    def ref_flag(user, ts, x):
        base = [
            v
            for (u, t, v) in rows
            if u == user and ts - datetime.timedelta(minutes=15) <= t < ts
        ]
        if len(base) < 3:
            return False
        m = sum(base) / len(base)
        var = max(sum(v * v for v in base) / len(base) - m * m, 0.0)
        s = math.sqrt(var)
        return s > 0 and abs(x - m) > 2.0 * s

    for (u, t, v) in rows:
        assert got[(u, t)] == ref_flag(u, t, v), (u, t, v)
