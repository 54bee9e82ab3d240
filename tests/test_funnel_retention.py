"""funnel_analysis + retention_cohorts: exact fixtures and DuckDB
differentials on the real events table."""

from __future__ import annotations

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from gedixr_spark.contract_ext import load_events
from gedixr_spark.operators.events import funnel_analysis, retention_cohorts

TS0 = datetime.datetime(2024, 1, 1)


def _ev(eid, minutes, user, etype):
    return (eid, TS0 + datetime.timedelta(minutes=minutes), user, etype, 1.0)


def test_funnel_exact_fixture(spark):
    rows = [
        # user 1 completes view → click → purchase in order
        _ev(1, 0, 1, "view"), _ev(2, 5, 1, "click"), _ev(3, 9, 1, "purchase"),
        # user 2: click BEFORE view — step 2 must not count it
        _ev(4, 0, 2, "click"), _ev(5, 3, 2, "view"), _ev(6, 10, 2, "click"),
        # user 3: view only
        _ev(7, 0, 3, "view"),
        # user 4: never starts
        _ev(8, 0, 4, "purchase"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type", "value"])
    out = {r["user_id"]: r for r in funnel_analysis(df, ["view", "click", "purchase"]).collect()}
    assert set(out) == {1, 2, 3}  # user 4 never did step 0
    assert out[1]["n_steps_completed"] == 3
    assert out[2]["n_steps_completed"] == 2  # view@3 → click@10 (not @0)
    assert out[2]["ts_step_1"] == TS0 + datetime.timedelta(minutes=10)
    assert out[3]["n_steps_completed"] == 1


def test_funnel_within_window(spark):
    rows = [
        _ev(1, 0, 1, "view"), _ev(2, 200, 1, "click"),  # too late with 60min cap
        _ev(3, 0, 2, "view"), _ev(4, 30, 2, "click"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type", "value"])
    out = {
        r["user_id"]: r["n_steps_completed"]
        for r in funnel_analysis(df, ["view", "click"], within_minutes=60).collect()
    }
    assert out == {1: 1, 2: 2}
    with pytest.raises(ValueError, match=">= 2 steps"):
        funnel_analysis(df, ["view"])


def test_funnel_matches_duckdb(spark, sf_dir):
    events = load_events(spark, sf_dir)
    got = {
        r["user_id"]: (r["ts_step_0"], r["ts_step_1"], r["n_steps_completed"])
        for r in funnel_analysis(events, ["view", "purchase"]).collect()
    }
    want = {
        r[0]: (r[1], r[2], (r[1] is not None) + (r[2] is not None))
        for r in duckdb.sql(
            f"""
            WITH s0 AS (
                SELECT user_id, min(ts) AS t0 FROM '{sf_dir}/events.parquet'
                WHERE event_type = 'view' GROUP BY 1
            )
            SELECT s0.user_id, t0,
                   (SELECT min(ts) FROM '{sf_dir}/events.parquet' e
                    WHERE e.user_id = s0.user_id AND e.event_type = 'purchase'
                      AND e.ts > s0.t0) AS t1
            FROM s0
            """
        ).fetchall()
    }
    assert len(got) == len(want)
    for u, (t0, t1, n) in want.items():
        g = got[u]
        assert g[0] == t0 and g[1] == t1 and g[2] == n, (u, g, (t0, t1, n))


def test_retention_exact_fixture(spark):
    rows = [
        # cohort week of 2024-01-01: users 1,2 — user 1 returns next week
        _ev(1, 0, 1, "e"), _ev(2, 10, 2, "e"),
        _ev(3, 7 * 24 * 60, 1, "e"),
        # cohort week of 2024-01-08: user 3
        _ev(4, 7 * 24 * 60 + 5, 3, "e"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type", "value"])
    got = {
        (r["cohort"], r["period_offset"]): (r["n_active"], r["n_cohort"], r["retention_rate"])
        for r in retention_cohorts(df).collect()
    }
    w0 = datetime.datetime(2024, 1, 1)
    w1 = datetime.datetime(2024, 1, 8)
    assert got[(w0, 0)] == (2, 2, 1.0)
    assert got[(w0, 1)] == (1, 2, 0.5)
    assert got[(w1, 0)] == (1, 1, 1.0)
    assert len(got) == 3


def test_retention_matches_duckdb(spark, sf_dir):
    events = load_events(spark, sf_dir)
    got = sorted(
        (r["cohort"], r["period_offset"], r["n_active"], r["n_cohort"])
        for r in retention_cohorts(events, period="day").collect()
    )
    want = sorted(
        duckdb.sql(
            f"""
            WITH act AS (
                SELECT DISTINCT user_id, date_trunc('day', ts) AS p
                FROM '{sf_dir}/events.parquet'
            ), first AS (
                SELECT user_id, min(p) AS cohort FROM act GROUP BY 1
            ), sizes AS (
                SELECT cohort, count(*) AS n_cohort FROM first GROUP BY 1
            )
            SELECT f.cohort, cast(date_diff('day', f.cohort, a.p) AS bigint),
                   count(DISTINCT a.user_id), any_value(s.n_cohort)
            FROM act a JOIN first f USING (user_id) JOIN sizes s ON f.cohort = s.cohort
            GROUP BY 1, 2
            """
        ).fetchall()
    )
    # DuckDB's date_trunc('day') yields DATE, Spark's a midnight
    # TIMESTAMP — compare on the calendar date
    assert [(str(g[0])[:10], g[1], g[2], g[3]) for g in got] == [
        (str(w[0])[:10], w[1], w[2], w[3]) for w in want
    ]


# ------------------------------------------------- hypothesis differential

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _py_funnel(events, steps):
    """Pure-python greedy funnel: per user, earliest step-0 time, then
    earliest later occurrence of each next step."""
    out = {}
    by_user = {}
    for ts, user, etype in events:
        by_user.setdefault(user, []).append((ts, etype))
    for user, evs in by_user.items():
        t0 = min((t for t, e in evs if e == steps[0]), default=None)
        if t0 is None:
            continue
        times = [t0]
        for step in steps[1:]:
            prev = times[-1]
            if prev is None:
                times.append(None)
                continue
            nxt = min((t for t, e in evs if e == step and t > prev), default=None)
            times.append(nxt)
        out[user] = times
    return out


@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 500),  # minutes offset
            st.integers(1, 6),  # user
            st.sampled_from(["a", "b", "c", "x"]),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_funnel_matches_python_reference(spark, events):
    steps = ["a", "b", "c"]
    rows = [
        (i, TS0 + datetime.timedelta(minutes=m), u, e, 1.0)
        for i, (m, u, e) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type", "value"])
    got = {
        r["user_id"]: [r["ts_step_0"], r["ts_step_1"], r["ts_step_2"]]
        for r in funnel_analysis(df, steps).collect()
    }
    want = {
        u: [
            TS0 + datetime.timedelta(minutes=t) if t is not None else None
            for t in times
        ]
        for u, times in _py_funnel(
            [(m, u, e) for (m, u, e) in events], steps
        ).items()
    }
    assert got == want
