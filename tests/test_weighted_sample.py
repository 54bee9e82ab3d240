"""Weighted deterministic sampling (sampling.weighted_priority /
weighted_bottomk_sample): exact k=1 inclusion law, mergeability,
determinism, weight scaling, in-plan guard, and the
TakeOrderedAndProject plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gedixr_spark.operators.sampling import (
    weighted_bottomk_sample,
    weighted_priority,
)


@pytest.fixture(scope="module")
def items(spark):
    rows = [(i, float(1 + (i % 7))) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, w double").localCheckpoint()


def test_priority_matches_reference_formula(spark, items):
    """Priority == -ln((pmod(xxhash64(seed,id),2^53)+1)/2^53)/w,
    recomputed row-by-row in Python from Spark's own hash values."""
    got = items.select(
        "doc_id", "w",
        F.pmod(F.xxhash64(F.lit(3), F.col("doc_id")), F.lit(1 << 53)).alias("h"),
        weighted_priority("w", "doc_id", seed=3).alias("p"),
    ).collect()
    for r in got:
        u = (r["h"] + 1) / float(1 << 53)
        assert r["p"] == pytest.approx(-math.log(u) / r["w"], rel=1e-15)


def test_doubling_weight_halves_priority_exactly(spark, items):
    """-ln(u)/(2w) is exactly half of -ln(u)/w in IEEE (division by 2
    is exact) — a float-determinism invariant worth pinning."""
    both = items.select(
        weighted_priority("w", "doc_id").alias("p1"),
        weighted_priority(F.col("w") * 2, "doc_id").alias("p2"),
    ).collect()
    assert all(r["p2"] == r["p1"] / 2 for r in both)


def test_k1_inclusion_probability_is_w_over_sum(spark):
    """For k=1 the E-S scheme is EXACT: P(pick i) = w_i/Σw. Replay over
    many seeds and check the empirical pick rate tracks the weights
    (deterministic test: fixed seed set → fixed counts)."""
    df = spark.createDataFrame(
        [(0, 1.0), (1, 1.0), (2, 2.0), (3, 4.0)], "doc_id long, w double"
    ).localCheckpoint()
    picks = {i: 0 for i in range(4)}
    n_seeds = 400
    for s in range(n_seeds):
        row = weighted_bottomk_sample(df, 1, "w", seed=s).collect()[0]
        picks[row["doc_id"]] += 1
    # expected rates 1/8, 1/8, 1/4, 1/2 — allow ±40% relative slack at
    # 400 draws (σ/μ ≈ 12% for the smallest cell)
    for i, w in ((0, 1.0), (1, 1.0), (2, 2.0), (3, 4.0)):
        want = w / 8.0 * n_seeds
        assert abs(picks[i] - want) < 0.4 * want, (picks, i)


def test_mergeable_and_partition_invariant(spark, items):
    whole = sorted(
        r["doc_id"] for r in weighted_bottomk_sample(items, 20, "w").collect()
    )
    a = items.filter(F.col("doc_id") % 2 == 0)
    b = items.filter(F.col("doc_id") % 2 == 1)
    merged = weighted_bottomk_sample(
        weighted_bottomk_sample(a, 20, "w").unionByName(
            weighted_bottomk_sample(b, 20, "w")
        ),
        20, "w",
    )
    assert sorted(r["doc_id"] for r in merged.collect()) == whole
    repart = weighted_bottomk_sample(items.repartition(13), 20, "w")
    assert sorted(r["doc_id"] for r in repart.collect()) == whole


def test_nonpositive_weight_raises_in_plan(spark):
    df = spark.createDataFrame(
        [(0, 1.0), (1, 0.0)], "doc_id long, w double"
    )
    out = weighted_bottomk_sample(df, 1, "w")  # lazy — no error yet
    with pytest.raises(Exception, match="non-positive or NULL weight"):
        out.collect()


def test_plan_is_take_ordered(spark, items):
    plan = (
        weighted_bottomk_sample(items, 5, "w")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_keep_priority_column(spark, items):
    rows = weighted_bottomk_sample(
        items, 5, "w", keep_priority=True
    ).collect()
    ps = [r["priority"] for r in rows]
    assert ps == sorted(ps) and len(rows) == 5


def test_nan_weight_raises_in_plan(spark):
    df = spark.createDataFrame(
        [(0, 1.0), (1, float("nan"))], "doc_id long, w double"
    )
    with pytest.raises(Exception, match="non-positive or NULL weight"):
        weighted_bottomk_sample(df, 1, "w").collect()
