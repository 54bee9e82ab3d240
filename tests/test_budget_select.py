"""Distributed prefix sum (sampling.running_total) and
budget-constrained corpus selection (sampling.budget_select):
equivalence to the single-task global window, tie handling, boundary
degeneracy, and the no-single-partition-exchange plan guarantee."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gedixr_spark.operators.sampling import budget_select, running_total


@pytest.fixture(scope="module")
def docs(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, rng.randint(1, 50), rng.choice([0.1, 0.25, 0.25, 0.5, 0.9]))
        for i in range(500)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, n_tokens int, score double"
    ).repartition(8).localCheckpoint()


def _global_running(df, descending=True):
    s = F.col("score")
    w = (
        Window.orderBy(s.desc() if descending else s.asc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("want", F.sum("n_tokens").over(w))


@pytest.mark.parametrize("descending", [True, False])
@pytest.mark.parametrize("n_buckets", [1, 4, 64])
def test_running_total_equals_global_window(spark, docs, descending, n_buckets):
    got = running_total(
        docs, "n_tokens", "score",
        descending=descending, n_buckets=n_buckets,
    )
    want = _global_running(docs, descending)
    joined = got.join(want.select("doc_id", "want"), "doc_id")
    bad = joined.filter(F.col("running_total") != F.col("want")).count()
    assert bad == 0


def test_running_total_constant_score_degenerates_safely(spark):
    df = spark.createDataFrame(
        [(i, 10, 1.0) for i in range(100)],
        "doc_id long, n_tokens int, score double",
    )
    got = {
        r["doc_id"]: r["running_total"]
        for r in running_total(df, "n_tokens", "score").collect()
    }
    assert got == {i: (i + 1) * 10 for i in range(100)}


@pytest.mark.parametrize("budget", [0, 37, 1000, 10**9])
def test_budget_select_is_exact_prefix(spark, docs, budget):
    got = sorted(
        r["doc_id"] for r in budget_select(
            docs, budget, cost_col="n_tokens", score_col="score"
        ).collect()
    )
    want_rows = _global_running(docs).collect()
    want = sorted(r["doc_id"] for r in want_rows if r["want"] <= budget)
    assert got == want
    if budget == 10**9:
        assert len(got) == docs.count()  # budget >= total keeps all


def test_budget_select_deterministic_under_partitioning(spark, docs):
    a = budget_select(docs, 500, "n_tokens", "score")
    b = budget_select(
        docs.repartition(17, "n_tokens"), 500, "n_tokens", "score"
    )
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )


def test_no_single_partition_exchange_in_plan(spark, docs):
    """The whole point: the prefix sum must never funnel the CORPUS
    through one task. The row-bearing window must partition by bucket,
    and the only SinglePartition exchange allowed is the one over the
    ≤ n_buckets-row totals aggregate that computes the in-plan bucket
    offsets (r15: the ungrouped offsets moved from a driver collect to
    this window — a bookkeeping frame, not the corpus)."""
    out = running_total(docs, "n_tokens", "score", n_buckets=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    singles = [i for i, ln in enumerate(lines) if "Exchange SinglePartition" in ln]
    assert len(singles) == 1, plan
    # the funnel sits over the per-bucket totals aggregate only
    assert "HashAggregate(keys=[__bucket" in lines[singles[0] + 1], plan
    # the corpus window itself stays bucket-partitioned
    assert any(
        "Window [sum(n_tokens" in ln and ", [__bucket" in ln for ln in lines
    ), plan


def test_budget_select_validates(spark, docs):
    with pytest.raises(ValueError, match="budget must be"):
        budget_select(docs, -1, "n_tokens", "score")
    with pytest.raises(ValueError, match="tiebreak column"):
        running_total(docs, "n_tokens", "score", tiebreak="nope")


def test_keep_running_column(spark, docs):
    out = budget_select(
        docs, 400, "n_tokens", "score", keep_running=True
    )
    rows = out.orderBy(F.desc("score"), "doc_id").collect()
    assert all(r["running_n_tokens"] <= 400 for r in rows)
    # running column really is the inclusive prefix sum
    acc = 0
    for r in rows:
        acc += r["n_tokens"]
        assert r["running_n_tokens"] == acc


@pytest.fixture(scope="module")
def grouped_docs(spark):
    import random

    rng = random.Random(11)
    # one hot group holding ~80% of rows — the skew case the grouped
    # prefix must survive without a single-task window
    rows = []
    for i in range(600):
        g = "en" if rng.random() < 0.8 else rng.choice(["de", "fr"])
        rows.append((i, g, rng.randint(1, 40), rng.random()))
    return spark.createDataFrame(
        rows, "doc_id long, lang string, n_tokens int, score double"
    ).repartition(8).localCheckpoint()


def test_grouped_running_total_equals_per_group_window(spark, grouped_docs):
    got = running_total(
        grouped_docs, "n_tokens", "score", group_cols=["lang"], n_buckets=16
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("score"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = grouped_docs.withColumn("want", F.sum("n_tokens").over(w))
    bad = (
        got.join(want.select("doc_id", "want"), "doc_id")
        .filter(F.col("running_total") != F.col("want"))
        .count()
    )
    assert bad == 0


def test_grouped_budget_select_caps_every_group(spark, grouped_docs):
    out = budget_select(
        grouped_docs, 300, "n_tokens", "score",
        group_cols=["lang"], keep_running=True,
    ).collect()
    per_group_max = {}
    for r in out:
        per_group_max[r["lang"]] = max(
            per_group_max.get(r["lang"], 0), r["running_n_tokens"]
        )
    assert per_group_max and all(v <= 300 for v in per_group_max.values())
    # every group got an independent quota (hot group not starved,
    # small groups not over-served)
    assert set(per_group_max) == {"en", "de", "fr"}


def test_grouped_plan_splits_hot_group_across_buckets(spark, grouped_docs):
    """The window must partition by (group, bucket), not group alone:
    with n_buckets=16 the hot 'en' group spreads over many window
    partitions. Assert via the plan's window partition spec."""
    out = running_total(
        grouped_docs, "n_tokens", "score", group_cols=["lang"], n_buckets=16
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "__bucket" in plan  # bucket really is part of the partition key


def test_negative_or_null_cost_raises_in_plan(spark):
    df = spark.createDataFrame(
        [(0, 5, 1.0), (1, -2, 0.5)], "doc_id long, n_tokens int, score double"
    )
    # running_total's stats jobs run at composition, so the in-plan
    # guard fires as soon as budget_select touches the data
    with pytest.raises(Exception, match="negative or NULL"):
        budget_select(df, 100, "n_tokens", "score").collect()
    df2 = spark.createDataFrame(
        [(0, 5, 1.0), (1, None, 0.5)],
        "doc_id long, n_tokens int, score double",
    )
    with pytest.raises(Exception, match="negative or NULL"):
        budget_select(df2, 100, "n_tokens", "score").collect()


def test_high_cardinality_groups_stay_distributed(spark):
    """r8 VERDICT #3: grouped offsets used to collect O(|groups| *
    n_buckets) rows to the driver and fold them in Python — a caller
    passing an unbounded group column (per-domain quotas over millions
    of domains) silently materialized them all. The offsets are now an
    exclusive-cumsum window over the (still-distributed) totals frame.
    Pin correctness at 3000 distinct groups and assert the plan shape:
    no Scan ExistingRDD (the signature a driver-built rows list leaves
    in the plan) anywhere in the offsets side."""
    df = (
        spark.range(9000)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("domain_"), F.col("id") % 3000).alias("dom"),
            (F.pmod(F.hash("id"), F.lit(20)) + 1).cast("int").alias("n_tokens"),
            (F.pmod(F.hash("id", F.lit(1)), F.lit(10_000)) / 10_000.0).alias(
                "score"
            ),
        )
        .repartition(8)
    )
    got = running_total(
        df, "n_tokens", "score", group_cols=["dom"], n_buckets=8
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan and "LocalTableScan" not in plan
    # r9 VERDICT #3: the offsets join must NOT be hint-forced to
    # broadcast — at millions of groups that builds a multi-GB driver
    # relation. Assert the STATIC (pre-AQE) plan shuffles: with no
    # hint Catalyst can't know off_df's size (it's behind an agg +
    # window) and plans a sort-merge join; AQE may still upgrade the
    # small case to broadcast at runtime, which is exactly the intent.
    logical = got._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in logical
    w = (
        Window.partitionBy("dom")
        .orderBy(F.desc("score"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("want", F.sum("n_tokens").over(w))
    bad = (
        got.join(want.select("doc_id", "want"), "doc_id")
        .filter(F.col("running_total") != F.col("want"))
        .count()
    )
    assert bad == 0


def test_unbounded_groups_plan_shuffles_offsets_join(spark):
    """r9 VERDICT #4: the offsets join must not be hint-forced to
    broadcast — at millions of groups the hint builds a multi-GB
    relation on the driver. Plan-only check (boundaries supplied so no
    job runs): at 50M distinct groups Catalyst's size estimate rules
    out a static broadcast and the offsets join shuffles; AQE may still
    upgrade genuinely small frames at runtime, which is the intent."""
    df = spark.range(200_000_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("domain_"), F.col("id") % 50_000_000).alias("dom"),
        (F.pmod(F.hash("id"), F.lit(20)) + 1).cast("int").alias("n_tokens"),
        (F.pmod(F.hash("id", F.lit(1)), F.lit(10_000)) / 10_000.0).alias(
            "score"
        ),
    )
    got = running_total(
        df, "n_tokens", "score", group_cols=["dom"], n_buckets=8,
        boundaries=[0.2, 0.4, 0.6, 0.8],
    )
    qe = got._jdf.queryExecution()
    assert "ResolvedHint" not in qe.optimizedPlan().toString()
    plan = qe.executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
