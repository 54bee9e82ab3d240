"""Global plan audit: EVERY registry query's physical plan is checked
for the anti-patterns the 100 TB brief forbids —

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin``: quadratic plans.
  Allowlisted only for the two documented broadcast baselines
  (cosine_topk's broadcast cross, tf-idf's 1-row total) and queries
  that build on them.
- ``BatchEvalPython``: a row-at-a-time Python UDF — the engine is
  Arrow-only by policy (ArrowEvalPython / MapInPandas are fine).
- per-plan Exchange budget: a registry query whose plan suddenly grows
  beyond its recorded shuffle budget is a regression even if results
  stay right. Budgets are generous ceilings, not exact counts, so
  AQE/planner drift doesn't false-alarm — but a new quadratic or
  double-shuffle sneaks past nobody.

This runs every plan at sf0.001 WITHOUT executing the queries (plan
build only — the iterative drivers like kmeans/bpe do run their small
driver loops)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

# documented broadcast-baseline queries (quadratic BY DESIGN, guarded
# upstream): brute-force cosine ground truth + the tf-idf corpus-total
# broadcast; ngram_jaccard_pairs is the guarded verification twin
NESTED_LOOP_ALLOWED = {
    "ann_suite",  # brute leg = similarity.py:79 broadcast(q) crossJoin
    # baseline (r8: cosine_topk folded into the labeled union)
    "term_rankings",  # text.py:140 1-row corpus total broadcast
    "pq_ann_topk",  # similarity.py pq_ann_topk: broadcast(queries) ADC
    # scan over the (64×-smaller) code table with a != self predicate —
    # the classic flat-ADC layout; the cell-restricted escape is
    # ivf_pq_ann_topk
    "sq8_ann_topk",  # similarity.py sq8_topk: broadcast(queries) over
    # the 8×-compressed code scan — the SQ8 flat-ADC baseline; bucket/
    # cell-restricted search composes via ivf/lsh on the same codes
    "bq_ann_topk",  # similarity.py bq_ann_topk: broadcast(queries)
    # Hamming scan over the 32×-compressed packed codes — the binary
    # flat baseline (linear in the corpus, one scan); the exact rerank
    # touches shortlist·k rows only
    "hybrid_search",  # contract_ext.q_hybrid_search dense leg:
    # cosine_topk with a 3-row broadcast query side over one corpus
    # scan — linear in the corpus, not quadratic; the lexical leg and
    # the fusion are shuffle-only
    "contrastive_triplets",  # mining.py: anchors × BOUNDED broadcast
    # pool (pool_size rows, corpus-independent) — quadratic only in
    # |anchors|·pool_size by construction
    "bm25_search",  # text.py bm25_topk: 1-row (N, avgdl) corpus-stats
    # broadcast — the r15 in-plan replacement for the driver collect;
    # same shape as term_rankings' corpus total
    "pagerank",  # graph.py pagerank fixed-iteration mode: 1-row
    # dangling-mass broadcast per round rides the node-keyed update
    # join (r15 in-plan replacement for the per-round collect); the
    # visible plan is the LAST round's update over checkpoint leaves
}

# hard ceiling on SHUFFLE-exchange count per query plan (broadcast
# exchanges ship dims/bitsets and are excluded; ReusedExchange is
# bookkeeping). Worst honest plan today: incremental_dedup at 12 (the
# 3-decision-branch union re-derives signatures per branch)
MAX_EXCHANGES = 14


def _shuffle_exchanges(plan: str) -> int:
    import re

    return len(re.findall(r"(?<!Reused)Exchange (hash|range|Single)", plan))


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, fn in entry.queries().items():
        df = fn(spark, SF_DIR)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_undocumented_nested_loop_or_cartesian(plans):
    offenders = {
        name
        for name, plan in plans.items()
        if ("CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan)
        and name not in NESTED_LOOP_ALLOWED
    }
    assert not offenders, (
        f"quadratic join shape appeared in: {sorted(offenders)} — either fix "
        "the plan or consciously add to NESTED_LOOP_ALLOWED with a docstring "
        "guard upstream"
    )


def test_no_row_at_a_time_python_udf_anywhere(plans):
    offenders = {name for name, plan in plans.items() if "BatchEvalPython" in plan}
    assert not offenders, (
        f"row-at-a-time Python UDF (BatchEvalPython) in: {sorted(offenders)} — "
        "use pandas_udf/mapInPandas (ArrowEvalPython) instead"
    )


def test_exchange_budget_per_query(plans):
    over = {
        name: _shuffle_exchanges(plan)
        for name, plan in plans.items()
        if _shuffle_exchanges(plan) > MAX_EXCHANGES
    }
    assert not over, (
        f"plans exceeding the {MAX_EXCHANGES}-Exchange ceiling: {over} — "
        "audit for redundant shuffles before raising the ceiling"
    )


def test_allowlist_is_not_stale(plans):
    """Every allowlisted query must still HAVE the nested-loop shape —
    otherwise the allowlist silently rots into a blanket waiver."""
    stale = {
        name
        for name in NESTED_LOOP_ALLOWED
        if "CartesianProduct" not in plans[name]
        and "BroadcastNestedLoopJoin" not in plans[name]
    }
    assert not stale, f"allowlisted but no longer nested-loop: {sorted(stale)}"
