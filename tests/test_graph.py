"""PageRank: numpy power-iteration differential, dangling mass,
teleport, determinism, degenerate graphs."""

from __future__ import annotations

import numpy as np
import pytest

from gedixr_spark.operators.graph import pagerank


def _numpy_pagerank(edges, n_iter=10, d=0.85):
    nodes = sorted({u for u, v in edges} | {v for u, v in edges})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    out = {u: 0 for u in nodes}
    for u, v in set(edges):
        out[u] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        nxt = np.full(n, (1 - d) / n)
        dangling = sum(r[idx[u]] for u in nodes if out[u] == 0)
        nxt += d * dangling / n
        for u, v in set(edges):
            nxt[idx[v]] += d * r[idx[u]] / out[u]
        r = nxt
    return {u: r[idx[u]] for u in nodes}


def test_pagerank_matches_numpy_power_iteration(spark):
    rng = np.random.default_rng(5)
    edges = list(
        {(int(rng.integers(0, 30)), int(rng.integers(0, 30))) for _ in range(120)}
    )
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=8).collect()}
    want = _numpy_pagerank(edges, n_iter=8)
    assert set(got) == set(want)
    for u in want:
        assert got[u] == pytest.approx(want[u], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_dangling_mass_is_conserved(spark):
    # chain into a sink: 0→1→2; node 2 has no out-edges
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=20).collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got[2] > got[1] > got[0]  # rank accumulates down the chain


def test_authority_ordering(spark):
    # hub pattern: everyone links to 9
    df = spark.createDataFrame(
        [(i, 9) for i in range(9)] + [(9, 0)], "src long, dst long"
    )
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=15).collect()}
    assert got[9] == max(got.values())
    assert got[0] > got[1]  # 0 gets 9's endorsement


def test_duplicate_edges_count_once_and_bad_damping(spark):
    df1 = spark.createDataFrame([(0, 1), (0, 1), (1, 0)], "src long, dst long")
    df2 = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    g1 = {r["node"]: r["rank"] for r in pagerank(df1, n_iter=5).collect()}
    g2 = {r["node"]: r["rank"] for r in pagerank(df2, n_iter=5).collect()}
    assert g1 == g2
    with pytest.raises(ValueError, match="damping"):
        pagerank(df2, damping=1.5)


def test_tol_early_stop_matches_converged_ranks(spark):
    """tol stops iteration once the L1 delta is tiny; the result
    matches a long fixed-iteration run to the tolerance."""
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (0, 2)], "src long, dst long"
    )
    fixed = {r["node"]: r["rank"] for r in pagerank(df, n_iter=40).collect()}
    early = {
        r["node"]: r["rank"]
        for r in pagerank(df, n_iter=40, tol=1e-10).collect()
    }
    assert set(early) == set(fixed)
    for u in fixed:
        assert early[u] == pytest.approx(fixed[u], abs=1e-8)
    assert sum(early.values()) == pytest.approx(1.0, abs=1e-9)


def _count_jobs(spark, group, fn):
    sc = spark.sparkContext
    sc.setLocalProperty("spark.jobGroup.id", group)
    try:
        fn()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    return len(sc.statusTracker().getJobIdsForGroup(group))


def test_tol_mode_adds_no_extra_jobs_per_round(spark):
    """r6 VERDICT #4: the L1 convergence delta rides the SAME
    per-round scalar-reduction job as the dangling mass — tol mode
    (non-converging, so every round runs) fires exactly as many Spark
    jobs as fixed-iteration mode."""
    rng = np.random.default_rng(11)
    edges = list(
        {(int(rng.integers(0, 40)), int(rng.integers(0, 40))) for _ in range(150)}
    )
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src long, dst long")
    fixed = _count_jobs(
        spark, "pr-fixed", lambda: pagerank(df, n_iter=4).collect()
    )
    # tol far below reachable: no early stop, all 4 rounds run
    tolled = _count_jobs(
        spark, "pr-tol", lambda: pagerank(df, n_iter=4, tol=1e-300).collect()
    )
    assert tolled == fixed, (fixed, tolled)


def test_fixed_mode_in_plan_scalar_matches_collect_path(spark):
    """r15 optimization: fixed-iteration mode keeps the dangling-mass
    scalar IN-PLAN (one-row broadcast, zero per-round collects) while
    tol mode still collects it for the early-stop decision. Both build
    the same double expression tree, so ranks must be BIT-identical
    (tol far below reachable: all rounds run in both modes)."""
    rng = np.random.default_rng(17)
    edges = list(
        {(int(rng.integers(0, 50)), int(rng.integers(0, 50))) for _ in range(200)}
    )
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src long, dst long")
    fixed = {r["node"]: r["rank"] for r in pagerank(df, n_iter=5).collect()}
    tolled = {
        r["node"]: r["rank"]
        for r in pagerank(df, n_iter=5, tol=1e-300).collect()
    }
    assert fixed == tolled


def _brute_triangles(edge_list):
    """Reference: count triangles per node by set intersection."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edge_list:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    per = defaultdict(int)
    seen = set()
    for a in adj:
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    tri = (a, b, c)
                    if tri not in seen:
                        seen.add(tri)
                        for n in tri:
                            per[n] += 1
    return dict(per)


def test_triangle_count_matches_brute_force(spark):
    import random

    from gedixr_spark.operators.graph import triangle_count

    rng = random.Random(3)
    edge_list = list(
        {
            (rng.randrange(40), rng.randrange(40))
            for _ in range(260)
        }
    )
    # feed BOTH orientations + duplicates + self-loops: the operator
    # must normalize
    noisy = edge_list + [(b, a) for a, b in edge_list[:80]] + [(7, 7)]
    edges = spark.createDataFrame(noisy, "src long, dst long")
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_count(edges).collect()
    }
    want = _brute_triangles(edge_list)
    assert got == want
    total = triangle_count(edges, per_node=False).collect()[0]["n_triangles"]
    assert total == sum(want.values()) // 3


def test_triangle_count_star_graph_has_none_and_clique_is_complete(spark):
    from gedixr_spark.operators.graph import triangle_count

    # star: hub 0 with 20 leaves — zero triangles no matter the hub
    # degree (the case naive wedge counting pays Σdeg² for)
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 21)], "src long, dst long"
    )
    assert triangle_count(star, per_node=False).collect()[0]["n_triangles"] == 0
    # K5: C(5,3)=10 triangles, each node in C(4,2)=6
    k5 = spark.createDataFrame(
        [(i, j) for i in range(5) for j in range(i + 1, 5)],
        "src long, dst long",
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_count(k5).collect()}
    assert got == {i: 6 for i in range(5)}
