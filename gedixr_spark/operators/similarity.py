"""Similarity search over embedding columns (SURVEY.md §7.4).

Two paths:
- cosine_topk: brute-force top-k — the correctness baseline. Broadcast
  the (small) query set, score every corpus row, rank per query. One
  scan, no shuffle of the corpus beyond the final per-query top-k.
- lsh_ann_topk: the scale path — random-hyperplane LSH buckets; only
  candidates sharing a bucket are scored. Hyperplanes come from a
  seeded RNG so plans are reproducible and the SQL oracle can embed
  the same plane literals.

Determinism: float dot products are summation-order-sensitive, so the
oracle-checked path QUANTIZES embeddings (round(e*scale) as int).
Integer dot products are exact under any order; the final cosine is a
single IEEE division of exact inputs — bit-identical in both engines.
(Int8-style quantization is also the realistic thing to do to 100 TB
of embeddings.)
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def quantize(col: Column | str, scale: int = 1000) -> Column:
    """array<float> → array<int> via round(e*scale): exact-arithmetic
    embedding representation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: F.round(x.cast("double") * scale).cast("long"))


def dot(a: Column, b: Column) -> Column:
    """Order-stable fold dot product (exact when inputs are integers)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v)


def dot_double(a: Column, b: Column) -> Column:
    """Float dot product (left fold). Fast path when oracle parity
    isn't required."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_q(a: Column, b: Column) -> Column:
    """Cosine over quantized vectors: exact int dot / sqrt(int)·sqrt(int)."""
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1000,
) -> DataFrame:
    """Brute-force cosine top-k: for each query vector, the k nearest
    corpus vectors (excluding itself), deterministic tie-break on id.

    Plan shape: broadcast(queries) × corpus → per-query rank. The
    corpus is scanned once; the only shuffle is the window's
    partition-by-query (tiny: |queries|·k rows after AQE)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), quantize(vec_col, scale).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("cand_id"), quantize(vec_col, scale).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", cosine_q(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Seeded random hyperplanes (4-decimal values so literals embed
    exactly in SQL oracles)."""
    rng = np.random.default_rng(seed)
    return [[round(float(v), 4) for v in rng.standard_normal(dim)] for _ in range(n_planes)]


def lsh_bucket(vec_col: Column | str, planes: list[list[float]], scale: int = 1000) -> Column:
    """Random-hyperplane signature: bit i = sign(q · plane_i), packed
    into an int. Uses the quantized vector so the projection is a fixed
    left-assoc chain of exact-int × literal products — deterministic."""
    v = quantize(vec_col, scale)
    out = F.lit(0)
    for i, plane in enumerate(planes):
        proj = F.lit(0.0)
        for j, w in enumerate(plane):
            proj = proj + F.element_at(v, j + 1) * F.lit(w)
        out = out + F.when(proj > 0, F.lit(2**i)).otherwise(F.lit(0))
    return out


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1000,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: score only candidates in the query's LSH bucket.
    Join on the bucket id (equi-join, broadcastable) instead of a cross
    join — at 1000 executors this is the difference between |Q|·|C|
    and |Q|·|C|/2^planes comparisons. Recall < 1 by construction; raise
    n_planes bands or multi-probe for more."""
    planes = hyperplanes(dim, n_planes, seed)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        quantize(vec_col, scale).alias("qv"),
        lsh_bucket(vec_col, planes, scale).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        quantize(vec_col, scale).alias("cv"),
        lsh_bucket(vec_col, planes, scale).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", cosine_q(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.99,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1000,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed: only pairs
    sharing a hyperplane bucket are scored (id_a < id_b, cosine ≥
    threshold). The O(n²) brute-force equivalent is the same expression
    with bucket removed."""
    planes = hyperplanes(dim, n_planes, seed)
    s = df.select(
        F.col(id_col),
        quantize(vec_col, scale).alias("v"),
        lsh_bucket(vec_col, planes, scale).alias("bucket"),
    )
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(b, on="bucket")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine_q(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
