"""Contrastive training-pair mining — (anchor, positive, negative)
triplets for embedding-model training, from the near-dup pair graph the
dedup family already produces.

Why in a training-data engine: the standard recipe for training
retrieval/embedding models (SBERT, E5, GTE lineage) is contrastive
pairs: positives from near-duplicates / co-click / same-cluster
signals, negatives sampled from the corpus — ideally HARD negatives
(similar but not positive), which dominate training signal. This
module turns the engine's existing artifacts (LSH pair tables,
embedding columns) into that training set.

Scale shape: the negative pool is a deterministic hash-sample of the
corpus (pool_size rows, broadcast); anchors cross the POOL, never the
corpus — |anchors|·pool_size candidate rows, corpus-size-independent.
Positive exclusion is one broadcast anti-join on the pair table.
Selection is exact integer hash (random mode) or exact quantized
cosine (hard mode), so the output is deterministic under any
partitioning — reruns produce the identical training set, which is
what makes an ablation comparable.

No reference counterpart; §7.4 extension surface beside dedup/similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gedixr_spark.operators.similarity import cosine_q, quantize


def negative_pool(
    corpus: DataFrame,
    pool_size: int = 1024,
    id_col: str = "doc_id",
    seed: str = "negpool",
) -> DataFrame:
    """Deterministic corpus sample used as the negative-candidate pool:
    the ``pool_size`` ids with the smallest ``xxhash64(seed, id)`` — a
    uniform, reproducible choice (same discipline as
    sampling.hash_split). One TakeOrderedAndProject, no full sort."""
    if pool_size <= 0:
        raise ValueError(f"pool_size must be > 0, got {pool_size}")
    return (
        corpus.withColumn(
            "__h", F.xxhash64(F.lit(seed), F.col(id_col).cast("string"))
        )
        .orderBy("__h", id_col)
        .limit(pool_size)
        .drop("__h")
    )


def mine_contrastive_triplets(
    pairs: DataFrame,
    corpus: DataFrame,
    n_negatives: int = 1,
    mode: str = "random",
    pool_size: int = 1024,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    seed: str = "contrastive",
    scale: int = 1000,
) -> DataFrame:
    """(anchor_id, positive_id, negative_id, neg_rank) triplets: one
    row per (positive pair, negative index). Anchors are ``id_a`` of
    the pair table; ``id_b`` is the positive (run the symmetric pairs
    through twice if both directions are wanted — explicit beats
    silent row doubling).

    ``mode='random'``: negatives are the pool members with the
    smallest exact ``xxhash64(seed, anchor, cand)`` — i.i.d.-looking
    per anchor, fully deterministic.
    ``mode='hard'``: negatives are the pool members MOST similar to
    the anchor by quantized cosine (``vec_col`` required on both
    corpus and pool rows) — the hard-negative mining that dominates
    contrastive training signal. Exact int arithmetic ⇒ deterministic.

    Disqualified as negatives, per anchor: the anchor itself, its
    positive in this row, and ANY known positive partner of the anchor
    from the full pair table (a near-dup mislabeled as a negative is a
    false-negative gradient — the one mistake this op must not make)."""
    if mode not in ("random", "hard"):
        raise ValueError(f"mode must be random|hard, got {mode!r}")
    if n_negatives <= 0:
        raise ValueError(f"n_negatives must be > 0, got {n_negatives}")
    if n_negatives > pool_size:
        raise ValueError(
            f"n_negatives={n_negatives} exceeds pool_size={pool_size}"
        )
    p = pairs.select(
        F.col("id_a").alias("anchor_id"), F.col("id_b").alias("positive_id")
    )
    pool_cols = [id_col] if mode == "random" else [id_col, vec_col]
    pool = negative_pool(
        corpus.select(*pool_cols), pool_size=pool_size, id_col=id_col,
        seed=seed,
    )
    if mode == "hard":
        pool = pool.select(
            F.col(id_col).alias("cand_id"),
            quantize(vec_col, scale).alias("__cv"),
        )
        # LEFT join + in-plan guard, not an inner join: an anchor
        # present in the pair table but absent from the corpus (or
        # with a NULL vector) must fail loudly, not silently drop its
        # (anchor, positive) rows and make hard/random modes disagree
        # on coverage (r7 ADVICE). Lazy — no job fires at composition.
        anchors = p.select("anchor_id").distinct().join(
            corpus.filter(F.col(vec_col).isNotNull()).select(
                F.col(id_col).alias("anchor_id"),
                quantize(vec_col, scale).alias("__av"),
            ),
            "anchor_id",
            "left",
        ).withColumn(
            "__av",
            F.when(F.col("__av").isNotNull(), F.col("__av")).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "mine_contrastive_triplets(mode='hard'): "
                            "anchor "
                        ),
                        F.col("anchor_id").cast("string"),
                        F.lit(
                            f" has no {vec_col!r} embedding in the "
                            "corpus; hard-negative mining needs every "
                            "anchor's vector. Filter the pair table to "
                            "corpus-covered anchors or use "
                            "mode='random'."
                        ),
                    )
                )
            ),
        )
        cand = anchors.crossJoin(F.broadcast(pool)).select(
            "anchor_id",
            "cand_id",
            cosine_q(F.col("__av"), F.col("__cv")).alias("__score"),
        )
        order = [F.desc("__score"), F.asc("cand_id")]
    else:
        pool = pool.select(F.col(id_col).alias("cand_id"))
        cand = p.select("anchor_id").distinct().crossJoin(F.broadcast(pool)).select(
            "anchor_id",
            "cand_id",
            F.xxhash64(
                F.lit(seed),
                F.col("anchor_id").cast("string"),
                F.col("cand_id").cast("string"),
            ).alias("__score"),
        )
        order = [F.asc("__score"), F.asc("cand_id")]
    # disqualify known positives of the anchor (both pair directions)
    known = pairs.select(
        F.col("id_a").alias("anchor_id"), F.col("id_b").alias("cand_id")
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("anchor_id"), F.col("id_a").alias("cand_id")
        )
    ).distinct()
    # no broadcast hint: the pair table is corpus-scale at 100 TB —
    # let AQE pick broadcast when it is actually small
    cand = (
        cand.filter(F.col("cand_id") != F.col("anchor_id"))
        .join(known, ["anchor_id", "cand_id"], "left_anti")
    )
    w = Window.partitionBy("anchor_id").orderBy(*order)
    picked = (
        cand.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= n_negatives)
        .select("anchor_id", F.col("cand_id").alias("negative_id"), "neg_rank")
    )
    out = p.join(picked, "anchor_id").filter(
        F.col("negative_id") != F.col("positive_id")
    )
    return out.select("anchor_id", "positive_id", "negative_id", "neg_rank")
