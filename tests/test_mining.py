"""Contrastive triplet mining (operators/mining.py): determinism,
positive exclusion, hard-negative ordering, pool bounds."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gedixr_spark.operators.mining import (
    mine_contrastive_triplets,
    negative_pool,
)


@pytest.fixture(scope="module")
def fixture(spark):
    rng = np.random.default_rng(9)
    rows = []
    for i in range(60):
        base = rng.standard_normal(8) + (i % 3) * 5.0  # 3 loose clusters
        rows.append((i, [float(x) for x in base]))
    corpus = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    pairs = spark.createDataFrame(
        [(0, 1), (2, 3), (10, 11), (20, 21)], "id_a long, id_b long"
    )
    return corpus.localCheckpoint(), pairs


def test_pool_is_deterministic_and_bounded(spark, fixture):
    corpus, _ = fixture
    a = sorted(r["doc_id"] for r in negative_pool(corpus, 10).collect())
    b = sorted(r["doc_id"] for r in negative_pool(corpus, 10).collect())
    assert a == b and len(a) == 10
    # different seed → different pool
    c = sorted(
        r["doc_id"] for r in negative_pool(corpus, 10, seed="other").collect()
    )
    assert c != a


def test_random_triplets_shape_and_exclusions(spark, fixture):
    corpus, pairs = fixture
    out = mine_contrastive_triplets(
        pairs, corpus, n_negatives=3, pool_size=30
    ).collect()
    # 4 pairs × 3 negatives
    assert len(out) == 12
    known = {(0, 1), (2, 3), (10, 11), (20, 21)}
    known |= {(b, a) for a, b in known}
    for r in out:
        assert r["negative_id"] != r["anchor_id"]
        assert r["negative_id"] != r["positive_id"]
        assert (r["anchor_id"], r["negative_id"]) not in known
    # deterministic across runs
    again = mine_contrastive_triplets(
        pairs, corpus, n_negatives=3, pool_size=30
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_hard_negatives_are_most_similar_nonpositives(spark, fixture):
    corpus, pairs = fixture
    out = mine_contrastive_triplets(
        pairs, corpus, n_negatives=1, mode="hard", pool_size=60
    ).collect()
    vecs = {r["doc_id"]: np.array(r["embedding"]) for r in corpus.collect()}

    def cos(a, b):
        qa = np.round(vecs[a] * 1000)
        qb = np.round(vecs[b] * 1000)
        return (qa @ qb) / (np.sqrt(qa @ qa) * np.sqrt(qb @ qb))

    known = {(0, 1), (2, 3), (10, 11), (20, 21)}
    known |= {(b, a) for a, b in known}
    pool_ids = {r["doc_id"] for r in negative_pool(corpus, 60).collect()}
    for r in out:
        a, n = r["anchor_id"], r["negative_id"]
        best = max(
            (
                c for c in pool_ids
                if c != a and (a, c) not in known
            ),
            key=lambda c: (cos(a, c), -c),
        )
        assert n == best, (a, n, best)


def test_validation(spark, fixture):
    corpus, pairs = fixture
    with pytest.raises(ValueError, match="mode"):
        mine_contrastive_triplets(pairs, corpus, mode="nope")
    with pytest.raises(ValueError, match="n_negatives"):
        mine_contrastive_triplets(pairs, corpus, n_negatives=0)
    with pytest.raises(ValueError, match="exceeds pool_size"):
        mine_contrastive_triplets(pairs, corpus, n_negatives=50, pool_size=10)


def test_hard_mode_missing_anchor_fails_loudly(spark, fixture):
    """An anchor in the pair table with no corpus embedding must raise
    at action time, not silently vanish from the output (r7 ADVICE —
    random mode keeps such anchors, so silent dropping made the two
    modes disagree on coverage). The guard is in-plan: composing the
    DataFrame fires no job."""
    corpus, _ = fixture
    pairs = spark.createDataFrame(
        [(0, 1), (999, 2)], "id_a long, id_b long"  # 999 not in corpus
    )
    out = mine_contrastive_triplets(
        pairs, corpus, n_negatives=2, mode="hard", pool_size=16
    )  # lazy: no error yet
    with pytest.raises(Exception, match="anchor 999 has no"):
        out.collect()

    # NULL embedding counts as missing too
    corpus_null = corpus.withColumn(
        "embedding",
        F.when(F.col("doc_id") == 20, F.lit(None)).otherwise(
            F.col("embedding")
        ),
    )
    pairs2 = spark.createDataFrame([(20, 21)], "id_a long, id_b long")
    with pytest.raises(Exception, match="anchor 20 has no"):
        mine_contrastive_triplets(
            pairs2, corpus_null, n_negatives=2, mode="hard", pool_size=16
        ).collect()
