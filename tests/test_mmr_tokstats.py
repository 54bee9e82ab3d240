"""MMR diversity rerank (similarity.mmr_rerank) and tokenizer quality
report (bpe.tokenizer_stats): numpy/python differentials, determinism,
and semantic properties (diversification actually diversifies; OOV is
zero on the training corpus and positive on drifted text)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from gedixr_spark.operators import similarity as sim
from gedixr_spark.operators.bpe import (
    bpe_train, build_vocab, tokenizer_stats, word_counts,
)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(5)
    # two tight clusters + scattered points: MMR at lam<1 must not
    # return one cluster's members back-to-back
    rows = []
    c0 = rng.standard_normal(16)
    c1 = rng.standard_normal(16) + 4
    for i in range(40):
        base = c0 if i % 2 == 0 else c1
        rows.append((i, [float(x) for x in base + rng.standard_normal(16) * 0.05]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).localCheckpoint()


def _mmr_reference(q, ids, vecs, k, lam):
    """Plain-python MMR mirror of the operator's exact-int arithmetic."""
    qq = np.asarray([round(x * 1000) for x in q], dtype=np.int64)
    mats = [np.asarray([round(x * 1000) for x in v], dtype=np.int64) for v in vecs]
    norms = [math.sqrt(float((m * m).sum())) for m in mats]
    qn = math.sqrt(float((qq * qq).sum()))
    rel = [float(m @ qq) / (n * qn) for m, n in zip(mats, norms)]
    picked, avail = [], set(range(len(ids)))
    while avail and len(picked) < k:
        best, best_s = None, None
        for i in sorted(avail):
            div = max(
                (float(mats[i] @ mats[j]) / (norms[i] * norms[j]) for j in picked),
                default=0.0,
            )
            s = lam * rel[i] - (1 - lam) * div
            if best_s is None or s > best_s:
                best, best_s = i, s
        picked.append(best)
        avail.discard(best)
    return [ids[i] for i in picked]


def test_mmr_matches_reference_and_is_deterministic(spark, emb):
    cands = emb.select(
        F.lit(0).cast("long").alias("query_id"),
        F.col("vec_id").alias("cand_id"),
    ).filter(F.col("cand_id") != 0)
    out = sim.mmr_rerank(cands, emb, k=8, lam=0.7, query_col="query_id")
    got = [
        r["cand_id"]
        for r in out.orderBy("mmr_rank").collect()
    ]
    rows = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    ids = sorted(i for i in rows if i != 0)
    want = _mmr_reference(rows[0], ids, [rows[i] for i in ids], 8, 0.7)
    assert got == want
    # determinism under repartitioning
    again = [
        r["cand_id"]
        for r in sim.mmr_rerank(
            cands.repartition(7), emb.repartition(5), k=8, lam=0.7
        ).orderBy("mmr_rank").collect()
    ]
    assert again == got


def test_mmr_diversifies_vs_pure_relevance(spark, emb):
    """lam=1 is pure relevance (one cluster dominates); lam=0.3 must
    mix in the other cluster early."""
    cands = emb.select(
        F.lit(0).cast("long").alias("query_id"),
        F.col("vec_id").alias("cand_id"),
    ).filter(F.col("cand_id") != 0)
    pure = [
        r["cand_id"] % 2
        for r in sim.mmr_rerank(cands, emb, k=6, lam=1.0)
        .orderBy("mmr_rank").collect()
    ]
    mixed = [
        r["cand_id"] % 2
        for r in sim.mmr_rerank(cands, emb, k=6, lam=0.3)
        .orderBy("mmr_rank").collect()
    ]
    # query 0 sits in cluster 0 (even ids): pure relevance keeps
    # cluster 0 only; diversified picks both parities in the top 6
    assert set(pure) == {0}
    assert set(mixed) == {0, 1}


def test_mmr_validates(spark, emb):
    cands = emb.select(
        F.lit(0).cast("long").alias("query_id"),
        F.col("vec_id").alias("cand_id"),
    )
    with pytest.raises(ValueError, match="k must be"):
        sim.mmr_rerank(cands, emb, k=0)
    with pytest.raises(ValueError, match="lam must be"):
        sim.mmr_rerank(cands, emb, k=3, lam=1.5)


@pytest.fixture(scope="module")
def tok_corpus(spark):
    rows = [
        (i, "the lower lowest newer newest low " * 3, "en") for i in range(6)
    ] + [(100 + i, "zzqx vblorp qq zz " * 2, "xx") for i in range(4)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_tokenizer_stats_exact_counts_and_oov(spark, tok_corpus):
    train = tok_corpus.filter(F.col("lang") == "en")
    merges = bpe_train(word_counts(train), n_merges=10)
    vocab = build_vocab(train, merges)
    stats = {r["lang"]: r for r in tokenizer_stats(
        tok_corpus, merges, vocab
    ).collect()}
    en, xx = stats["en"], stats["xx"]
    # training corpus: every produced token is in the vocab
    assert en["oov_rate"] == 0.0
    # drifted corpus: unseen characters → OOV tokens appear
    assert xx["oov_rate"] > 0.0
    # fertility ≥ 1 always (a word is ≥ 1 token); drifted group worse
    assert 1.0 <= en["fertility"] < xx["fertility"]
    # exact accounting: ratios are the single divisions of the sums
    assert en["fertility"] == en["n_bpe_tokens"] / en["n_words"]
    assert en["chars_per_token"] == en["n_chars"] / en["n_bpe_tokens"]


def test_mmr_missing_vector_fails_loudly(spark, emb):
    """A shortlist id absent from the corpus (or with a NULL vector)
    raises at action time instead of silently shrinking the page."""
    cands = spark.createDataFrame(
        [(0, 1), (0, 999)], "query_id long, cand_id long"
    )
    out = sim.mmr_rerank(cands, emb, k=2)  # lazy
    with pytest.raises(Exception, match="cand_id=999 has no"):
        out.collect()
