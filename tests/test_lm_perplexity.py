"""CCNet-style LM quality scoring (text.py::train_bigram_lm /
lm_bits_per_token / perplexity_filter): natural text that matches the
training corpus scores fewer bits/token than gibberish; the filter
keeps the low-perplexity head."""

import pytest
from pyspark.sql import functions as F

from gedixr_spark.operators.text import (
    lm_bits_per_token,
    perplexity_filter,
    train_bigram_lm,
)

CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "a cat and a dog sat together",
    "the cat and the dog are friends",
]


def _lm(spark):
    corpus = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"])
    return train_bigram_lm(corpus)


def test_bigram_counts(spark):
    bigrams, unigrams = _lm(spark)
    bg = {(r["w1"], r["w2"]): r["n12"] for r in bigrams.collect()}
    assert bg[("the", "cat")] == 2  # lines 1 and 4
    assert bg[("sat", "on")] == 2
    ug = {r["w1"]: r["n1"] for r in unigrams.collect()}
    assert ug["the"] == bg[("the", "cat")] + bg[("the", "dog")] + bg[("the", "mat")] + bg[("the", "rug")]


def test_natural_text_beats_gibberish(spark):
    bigrams, unigrams = _lm(spark)
    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the rug"),          # in-distribution
            (1, "zxq wvud plorp gnarf blix trunt"), # gibberish
            (2, "x"),                               # unscorable (<2 tokens)
        ],
        ["doc_id", "text"],
    )
    scored = {r["doc_id"]: r["lm_bits_per_token"]
              for r in lm_bits_per_token(docs, bigrams, unigrams).collect()}
    assert scored[0] < scored[1]
    assert scored[2] is None


def test_perplexity_filter_keeps_head(spark):
    bigrams, unigrams = _lm(spark)
    docs = spark.createDataFrame(
        [(0, "the cat sat on the rug"), (1, "zxq wvud plorp gnarf blix"), (2, "x")],
        ["doc_id", "text"],
    )
    scored = {r["doc_id"]: r["lm_bits_per_token"]
              for r in lm_bits_per_token(docs, bigrams, unigrams).collect()}
    cut = (scored[0] + scored[1]) / 2
    kept = {r["doc_id"] for r in perplexity_filter(docs, bigrams, unigrams, cut).collect()}
    assert kept == {0}
    kept2 = {r["doc_id"]
             for r in perplexity_filter(docs, bigrams, unigrams, cut, keep_unscorable=True).collect()}
    assert kept2 == {0, 2}


def test_scoring_deterministic_under_repartition(spark):
    bigrams, unigrams = _lm(spark)
    docs = spark.createDataFrame(
        [(i, CORPUS[i % len(CORPUS)]) for i in range(40)], ["doc_id", "text"]
    )
    a = sorted(map(tuple, lm_bits_per_token(docs, bigrams, unigrams).collect()))
    b = sorted(map(tuple, lm_bits_per_token(docs.repartition(7), bigrams, unigrams).collect()))
    assert [x[0] for x in a] == [x[0] for x in b]
    assert all(abs(x[2] - y[2]) < 1e-12 for x, y in zip(a, b))


def test_perplexity_cutoffs_terciles(spark):
    from gedixr_spark.operators.text import perplexity_cutoffs

    bigrams, unigrams = _lm(spark)
    docs = spark.createDataFrame(
        [(i, CORPUS[i % len(CORPUS)]) for i in range(30)]
        + [(100 + i, "zxq wvud plorp gnarf blix") for i in range(10)],
        ["doc_id", "text"],
    )
    scored = lm_bits_per_token(docs, bigrams, unigrams)
    lo, hi = perplexity_cutoffs(scored)
    assert lo <= hi
    # the tercile cut separates in-distribution docs from gibberish
    vals = {r["doc_id"]: r["lm_bits_per_token"] for r in scored.collect()}
    assert all(vals[i] <= hi for i in range(30))
    assert all(vals[100 + i] > hi for i in range(10))
