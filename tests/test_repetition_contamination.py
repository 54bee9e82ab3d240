"""Tests for repetition signals, benchmark decontamination, and
simhash hamming near-dup pairs."""

from pyspark.sql import functions as F

from gedixr_spark.operators import dedup, text


# ---------------------------------------------------------------------------
# repetition_features
# ---------------------------------------------------------------------------


def test_repetition_ratios_exact(spark):
    df = spark.createDataFrame([(1, "a a a b")], ["doc_id", "text"])
    row = text.repetition_features(df).collect()[0]
    # 4 tokens, 2 distinct -> dup 0.5; bigrams [a a, a a, a b] -> 2/3
    assert row["dup_token_ratio"] == 0.5
    assert row["top_bigram_ratio"] == 2.0 / 3.0


def test_repetition_short_docs_null(spark):
    df = spark.createDataFrame([(1, "solo"), (2, "")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in text.repetition_features(df).collect()}
    assert rows[1]["dup_token_ratio"] == 0.0
    assert rows[1]["top_bigram_ratio"] is None  # no bigram slots
    assert rows[2]["dup_token_ratio"] is None  # no tokens at all
    assert rows[2]["top_bigram_ratio"] is None


def test_repetition_no_repeats(spark):
    df = spark.createDataFrame([(1, "w x y z")], ["doc_id", "text"])
    row = text.repetition_features(df).collect()[0]
    assert row["dup_token_ratio"] == 0.0
    assert row["top_bigram_ratio"] == 1.0 / 3.0  # every bigram unique


# ---------------------------------------------------------------------------
# contamination
# ---------------------------------------------------------------------------


def test_contamination_counts_and_flags(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),  # shares shingles with bench
            (2, "totally different words here"),
            (3, "the quick brown cat"),  # shares 'the quick brown' only
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(99, "the quick brown fox")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in text.contamination(corpus, bench).collect()}
    # bench shingles: {the quick brown, quick brown fox}
    assert rows[1]["n_overlap"] == 2 and rows[1]["contaminated"]
    assert rows[2]["n_overlap"] == 0 and not rows[2]["contaminated"]
    assert rows[3]["n_overlap"] == 1 and rows[3]["contaminated"]


def test_contamination_min_overlap_threshold(spark):
    corpus = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    bench = spark.createDataFrame([(9, "a b c")], ["doc_id", "text"])
    out = text.contamination(corpus, bench, min_overlap=2).collect()[0]
    assert out["n_overlap"] == 1 and not out["contaminated"]


# ---------------------------------------------------------------------------
# simhash_neardup_pairs
# ---------------------------------------------------------------------------


def test_simhash_identical_docs_distance_zero(spark):
    df = spark.createDataFrame(
        [(1, "same text here"), (2, "same text here"), (3, "x y z w q")],
        ["doc_id", "text"],
    )
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in dedup.simhash_neardup_pairs(df).collect()}
    assert pairs.get((1, 2)) == 0


def test_simhash_signatures_fold_and_groupby_agree(spark):
    # the DataFrame-level 16-bit signature must equal the column fold
    df = spark.createDataFrame(
        [(i, f"w{i} w{i % 5} common text body {i % 2}") for i in range(20)],
        ["doc_id", "text"],
    )
    fold = {r["doc_id"]: r["sig"]
            for r in df.select("doc_id", dedup.simhash16("text").alias("sig")).collect()}
    grouped = {r["doc_id"]: r["sig"]
               for r in dedup.simhash_signatures(df, bits=16).collect()}
    assert fold == grouped


def test_simhash_banding_matches_bruteforce(spark):
    # completeness check: banding must find EVERY pair with hamming<=3
    docs = [(i, f"tok{i} tok{i % 4} shared common words {i % 3}") for i in range(24)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    sigs = {r["doc_id"]: r["sig"] for r in dedup.simhash_signatures(df, bits=32).collect()}
    expect = {
        (a, b): bin(sigs[a] ^ sigs[b]).count("1")
        for a in sigs
        for b in sigs
        if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in dedup.simhash_neardup_pairs(df, max_dist=3).collect()}
    assert got == expect


def test_simhash_max_dist_validated(spark):
    import pytest

    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        dedup.simhash_neardup_pairs(df, max_dist=4)


# ---------------------------------------------------------------------------
# Cross-document exact substring spans
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_substring_dedup_spans_shared_run_merges(spark):
    # docs 1 and 2 share a 7-token verbatim run -> three overlapping
    # 5-gram hits merge into one maximal span of length 7
    shared = "a b c d e f g"
    df = _docs(spark, [
        (1, f"x1 y1 {shared} z1"),
        (2, f"{shared} q r s"),
        (3, "nothing in common here at all ok"),
    ])
    out = {r["doc_id"]: (r["span_start"], r["span_end"])
           for r in text.substring_dedup_spans(df, n=5).collect()}
    assert out[1] == (2, 9)   # after the 2-token prefix
    assert out[2] == (0, 7)
    assert 3 not in out


def test_substring_dedup_spans_within_doc_repeat_ignored(spark):
    # a 5-gram repeated twice INSIDE one doc is not cross-doc dup
    df = _docs(spark, [
        (1, "p q r s t p q r s t"),
        (2, "u v w x y z a b c d"),
    ])
    assert text.substring_dedup_spans(df, n=5).count() == 0


def test_substring_dedup_spans_min_docs(spark):
    shared = "m n o p q"
    df = _docs(spark, [
        (1, f"{shared} one"),
        (2, f"{shared} two"),
        (3, f"{shared} three"),
        (4, "unrelated words only here five"),
    ])
    assert text.substring_dedup_spans(df, n=5, min_docs=3).count() == 3
    assert text.substring_dedup_spans(df, n=5, min_docs=4).count() == 0
