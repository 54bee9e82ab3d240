"""Tests for dedup cluster assignment, deterministic sampling/splits,
tf-idf top-k, and the fan_out scan-parallelism guard."""

import pytest
from pyspark.sql import functions as F

from gedixr_spark.operators import dedup, sampling, text
from gedixr_spark.operators.skew import fan_out


# ---------------------------------------------------------------------------
# dedup_clusters (connected components)
# ---------------------------------------------------------------------------


def _pairs(spark, edges):
    return spark.createDataFrame(edges, ["id_a", "id_b"])


def test_clusters_chain_converges_past_one_hop(spark):
    # 1-2-3-4-5 chain: min label must travel 4 hops
    out = dedup.dedup_clusters(_pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]))
    rows = {r["doc_id"]: (r["cluster_id"], r["is_survivor"]) for r in out.collect()}
    assert rows == {i: (1, i == 1) for i in range(1, 6)}


def test_clusters_separate_components(spark):
    out = dedup.dedup_clusters(_pairs(spark, [(10, 11), (2, 3), (3, 2), (20, 11)]))
    rows = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert rows == {10: 10, 11: 10, 20: 10, 2: 2, 3: 2}
    survivors = {r["doc_id"] for r in out.collect() if r["is_survivor"]}
    assert survivors == {10, 2}


def test_clusters_only_nodes_in_pairs_appear(spark):
    out = dedup.dedup_clusters(_pairs(spark, [(7, 9)]))
    assert {r["doc_id"] for r in out.collect()} == {7, 9}


# ---------------------------------------------------------------------------
# hash_split / stratified_sample
# ---------------------------------------------------------------------------


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
    )


def test_hash_split_partitions_every_row_once(spark):
    out = sampling.hash_split(_docs(spark), fractions={"train": 0.8, "val": 0.2})
    assert out.count() == 400
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val"}
    # uniform hash: 80/20 within generous tolerance
    assert counts["train"] > counts["val"]


def test_hash_split_is_stable_under_corpus_changes(spark):
    full = sampling.hash_split(_docs(spark, 400)).select("doc_id", "split")
    half = sampling.hash_split(_docs(spark, 200)).select("doc_id", "split")
    # same doc → same split regardless of what else is in the table
    joined = full.join(half, "doc_id")
    assert joined.count() == 200
    assert joined.filter(full["split"] != half["split"]).count() == 0


def test_hash_split_rejects_bad_fractions(spark):
    with pytest.raises(ValueError):
        sampling.hash_split(_docs(spark), fractions={"a": 0.9, "b": 0.2})


def test_stratified_sample_rates_and_drops(spark):
    out = sampling.stratified_sample(
        _docs(spark, 600), "lang", {"en": 1.0}
    )
    # en kept fully (fraction 1.0), de absent from fractions → dropped
    assert out.filter(F.col("lang") == "de").count() == 0
    assert out.filter(F.col("lang") == "en").count() == 200


# ---------------------------------------------------------------------------
# tfidf_topk
# ---------------------------------------------------------------------------


def test_tfidf_prefers_rare_terms(spark):
    df = spark.createDataFrame(
        [
            (1, "common common rare1"),
            (2, "common common rare2"),
            (3, "common common rare3"),
        ],
        ["doc_id", "text"],
    )
    out = text.tfidf_topk(df, k=1)
    top = {r["doc_id"]: r["term"] for r in out.collect()}
    # 'common' has tf=2 but df=3; rareN has tf=1, df=1 → 1*3/1=3 > 2*3/3=2
    assert top == {1: "rare1", 2: "rare2", 3: "rare3"}


def test_tfidf_rank_is_deterministic_on_ties(spark):
    df = spark.createDataFrame([(1, "b a"), (2, "x")], ["doc_id", "text"])
    out = text.tfidf_topk(df, k=2).filter(F.col("doc_id") == 1).orderBy("rnk")
    # a and b tie on score → term-ascending breaks the tie
    assert [r["term"] for r in out.collect()] == ["a", "b"]


# ---------------------------------------------------------------------------
# fan_out
# ---------------------------------------------------------------------------


def test_fan_out_spreads_single_partition(spark):
    one = spark.range(100).coalesce(1)
    assert fan_out(one, min_partitions=4).rdd.getNumPartitions() == 4


def test_fan_out_is_noop_when_already_parallel(spark):
    wide = spark.range(100).repartition(8)
    out = fan_out(wide, min_partitions=4)
    assert out.rdd.getNumPartitions() == 8
    assert out is wide


def test_apply_dedup_keeps_survivors_and_untouched(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(1, 7)], ["doc_id", "text"]
    )
    clusters = dedup.dedup_clusters(_pairs(spark, [(1, 2), (2, 3), (5, 6)]))
    out = {r["doc_id"] for r in dedup.apply_dedup(docs, clusters).collect()}
    # components {1,2,3} -> survivor 1; {5,6} -> survivor 5; 4 untouched
    assert out == {1, 4, 5}


# --- temperature mixture sampling ------------------------------------------


def test_mixture_weights_temperature_limits(spark):
    from gedixr_spark.operators.sampling import mixture_weights

    df = spark.createDataFrame(
        [(i, "en" if i < 800 else ("de" if i < 950 else "sw")) for i in range(1000)],
        ["doc_id", "lang"],
    )
    nat = {r["lang"]: r["weight"] for r in mixture_weights(df, temperature=1.0).collect()}
    assert abs(nat["en"] - 0.8) < 1e-12 and abs(nat["sw"] - 0.05) < 1e-12
    flat = {r["lang"]: r["weight"] for r in mixture_weights(df, temperature=0.0).collect()}
    assert all(abs(w - 1 / 3) < 1e-12 for w in flat.values())
    # 0<T<1 sits strictly between natural and uniform for head + tail
    mid = {r["lang"]: r["weight"] for r in mixture_weights(df, temperature=0.5).collect()}
    assert 1 / 3 < mid["en"] < 0.8 and 0.05 < mid["sw"] < 1 / 3
    assert abs(sum(mid.values()) - 1.0) < 1e-12


def test_mixture_sample_reshapes_corpus(spark):
    from gedixr_spark.operators.sampling import mixture_factors, mixture_sample

    df = spark.createDataFrame(
        [(i, "en" if i < 1600 else ("de" if i < 1900 else "sw")) for i in range(2000)],
        ["doc_id", "lang"],
    )
    factors = mixture_factors(df, temperature=0.5)
    # head domain downsamples, tail upsamples
    assert factors["en"] < 1.0 < factors["sw"]
    out = mixture_sample(df, temperature=0.5)
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    n0 = {"en": 1600, "de": 300, "sw": 100}
    for d, f in factors.items():
        expected = f * n0[d]
        assert abs(got[d] - expected) / expected < 0.10, (d, got[d], expected)
    # total expected preserved (default target = corpus size)
    assert abs(sum(got.values()) - 2000) / 2000 < 0.05


def test_mixture_sample_deterministic_and_t1_identity_shape(spark):
    from gedixr_spark.operators.sampling import mixture_factors, mixture_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 4 else "b") for i in range(400)], ["doc_id", "lang"]
    )
    a = sorted(map(tuple, mixture_sample(df, temperature=0.6).collect()))
    b = sorted(map(tuple, mixture_sample(df.repartition(7), temperature=0.6).collect()))
    assert a == b  # deterministic under partitioning
    # T=1, default target: factors are exactly 1 → identity corpus
    f = mixture_factors(df, temperature=1.0)
    assert all(abs(v - 1.0) < 1e-12 for v in f.values())
    assert mixture_sample(df, temperature=1.0).count() == 400


def test_mixture_negative_temperature_raises(spark):
    from gedixr_spark.operators.sampling import mixture_factors, mixture_weights

    df = spark.createDataFrame([(1, "a")], ["doc_id", "lang"])
    import pytest

    with pytest.raises(ValueError):
        mixture_weights(df, temperature=-0.1)
    with pytest.raises(ValueError):
        mixture_factors(df, temperature=-1)
