"""Round-2 operators: multi-table LSH, parameterized sliding windows,
span-level decontamination, dedup non-convergence guard."""

import datetime

import pytest
from pyspark.sql import functions as F

from gedixr_spark.operators import dedup, similarity, text
from gedixr_spark.operators.events import sliding_agg

EMB = "/root/testdata/sf0.01/embeddings.parquet"


def test_multitable_max_occupancy_drops(spark):
    """VERDICT r1 'done' criterion: per-bucket occupancy under the
    multi-table parameterization (2×10 bits) is strictly below the
    single-table 8-bit plan's max bucket occupancy."""
    emb = spark.read.parquet(EMB)
    single = (
        emb.select(
            similarity.lsh_bucket("embedding", similarity.hyperplanes(64, 8, 42)).alias("b")
        )
        .groupBy("b").count().agg(F.max("count")).collect()[0][0]
    )
    tables = similarity.hyperplane_tables(64, 2, 10, 42)
    multi = (
        emb.select(F.explode(similarity.lsh_table_buckets("embedding", tables)).alias("tb"))
        .groupBy("tb.tbl", "tb.bucket").count().agg(F.max("count")).collect()[0][0]
    )
    assert multi < single


def test_multitable_superset_of_single_table_pairs(spark):
    """Table 0 of hyperplane_tables(seed) IS hyperplanes(seed), so the
    2-table OR at the same bit width can only ADD candidate pairs —
    recall is monotone in n_tables."""
    emb = spark.read.parquet(EMB).limit(200)
    single = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_neardup_pairs(emb, threshold=0.2, n_planes=8).collect()
    }
    multi = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_neardup_pairs_multitable(
            emb, threshold=0.2, n_tables=2, bits=8
        ).collect()
    }
    assert single <= multi and len(single) > 0


def _events(spark, times):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=m), 1.0) for i, m in enumerate(times)
    ]
    return spark.createDataFrame(rows, "event_id int, ts timestamp, value double")


def test_sliding_agg_generalized_widths(spark):
    # events at :05, :35, :65 minutes past midnight
    df = _events(spark, [5, 35, 65])
    # width 90 / slide 60: event@5 -> windows {0:00}; (window -60 min
    # would end at 0:30 > 0:05 so it IS included: starts -60, width 90
    # covers [-60, 30)) — check exact membership instead of guessing:
    out = {
        (r["window_start"].isoformat(), r["n_events"])
        for r in sliding_agg(df, 90, 60).collect()
    }
    # windows: -1:00 covers [−60,30): events 5 -> yes; 0:00 covers
    # [0,90): events 5,35,65; 1:00 covers [60,150): event 65
    assert out == {
        ("2023-12-31T23:00:00", 1),
        ("2024-01-01T00:00:00", 3),
        ("2024-01-01T01:00:00", 1),
    }


def test_sliding_agg_divisible_case_counts(spark):
    df = _events(spark, [5, 35, 65])
    # 60/30: each event in exactly 2 windows
    total = (
        sliding_agg(df, 60, 30).agg(F.sum("n_events")).collect()[0][0]
    )
    assert total == 2 * 3


def test_sliding_agg_rejects_bad_params(spark):
    df = _events(spark, [5])
    with pytest.raises(ValueError):
        sliding_agg(df, 30, 60)


def test_contamination_spans_merges_overlaps(spark):
    corpus = spark.createDataFrame(
        [
            # tokens 0..9; bench shingles hit positions 2,3 (overlap ->
            # one span 2..6) and 7 (span 7..10)
            (1, "t0 t1 A B C D t6 X Y Z"),
            (2, "clean words only here nothing shared"),
        ],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame(
        [(100, "A B C"), (101, "B C D"), (102, "X Y Z")], "doc_id int, text string"
    )
    out = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in text.contamination_spans(corpus, bench).collect()
    }
    assert out == {(1, 2, 6), (1, 7, 10)}


def test_contamination_spans_touching_spans_merge(spark):
    corpus = spark.createDataFrame([(1, "A B C D E F")], "doc_id int, text string")
    bench = spark.createDataFrame(
        [(100, "A B C"), (101, "D E F")], "doc_id int, text string"
    )
    out = [
        (r["span_start"], r["span_end"])
        for r in text.contamination_spans(corpus, bench).collect()
    ]
    # hits at 0 ([0,3)) and 3 ([3,6)): touching -> one merged span
    assert out == [(0, 6)]


def test_simhash_banding_generalizes_max_dist(spark):
    """Pigeonhole completeness at max_dist=7 (8 bands of 4 bits):
    banded candidates must equal the brute-force hamming filter."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").limit(120)
    sigs = {r["doc_id"]: r["sig"] for r in dedup.simhash_signatures(docs).collect()}
    brute = {
        (a, b)
        for a in sigs
        for b in sigs
        if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= 7
    }
    banded = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_neardup_pairs(docs, max_dist=7).collect()
    }
    assert banded == brute
    with pytest.raises(ValueError, match="divisible"):
        dedup.simhash_neardup_pairs(docs, max_dist=2)  # 32 % 3 != 0


def _brute_components(pairs):
    """Driver-side union-find oracle."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_star_cc_matches_union_find_random(spark):
    import random

    rng = random.Random(7)
    pairs = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "id_a int, id_b int")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dedup_clusters_star(df).collect()
    }
    assert got == _brute_components(pairs)
    # and agrees with the min-label twin
    ml = {r["doc_id"]: r["cluster_id"] for r in dedup.dedup_clusters(df).collect()}
    assert got == ml


def test_star_cc_handles_long_chain_in_log_rounds(spark):
    """A 300-node chain (diameter 299): star CC converges well inside
    15 rounds where min-label propagation would need ~300."""
    chain = [(i, i + 1) for i in range(300)]
    df = spark.createDataFrame(chain, "id_a int, id_b int")
    out = dedup.dedup_clusters_star(df, max_iter=15)
    rows = out.collect()
    assert len(rows) == 301
    assert all(r["cluster_id"] == 0 for r in rows)
    assert sum(r["is_survivor"] for r in rows) == 1
    # the min-label twin genuinely can't do it in that budget
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.dedup_clusters(df, max_iter=15)


def test_choose_survivors_policy(spark):
    clusters = spark.createDataFrame(
        [(1, 1, True), (2, 1, False), (3, 1, False), (7, 7, True), (8, 7, False)],
        "doc_id int, cluster_id int, is_survivor boolean",
    )
    docs = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 50), (7, 5), (8, 99)], "doc_id int, n_tokens int"
    )
    out = {
        r["doc_id"]: r["is_survivor"]
        for r in dedup.choose_survivors(clusters, docs, "n_tokens").collect()
    }
    # cluster 1: docs 2 and 3 tie at 50 -> lower id (2) wins; cluster 7: 8 wins
    assert out == {1: False, 2: True, 3: False, 7: False, 8: True}
    # composes with apply_dedup
    survivors = dedup.apply_dedup(
        docs, dedup.choose_survivors(clusters, docs, "n_tokens")
    )
    assert {r["doc_id"] for r in survivors.collect()} == {2, 8}


def test_filter_documents_gates(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),  # keeps
        (2, "a b"),                                                # too short
        (3, "SHOUTING IN ALL CAPS IS THE WHOLE OF THIS TEXT OK"),  # upper
        (4, "spam spam spam spam spam spam spam spam the spam"),   # dup ratio
        (5, "pneumonoultramicroscopics ilicovolcanoconiosises " * 4
            + "the of and a it is in to"),                          # keeps (mixed)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    kept = {r["doc_id"] for r in text.filter_documents(df).collect()}
    assert 1 in kept and 2 not in kept and 3 not in kept and 4 not in kept


def test_learned_centroid_ivf_pipeline(spark, tmp_path):
    """kmeans -> quantize -> save/load -> IVF ANN: the production loop."""
    from gedixr_spark.operators.clustering import kmeans_fit

    emb = spark.read.parquet(EMB)
    cents, _ = kmeans_fit(emb, k=4, n_iter=2)
    q = similarity.kmeans_to_ivf_centroids(cents)
    path = str(tmp_path / "centroids")
    similarity.save_centroids(spark, q, path)
    loaded = similarity.load_centroids(spark, path)
    assert loaded == q and len(loaded) == 4
    out = similarity.ivf_ann_topk(
        emb.filter(F.col("vec_id") < 3), emb, k=2, centroids=loaded, nprobe=2
    )
    rows = out.collect()
    assert len(rows) > 0 and all(r["rank"] <= 2 for r in rows)


def test_minhash_fold_and_grouped_formulations_agree(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").limit(100)
    fold = {tuple(r) for r in dedup.minhash_signature(docs, k=4).collect()}
    grouped = {tuple(r) for r in dedup.minhash_signature_grouped(docs, k=4).collect()}
    assert fold == grouped and len(fold) > 0


def test_ngram_jaccard_guard(spark):
    docs = spark.createDataFrame(
        [(i, "a b c d e") for i in range(30)], "doc_id int, text string"
    )
    with pytest.raises(ValueError, match="quadratic"):
        dedup.ngram_jaccard_pairs(docs, 0.5, max_docs=10)
    # bounded inputs run
    assert dedup.ngram_jaccard_pairs(docs, 0.5, max_docs=None).count() > 0


def test_dedup_clusters_raises_on_non_convergence(spark):
    # a 12-node chain has diameter 11 -> min-label propagation cannot
    # finish in 2 rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a int, id_b int"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.dedup_clusters(pairs, max_iter=2)
    # and converges fine with enough rounds
    out = dedup.dedup_clusters(pairs, max_iter=20)
    assert out.filter(F.col("is_survivor")).count() == 1
