"""prepare_corpus: the one-call pipeline API — stage bookkeeping,
dedup/split invariants, and toggles."""

from __future__ import annotations

from pyspark.sql import functions as F

from gedixr_spark.pipeline import prepare_corpus


def _corpus(spark):
    rows = []
    for i in range(40):
        rows.append((i, f"document number {i} contains body text {i % 30} here"))
    # near-duplicates of docs 0-4: same text + one trailing token —
    # most shingles shared, so LSH bands collide
    for i in range(5):
        rows.append(
            (200 + i, f"document number {i} contains body text {i % 30} here extra")
        )
    rows.append((100, "tiny"))  # fails min_tokens
    rows.append((101, "spam " * 400))  # fails compression rail
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prepare_corpus_stages_and_invariants(spark):
    res = prepare_corpus(_corpus(spark), min_tokens=3, count_stages=True)
    stats = res["stats"]
    assert stats["input"] == 47
    assert stats["after_quality_gate"] < stats["input"]
    assert stats["after_compression_rail"] <= stats["after_quality_gate"]
    assert stats["after_exact_dedup"] <= stats["after_compression_rail"]
    assert 0 < stats["after_near_dedup"] <= stats["after_exact_dedup"]

    splits = res["splits"]
    assert {"split", "bucket"} <= set(splits.columns)
    # near-dup docs i / i+30 (shared body) must not straddle splits —
    # whichever of each pair survived; surviving cluster members agree
    by_doc = {r["doc_id"]: r["split"] for r in splits.collect()}
    clusters = {r["doc_id"]: r["cluster_id"] for r in res["clusters"].collect()}
    assert clusters, "fixture should produce near-dup clusters"
    # apply_dedup's guarantee: exactly ONE member of every detected
    # cluster survives into the splits (which planted pairs the LSH
    # bands catch is seeded-deterministic but parameter-sensitive —
    # the invariant isn't)
    from collections import Counter

    surviving_members = Counter(
        cid for doc_id, cid in clusters.items() if doc_id in by_doc
    )
    assert surviving_members and all(v == 1 for v in surviving_members.values())


def test_prepare_corpus_toggles(spark):
    docs = _corpus(spark)
    res = prepare_corpus(
        docs, min_tokens=3, compression_band=None, near_dedup=False,
        split_fractions={"train": 1.0}, count_stages=True,
    )
    assert res["clusters"].count() == 0
    assert "after_compression_rail" not in res["stats"]  # rail skipped
    assert "after_near_dedup" not in res["stats"]
    splits = res["splits"]
    assert splits.select("split").distinct().collect()[0]["split"] == "train"


def test_prepare_corpus_is_lazy_without_counts(spark):
    res = prepare_corpus(_corpus(spark))
    assert res["stats"] == {}
    assert res["splits"].count() > 0  # still evaluable


def test_prepare_corpus_token_budget_stage(spark):
    """token_budget keeps the best-scored dedup survivors within the
    running-token cap, BEFORE splitting (caps bind the corpus), and
    per-group caps bind each group independently."""
    from pyspark.sql import functions as F

    docs = _corpus(spark)
    base = prepare_corpus(docs, near_dedup=True)["splits"]
    capped = prepare_corpus(docs, near_dedup=True, token_budget=60)
    kept = capped["splits"]
    # kept set is a subset of the uncapped survivors
    base_ids = {r["doc_id"] for r in base.collect()}
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert kept_ids and kept_ids < base_ids
    # the cap really binds: total whitespace tokens of kept docs <= 60
    tok = kept.select(
        F.size(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("n")
    ).agg(F.sum("n").alias("t")).collect()[0]["t"]
    assert tok <= 60
    # budget columns don't leak into the output surface
    assert "__n_tok" not in kept.columns
    assert "stopword_ratio" not in kept.columns
