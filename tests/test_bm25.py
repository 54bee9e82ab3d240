"""BM25 ranked retrieval (text.build_tf_index / bm25_topk): numpy
differential on the exact Lucene-variant formula, determinism of the
tie-broken ordering, and corpus-independence of the plan."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gedixr_spark.operators.text import bm25_topk, build_tf_index, doc_lengths

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox"),
    (2, "data systems and data pipelines move data"),
    (3, "lazy evaluation in data systems"),
    (4, "the the the the the"),
    (5, "completely unrelated text about gardening"),
]


def _numpy_bm25(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for term in {t.lower() for t in terms}:
        df = sum(1 for v in toks.values() if term in v)
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for i, v in toks.items():
            tf = v.count(term)
            if tf == 0:
                continue
            s = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(v) / avgdl))
            scores[i] = scores.get(i, 0.0) + s
    return scores


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return (
        build_tf_index(df).localCheckpoint(),
        doc_lengths(df).localCheckpoint(),
    )


def test_bm25_matches_numpy(corpus):
    idx, lens = corpus
    for terms in (["data"], ["the", "data"], ["quick", "lazy", "data"]):
        got = {
            r["doc_id"]: r["score"]
            for r in bm25_topk(idx, lens, terms, k=10).collect()
        }
        want = _numpy_bm25(DOCS, terms)
        assert set(got) == set(want), terms
        for d in want:
            assert got[d] == pytest.approx(want[d], rel=1e-12), (terms, d)


def test_bm25_rank_order_and_ties(corpus):
    idx, lens = corpus
    rows = bm25_topk(idx, lens, ["data", "systems"], k=3).collect()
    assert [r["rank"] for r in rows] == [1, 2]  # only 2 docs match
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # doc 2 (three 'data' + 'systems') must outrank doc 3
    assert rows[0]["doc_id"] == 2


def test_bm25_idf_never_negative(corpus):
    """Lucene variant: a term in EVERY doc still gets idf > 0, so
    adding a ubiquitous term can't subtract relevance."""
    idx, lens = corpus
    rows = bm25_topk(idx, lens, ["the"], k=10).collect()
    assert rows and all(r["score"] > 0 for r in rows)


def test_bm25_unknown_term_and_validation(spark, corpus):
    idx, lens = corpus
    assert bm25_topk(idx, lens, ["zzzz"], k=5).count() == 0
    with pytest.raises(ValueError, match="non-empty"):
        bm25_topk(idx, lens, [])
    with pytest.raises(ValueError, match="k1"):
        bm25_topk(idx, lens, ["data"], k1=-1)


def test_bm25_plan_touches_terms_only(corpus):
    """The index filter must reach the scan as a pushed-down IN — the
    retrieval cost is |terms| index rows, not the term space."""
    idx, lens = corpus
    plan = bm25_topk(idx, lens, ["data"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bm25_multi_equals_per_query_single(corpus):
    """bm25_topk_multi's one-pass batch retrieval must equal running
    the (numpy-pinned) single-query operator once per query — scores
    exact, ranks identical."""
    from gedixr_spark.operators.text import bm25_topk_multi

    idx, lens = corpus
    probes = {
        7: ["data"],
        8: ["the", "data"],
        9: ["quick", "lazy", "data"],
    }
    got = bm25_topk_multi(idx, lens, probes, k=4).collect()
    for qid, terms in probes.items():
        want = bm25_topk(idx, lens, terms, k=4).orderBy("rank").collect()
        got_q = sorted(
            (r for r in got if r["query_id"] == qid), key=lambda r: r["rank"]
        )
        assert [r["doc_id"] for r in got_q] == [r["doc_id"] for r in want]
        assert [r["rank"] for r in got_q] == [r["rank"] for r in want]
        for g, w in zip(got_q, want):
            assert g["score"] == pytest.approx(w["score"], rel=1e-12)


def test_bm25_multi_single_scan_and_validation(spark, corpus):
    """One broadcast hash-join against the query-terms table, no
    per-query plan duplication: exactly one scan of the tf index in
    the executed plan; empty queries rejected."""
    from gedixr_spark.operators.text import bm25_topk_multi

    idx, lens = corpus
    df = bm25_topk_multi(idx, lens, {1: ["data"], 2: ["lazy", "fox"]}, k=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    with pytest.raises(ValueError, match="no terms"):
        bm25_topk_multi(idx, lens, {1: []})
    with pytest.raises(ValueError, match="non-empty"):
        bm25_topk_multi(idx, lens, {})
    # unknown-only query contributes nothing; known query unaffected
    rows = bm25_topk_multi(idx, lens, {1: ["zzzz"], 2: ["data"]}, k=3).collect()
    assert {r["query_id"] for r in rows} == {2}


def test_incremental_index_equals_from_scratch(spark, tmp_path):
    """Three ingest batches folded with update_tf_index produce the
    EXACT index (terms, dfs, sorted postings) a from-scratch build on
    the full corpus produces — and BM25 over the maintained table
    matches BM25 over the fresh one."""
    from gedixr_spark.operators.text import (
        init_tf_index_table,
        update_tf_index,
    )
    from gedixr_spark.sinks.versioned import read_versioned

    batches = [DOCS[:2], DOCS[2:4], DOCS[4:]]
    path = str(tmp_path / "tfidx")
    init_tf_index_table(
        spark, path, spark.createDataFrame(batches[0], "doc_id long, text string")
    )
    for b in batches[1:]:
        update_tf_index(
            spark, path, spark.createDataFrame(b, "doc_id long, text string")
        )
    maintained = {
        r["term"]: (r["df"], r["postings"])
        for r in read_versioned(spark, path).collect()
    }
    full = spark.createDataFrame(DOCS, "doc_id long, text string")
    scratch = {
        r["term"]: (r["df"], r["postings"])
        for r in build_tf_index(full).collect()
    }
    assert maintained == scratch

    got = bm25_topk(
        read_versioned(spark, path), doc_lengths(full), ["data", "lazy"], k=5
    ).collect()
    want = bm25_topk(
        build_tf_index(full), doc_lengths(full), ["data", "lazy"], k=5
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_incremental_index_time_travel(spark, tmp_path):
    """The commit log gives the index time travel: version 1 is the
    first batch's index, unchanged by later folds."""
    from gedixr_spark.operators.text import (
        init_tf_index_table,
        update_tf_index,
    )
    from gedixr_spark.sinks.versioned import read_versioned

    path = str(tmp_path / "tfidx_tt")
    b0 = spark.createDataFrame(DOCS[:2], "doc_id long, text string")
    init_tf_index_table(spark, path, b0)
    update_tf_index(
        spark, path, spark.createDataFrame(DOCS[2:], "doc_id long, text string")
    )
    v1 = {
        r["term"]: (r["df"], r["postings"])
        for r in read_versioned(spark, path, version=1).collect()
    }
    scratch0 = {
        r["term"]: (r["df"], r["postings"])
        for r in build_tf_index(b0).collect()
    }
    assert v1 == scratch0


def test_chunk_documents_windows(spark):
    from gedixr_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
            (2, "a b"),                                  # shorter than chunk
            (3, ""),                                     # empty → no chunks
            (4, " ".join(f"x{i}" for i in range(9))),    # exact boundary
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: stride 3 → starts 0,3,6 cover [0..10): ceil((10-4)/3)+1 = 3
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["chunk_start"] for r in c1] == [0, 3, 6]
    assert c1[0]["chunk_text"] == "t0 t1 t2 t3"
    assert c1[2]["chunk_text"] == "t6 t7 t8 t9"
    assert c1[2]["n_tokens"] == 4
    # overlap: last token of chunk i == first token of chunk i+1
    assert c1[0]["chunk_text"].split()[-1] == c1[1]["chunk_text"].split()[0]
    assert [r["chunk_text"] for r in by_doc[2]] == ["a b"]
    assert 3 not in by_doc
    # 9 tokens, chunk 4, stride 3: starts 0,3,6 — last is exactly 3 long? no, slice(7,4)->3 tokens
    c4 = sorted(by_doc[4], key=lambda r: r["chunk_id"])
    assert [r["n_tokens"] for r in c4] == [4, 4, 3]

    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=4, overlap=4)
