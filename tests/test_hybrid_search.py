"""Reciprocal-rank fusion (text.rrf_fuse) and the hybrid_search
contract query: exact python differential on the 1/(k+rank) fusion
math, asymmetric-coverage semantics (a doc absent from one list),
per-query grouping, and leg-consistency of the composed BM25+dense
query (the fused output must equal the python fusion of the collected
legs — the legs themselves are differential-tested in test_bm25.py and
the similarity suite)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gedixr_spark.operators.text import rrf_fuse


def _py_rrf(lists, k=60):
    """Reference fusion: dict id -> score over lists of [ids in rank
    order] (rank = 1-based position)."""
    out = {}
    for lst in lists:
        for r, i in enumerate(lst, start=1):
            out[i] = out.get(i, 0.0) + 1.0 / (k + r)
    return out


def _ranking_df(spark, ids):
    return spark.createDataFrame(
        [(i, r) for r, i in enumerate(ids, start=1)], "doc_id long, rank int"
    )


def test_rrf_matches_python_reference(spark):
    a = [3, 1, 4, 1 + 4, 9]  # 3,1,4,5,9
    b = [9, 9 - 7, 6, 5, 3]  # 9,2,6,5,3
    got = {
        r["doc_id"]: r["rrf_score"]
        for r in rrf_fuse(
            [_ranking_df(spark, a), _ranking_df(spark, b)], rrf_k=60
        ).collect()
    }
    want = _py_rrf([a, b], k=60)
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], abs=1e-12)


def test_rrf_absent_doc_contributes_nothing(spark):
    # doc 6 appears only in list b at rank 3 -> score is exactly
    # 1/(k+3); no phantom contribution from list a
    a = [1, 2]
    b = [1, 2, 6]
    got = {
        r["doc_id"]: r["rrf_score"]
        for r in rrf_fuse(
            [_ranking_df(spark, a), _ranking_df(spark, b)], rrf_k=60
        ).collect()
    }
    assert got[6] == pytest.approx(1.0 / 63, abs=1e-12)


def test_rrf_rank_order_and_ties(spark):
    # doc 7 in both lists at rank 1; docs 1,2 in both lists at
    # swapped ranks 2/3 -> identical scores, tie broken by ascending id
    a = [7, 1, 2]
    b = [7, 2, 1]
    rows = rrf_fuse(
        [_ranking_df(spark, a), _ranking_df(spark, b)], rrf_k=10
    ).collect()
    by_rank = {r["rank"]: r["doc_id"] for r in rows}
    want = _py_rrf([a, b], k=10)
    order = sorted(want, key=lambda i: (-want[i], i))
    assert [by_rank[r] for r in sorted(by_rank)] == order
    # docs 1 and 2 tie exactly (1/12+1/11 each); ascending-id break
    assert want[1] == want[2]
    assert order.index(1) < order.index(2)


def test_rrf_per_query_grouping_and_topk(spark):
    df = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (1, 11, 1), (1, 10, 2)],
        "query_id long, doc_id long, rank int",
    )
    dense = spark.createDataFrame(
        [(0, 10, 1), (1, 12, 1)], "query_id long, doc_id long, rank int"
    )
    out = rrf_fuse([df, dense], rrf_k=0, query_col="query_id", topk=1).collect()
    top = {r["query_id"]: r["doc_id"] for r in out}
    # q0: doc 10 fused from both lists at rank 1 (2.0) beats 11 (0.5)
    # q1: doc 11 (1.0) ties doc 12 (1.0) -> ascending id wins
    assert top == {0: 10, 1: 11}
    assert all(r["rank"] == 1 for r in out)


def test_rrf_input_validation(spark):
    with pytest.raises(ValueError):
        rrf_fuse([])
    with pytest.raises(ValueError):
        rrf_fuse([_ranking_df(spark, [1])], rrf_k=-1)


def test_hybrid_search_query_equals_python_fusion_of_its_legs(spark):
    """Recompose q_hybrid_search's two legs independently, fuse them
    in python, and demand the contract query's output matches score-
    and order-exactly."""
    from gedixr_spark import contract_ext as ce
    from gedixr_spark.operators import similarity
    from gedixr_spark.operators.text import bm25_topk, build_tf_index, doc_lengths

    sf_dir = "/root/testdata/sf0.001"
    docs = ce._t(spark, sf_dir, "documents")
    emb = ce._t(spark, sf_dir, "embeddings")
    idx = build_tf_index(docs)
    dl = doc_lengths(docs)
    probes = {10: ["the", "data", "model"], 20: ["spark", "join"],
              30: ["hash", "table", "scan"]}
    legs = {}
    for qid, terms in probes.items():
        lex = [
            r["doc_id"]
            for r in bm25_topk(idx, dl, terms, k=20)
            .orderBy("rank")
            .collect()
        ]
        legs[qid] = [lex]
    dense = (
        similarity.cosine_topk(
            emb.filter(F.col("vec_id").isin(list(probes))), emb, k=20
        )
        .orderBy("query_id", "rank")
        .collect()
    )
    for qid in probes:
        legs[qid].append(
            [r["cand_id"] for r in dense if r["query_id"] == qid]
        )
    got = ce.q_hybrid_search(spark, sf_dir).collect()
    for qid in probes:
        want = _py_rrf(legs[qid], k=60)
        order = sorted(want, key=lambda i: (-want[i], i))[:10]
        got_q = sorted(
            (r for r in got if r["query_id"] == qid), key=lambda r: r["rank"]
        )
        assert [r["doc_id"] for r in got_q] == order
        for r in got_q:
            assert r["rrf_score"] == pytest.approx(want[r["doc_id"]], abs=1e-12)
