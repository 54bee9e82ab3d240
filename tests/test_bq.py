"""Binary quantization (similarity.bq_*): exact packing/Hamming
differentials vs numpy, recall vs the exact brute pass, plan hygiene.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gedixr_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(11)
    # 4 well-separated clusters in R^72 (not a multiple of 64 → the
    # trailing partial word path is exercised)
    bases = rng.standard_normal((4, 72)) * 4.0
    rows = []
    vid = 0
    for b in bases:
        for _ in range(25):
            v = b + 0.3 * rng.standard_normal(72)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df.localCheckpoint()


def _np_pack(mat: np.ndarray, thr: np.ndarray) -> np.ndarray:
    """MSB-first fold-packing twin of bq_pack: word = acc*2 + bit."""
    bits = (mat > thr).astype(np.int64)
    n, dim = bits.shape
    n_words = (dim + 63) // 64
    out = np.zeros((n, n_words), dtype=np.int64)
    for j in range(n_words):
        chunk = bits[:, j * 64 : (j + 1) * 64]
        w = np.zeros(n, dtype=np.int64)
        for c in range(chunk.shape[1]):
            w = np.left_shift(w, 1) | chunk[:, c]
        out[:, j] = w
    return out


def test_pack_matches_numpy(spark, corpus):
    params = sim.bq_train(corpus)
    enc = sim.bq_encode(corpus, params).orderBy("vec_id").collect()
    pdf = corpus.orderBy("vec_id").toPandas()
    mat = np.array(pdf["embedding"].tolist())
    want = _np_pack(mat, np.array(params["thresholds"]))
    got = np.array([r["bq"] for r in enc], dtype=np.int64)
    assert got.shape == (100, 2)  # 72 dims → 2 words
    assert (got == want).all()


def test_hamming_matches_numpy(spark, corpus):
    params = sim.bq_train(corpus)
    enc = sim.bq_encode(corpus, params)
    a = enc.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("ida"), F.col("bq").alias("ca")
    )
    b = enc.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("idb"), F.col("bq").alias("cb")
    )
    got = {
        (r["ida"], r["idb"]): r["h"]
        for r in a.crossJoin(b)
        .select("ida", "idb", sim.hamming(F.col("ca"), F.col("cb")).alias("h"))
        .collect()
    }
    pdf = corpus.filter(F.col("vec_id") < 10).orderBy("vec_id").toPandas()
    mat = np.array(pdf["embedding"].tolist())
    packed = _np_pack(mat, np.array(params["thresholds"]))
    for i in range(10):
        for j in range(10):
            x = np.bitwise_xor(packed[i], packed[j])
            want = sum(bin(int(w) & (2**64 - 1)).count("1") for w in x)
            assert got[(i, j)] == want
    assert got[(3, 3)] == 0


def test_recall_vs_brute(spark, corpus):
    params = sim.bq_train(corpus)
    queries = corpus.filter(F.col("vec_id") < 8)
    # shortlist=6 → 30 Hamming candidates: inside a 25-member cluster
    # codes nearly tie on Hamming, so the shortlist must cover the
    # whole cluster for the exact rerank to recover the true top-5
    approx = sim.bq_ann_topk(queries, corpus, params, k=5, shortlist=6)
    exact = sim.cosine_topk(queries, corpus, k=5)
    rec = (
        sim.ann_recall(approx, exact)
        .filter(F.col("query_id").isNull())
        .collect()[0]["recall"]
    )
    # well-separated clusters + 4k-shortlist exact rerank: near-perfect
    assert rec >= 0.95


def test_rerank_is_exact_cosine(spark, corpus):
    """Survivor scores must equal the brute pass bit-for-bit (same
    int-quantized cosine), so rank-1 self-neighbors agree exactly."""
    params = sim.bq_train(corpus)
    queries = corpus.filter(F.col("vec_id") < 3)
    approx = {
        (r["query_id"], r["cand_id"]): r["cosine"]
        for r in sim.bq_ann_topk(queries, corpus, params, k=5).collect()
    }
    exact = {
        (r["query_id"], r["cand_id"]): r["cosine"]
        for r in sim.cosine_topk(queries, corpus, k=5).collect()
    }
    common = set(approx) & set(exact)
    assert common
    for key in common:
        assert approx[key] == exact[key]


def test_plan_is_python_free_and_broadcast(spark, corpus):
    params = sim.bq_train(corpus)
    queries = corpus.filter(F.col("vec_id") < 3)
    plan = sim.bq_ann_topk(queries, corpus, params, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_guards(spark, corpus):
    with pytest.raises(ValueError):
        sim.bq_train(corpus.limit(0))
    with pytest.raises(ValueError):
        sim.bq_ann_topk(corpus, corpus, {"thresholds": [0.0] * 72}, k=0)
