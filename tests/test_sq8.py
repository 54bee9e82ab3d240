"""SQ8 scalar quantization (similarity.sq8_*): reconstruction error
bound, recall vs the float brute pass, clamping, plan hygiene."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gedixr_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(3)
    # 4 well-separated clusters in R^16 so top-k structure is stable
    bases = rng.standard_normal((4, 16)) * 4.0
    rows = []
    vid = 0
    for b in bases:
        for _ in range(25):
            v = b + 0.3 * rng.standard_normal(16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df.localCheckpoint()


def test_reconstruction_error_within_half_step(spark, corpus):
    params = sim.sq8_train(corpus)
    enc = sim.sq8_encode(corpus, params)
    dec = enc.select(
        "vec_id", sim.sq8_decode(F.col("sq8"), params).alias("xhat")
    )
    joined = corpus.join(dec, "vec_id").select(
        F.max(
            F.array_max(
                F.zip_with(
                    "embedding", "xhat", lambda a, b: F.abs(a - b)
                )
            )
        ).alias("max_err")
    ).collect()[0]
    max_step = max(params["steps"])
    assert joined["max_err"] <= max_step / 2 + 1e-9


def test_codes_are_bytes(spark, corpus):
    params = sim.sq8_train(corpus)
    enc = sim.sq8_encode(corpus, params)
    mm = enc.select(
        F.min(F.array_min("sq8")).alias("lo"), F.max(F.array_max("sq8")).alias("hi")
    ).collect()[0]
    assert 0 <= mm["lo"] and mm["hi"] <= 255


def test_out_of_range_batch_clamps(spark, corpus):
    params = sim.sq8_train(corpus)
    wild = spark.createDataFrame(
        [(999, [1e6] * 16), (998, [-1e6] * 16)],
        "vec_id long, embedding array<double>",
    )
    enc = sim.sq8_encode(wild, params).collect()
    by_id = {r["vec_id"]: r["sq8"] for r in enc}
    assert all(c == 255 for c in by_id[999])
    assert all(c == 0 for c in by_id[998])


def test_recall_vs_float_brute(spark, corpus):
    """SQ8 at 16 dims over a clustered corpus: recall@5 vs the
    quantized brute pass must be near-perfect (scalar quantization is
    the near-lossless end of the compression curve)."""
    params = sim.sq8_train(corpus)
    enc = sim.sq8_encode(corpus, params).localCheckpoint()
    queries = corpus.filter(F.col("vec_id") % 25 == 0)  # one per cluster
    truth = {
        (r["query_id"], r["cand_id"])
        for r in sim.cosine_topk(queries, corpus, k=5).collect()
    }
    got = {
        (r["query_id"], r["cand_id"])
        for r in sim.sq8_topk(queries, enc, params, k=5).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, recall


def test_sq8_plan_is_python_free(spark, corpus):
    params = sim.sq8_train(corpus)
    enc = sim.sq8_encode(corpus, params)
    queries = corpus.limit(2)
    plan = (
        sim.sq8_topk(queries, enc, params, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_ivf_sq8_full_probe_equals_flat_scan(spark, corpus):
    """nprobe = n_cells makes the cell-restricted search equal the
    flat sq8_topk scan EXACTLY — same candidates, same scores, same
    ranks (cells are disjoint, so probing all of them recovers the
    whole corpus)."""
    params = sim.sq8_train(corpus)
    cents = sim.ivf_centroids(dim=16, n_cells=4, seed=7)
    idx = sim.sq8_index(corpus, params, cents).localCheckpoint()
    queries = corpus.filter(F.col("vec_id") % 25 == 0)
    flat = sorted(
        map(tuple, sim.sq8_topk(
            queries, sim.sq8_encode(corpus, params), params, k=5
        ).collect())
    )
    full = sorted(
        map(tuple, sim.ivf_sq8_ann_topk(
            queries, idx, params, cents, k=5, nprobe=4
        ).collect())
    )
    assert full == flat


def test_ivf_sq8_restricted_probe_is_subset_and_python_free(spark, corpus):
    params = sim.sq8_train(corpus)
    # learned centroids: quantized k-means fit — the production path
    from gedixr_spark.operators.clustering import kmeans_fit

    cents_f, _ = kmeans_fit(corpus, k=4, n_iter=4)
    cents = sim.kmeans_to_ivf_centroids(cents_f)
    idx = sim.sq8_index(corpus, params, cents).localCheckpoint()
    queries = corpus.filter(F.col("vec_id") % 25 == 0)
    out = sim.ivf_sq8_ann_topk(queries, idx, params, cents, k=5, nprobe=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    rows = out.collect()
    # clustered fixture + learned centroids: nprobe=1 recall vs the
    # flat scan should be high (each cluster maps to one cell)
    truth = {
        (r["query_id"], r["cand_id"])
        for r in sim.sq8_topk(
            queries, sim.sq8_encode(corpus, params), params, k=5
        ).collect()
    }
    got = {(r["query_id"], r["cand_id"]) for r in rows}
    assert len(got & truth) / len(truth) >= 0.8, len(got & truth) / len(truth)
