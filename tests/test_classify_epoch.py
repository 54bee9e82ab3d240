"""Trainable quality classifier (operators/classify.py) — numpy
differential on the full-batch GD — and deterministic epoch ordering
(sampling.epoch_order)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gedixr_spark.operators import classify
from gedixr_spark.operators.sampling import epoch_order


def _numpy_logreg(X, y, n_iter, lr, l2=0.0):
    w = np.zeros(X.shape[1] + 1)
    n = len(y)
    for _ in range(n_iter):
        m = w[0] + X @ w[1:]
        p = 1.0 / (1.0 + np.exp(-m))
        r = p - y
        grad = np.concatenate([[r.sum()], X.T @ r]) / n
        if l2 > 0:
            grad[1:] += l2 * w[1:]
        w = w - lr * grad
    return w


def _separable(spark, n=80, seed=5):
    rng = np.random.default_rng(seed)
    X0 = rng.standard_normal((n // 2, 3)) + np.array([2.0, 2.0, 0.0])
    X1 = rng.standard_normal((n // 2, 3)) + np.array([-2.0, -2.0, 0.0])
    X = np.vstack([X0, X1])
    y = np.array([1.0] * (n // 2) + [0.0] * (n // 2))
    rows = [(i, [float(v) for v in X[i]], float(y[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, features array<double>, label double")
    return df, X, y


def test_logreg_differential_vs_numpy(spark):
    df, X, y = _separable(spark)
    w = classify.logreg_fit(df, n_iter=30, lr=0.5)
    w_np = _numpy_logreg(X, y, 30, 0.5)
    # same arithmetic, only float-sum association differs
    assert np.allclose(w, w_np, atol=1e-8), (w, w_np)


def test_logreg_l2_differential_and_shrinkage(spark):
    df, X, y = _separable(spark)
    w = classify.logreg_fit(df, n_iter=30, lr=0.5, l2=0.1)
    w_np = _numpy_logreg(X, y, 30, 0.5, l2=0.1)
    assert np.allclose(w, w_np, atol=1e-8)
    w_free = classify.logreg_fit(df, n_iter=30, lr=0.5)
    assert np.linalg.norm(w[1:]) < np.linalg.norm(w_free[1:])


def test_logreg_predict_separates(spark):
    df, X, y = _separable(spark)
    w = classify.logreg_fit(df, n_iter=50, lr=0.5)
    scored = classify.logreg_predict(df, w)
    rows = scored.select("label", "quality_prob", "quality_pred").collect()
    acc = sum(int(r["quality_pred"] == int(r["label"])) for r in rows) / len(rows)
    assert acc == 1.0  # linearly separable by construction
    for r in rows:  # prob is a real sigmoid output
        assert 0.0 < r["quality_prob"] < 1.0


def test_logreg_validation(spark):
    df, _, _ = _separable(spark, n=8)
    with pytest.raises(ValueError):
        classify.logreg_fit(df, n_iter=0)
    with pytest.raises(ValueError):
        classify.logreg_fit(df.filter(F.lit(False)))


def test_quality_feature_vector_end_to_end(spark):
    """Labeled good/bad text → feature vector → fit → corpus scoring:
    the trained gate must separate obvious boilerplate junk from
    prose on held-out rows."""
    good = [
        "the quick brown fox jumps over the lazy dog and runs into the forest",
        "she walked to the market in the morning and bought fresh bread there",
        "a long time ago in a small village there lived an old carpenter",
        "the committee discussed the proposal at length before it was approved",
    ]
    bad = [
        "BUY NOW!!! CLICK CLICK CLICK BUY BUY BUY",
        "XXXXX ZZZZZ QQQQQ XXXXX ZZZZZ",
        "AAAAAAA BBBBBBB CCCCCCC DDDDDDD",
        "WIN WIN WIN FREE FREE FREE NOW NOW",
    ]
    rows = [(i, t, 1.0) for i, t in enumerate(good)] + [
        (100 + i, t, 0.0) for i, t in enumerate(bad)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    feats = classify.quality_feature_vector(df)
    w = classify.logreg_fit(feats, n_iter=200, lr=0.5)
    scored = classify.logreg_predict(feats, w)
    got = {r["doc_id"]: r["quality_pred"] for r in scored.collect()}
    assert all(got[i] == 1 for i in range(len(good)))
    assert all(got[100 + i] == 0 for i in range(len(bad)))


def test_epoch_order_deterministic_and_epoch_dependent(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], ["doc_id"])
    a = [r["doc_id"] for r in epoch_order(df, epoch=1, n_partitions=4).collect()]
    b = [r["doc_id"] for r in epoch_order(df.repartition(9), epoch=1, n_partitions=4).collect()]
    assert a == b  # deterministic under input partitioning
    c = [r["doc_id"] for r in epoch_order(df, epoch=2, n_partitions=4).collect()]
    assert a != c and sorted(a) == sorted(c) == list(range(500))
    # actually permuted, not id-ordered
    assert a != sorted(a)


def test_epoch_order_is_globally_sorted_by_key(spark):
    out = epoch_order(
        spark.createDataFrame([(i,) for i in range(300)], ["doc_id"]),
        epoch=3,
        n_partitions=5,
    )
    rows = out.select("order_key", F.spark_partition_id().alias("pid")).collect()
    # range partitioning: every key in partition i sorts before every
    # key in partition i+1, and keys are sorted within partitions
    by_pid = {}
    for r in rows:
        by_pid.setdefault(r["pid"], []).append(r["order_key"])
    pids = sorted(by_pid)
    for p in pids:
        assert by_pid[p] == sorted(by_pid[p])
    for p1, p2 in zip(pids, pids[1:]):
        if by_pid[p1] and by_pid[p2]:
            assert by_pid[p1][-1] <= by_pid[p2][0]
