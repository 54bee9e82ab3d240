"""Distributed k-means: convergence on separable data + determinism."""

import numpy as np

from gedixr_spark.operators.clustering import kmeans_cluster_sizes, kmeans_fit


def _separable(spark):
    rng = np.random.default_rng(5)
    rows = []
    for c, center in enumerate([[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]]):
        for i in range(20):
            v = (np.array(center) + rng.normal(0, 0.5, 3)).tolist()
            rows.append((c * 100 + i, v, c))
    return spark.createDataFrame(rows, ["vec_id", "embedding", "true_label"])


def test_kmeans_recovers_separable_clusters(spark):
    df = _separable(spark)
    _, assigned = kmeans_fit(df, k=3, n_iter=5)
    joined = assigned.join(df.select("vec_id", "true_label"), "vec_id").collect()
    # each true cluster maps to exactly one k-means cluster
    mapping = {}
    for r in joined:
        mapping.setdefault(r["true_label"], set()).add(r["cluster"])
    assert all(len(v) == 1 for v in mapping.values())
    assert len({next(iter(v)) for v in mapping.values()}) == 3


def test_kmeans_deterministic_across_runs(spark):
    df = _separable(spark)
    a = sorted((r["cluster"], r["n_vectors"]) for r in kmeans_cluster_sizes(df, k=3, n_iter=3).collect())
    b = sorted((r["cluster"], r["n_vectors"]) for r in kmeans_cluster_sizes(df, k=3, n_iter=3).collect())
    assert a == b == [(0, 20), (1, 20), (2, 20)]


def test_kmeans_on_real_embeddings(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    sizes = kmeans_cluster_sizes(emb, k=4, n_iter=3).collect()
    assert sum(r["n_vectors"] for r in sizes) == emb.count()
    assert len(sizes) >= 2  # no total collapse
