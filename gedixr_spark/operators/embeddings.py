"""Vector-space transforms for the embedding column: distributed
moments (mean/covariance), PCA, OPQ-style balanced rotation, and a
map-only rotation apply.

Why this lives next to the PQ path (`similarity.py`): product
quantization splits the vector into contiguous sub-spaces and trains a
codebook per slice. On raw embeddings the variance is (a) correlated
across the split boundaries and (b) unevenly distributed between
slices, so some codebooks waste their ksub centroids on near-constant
dims while others drown. The classic fix (Ge et al., "Optimized
Product Quantization", CVPR 2013 — the parametric/eigenvalue-
allocation variant) is a single orthogonal rotation applied before
encoding: PCA to decorrelate, then a permutation of the principal
directions that balances total variance across the m sub-spaces.
`test_embeddings_pca.py` pins a measured recall@k improvement of
PQ-on-rotated over PQ-on-raw via `similarity.ann_recall`.

Scale shape: the only distributed work is ONE `mapInPandas` pass
emitting per-batch partial (n, Σx, ΣxᵀX) rows — dim²+dim+1 doubles per
batch, a few KiB — reduced on the driver with numpy. The eigen-solve
is a dim×dim driver problem (64×64 here; even 4096-dim embeddings are
a sub-second eigh). Applying the rotation is a map-only Arrow matmul:
no shuffle anywhere in the whole pipeline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType


def embedding_moments(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, mean, covariance) of an array column in one distributed pass.

    Each Arrow batch contributes one partial row (count, Σx, flattened
    ΣXᵀX); partials are summed on the driver (their count is the number
    of batches — executor-count-scale, not row-scale). Covariance is
    the population form ΣXᵀX/n − μμᵀ, symmetrized against float drift.
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])

    def _partials(batches):
        for pdf in batches:
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [mat.shape[0]],
                    "s": [mat.sum(axis=0)],
                    "xx": [(mat.T @ mat).ravel()],
                }
            )

    parts = (
        df.select(vec_col)
        .mapInPandas(_partials, schema="n long, s array<double>, xx array<double>")
        .toPandas()
    )
    n = int(parts["n"].sum())
    if n == 0:
        raise ValueError("embedding_moments on an empty DataFrame")
    s = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
    xx = np.sum(np.stack(parts["xx"].to_numpy()), axis=0).reshape(dim, dim)
    mean = s / n
    cov = xx / n - np.outer(mean, mean)
    return n, mean, (cov + cov.T) / 2.0


def pca_rotation(cov: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Eigen-decompose a covariance matrix → (eigenvalues descending,
    rotation matrix whose COLUMNS are the matching eigenvectors).
    ``x @ R`` expresses x in the principal basis. Sign convention:
    each eigenvector's largest-|.| component is made positive so the
    rotation is deterministic across LAPACK builds."""
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    flip = np.sign(vecs[np.abs(vecs).argmax(axis=0), np.arange(vecs.shape[1])])
    flip[flip == 0] = 1.0
    return vals, vecs * flip[None, :]


def balance_eigen_allocation(eigvals: np.ndarray, m: int) -> np.ndarray:
    """Eigenvalue-allocation permutation (parametric OPQ): deal the
    principal directions, largest first, into the m sub-space buckets,
    always to the bucket with the smallest current log-variance product
    that still has room. Returns the permutation (column order) such
    that consecutive dim/m-sized slices of the permuted basis hold
    balanced variance. Zero/negative eigenvalues floor at a tiny
    epsilon so log stays defined."""
    dim = len(eigvals)
    if dim % m != 0:
        raise ValueError(f"m={m} must divide dim={dim}")
    dsub = dim // m
    buckets: list[list[int]] = [[] for _ in range(m)]
    loads = np.zeros(m)
    for idx in np.argsort(eigvals)[::-1]:
        open_b = [b for b in range(m) if len(buckets[b]) < dsub]
        b = min(open_b, key=lambda b: loads[b])
        buckets[b].append(int(idx))
        loads[b] += np.log(max(float(eigvals[idx]), 1e-12))
    return np.array([i for bucket in buckets for i in bucket])


def opq_rotation(
    df: DataFrame, vec_col: str = "embedding", m: int = 2, dim: int | None = None
) -> np.ndarray:
    """Train the OPQ rotation from data: distributed moments → PCA →
    eigenvalue-balanced column permutation for ``m`` PQ sub-spaces.
    Returns the dim×dim orthogonal matrix to pass to
    ``rotate_embeddings`` before `similarity.train_pq_codebooks` /
    `pq_ann_topk`."""
    _, _, cov = embedding_moments(df, vec_col=vec_col, dim=dim)
    vals, rot = pca_rotation(cov)
    perm = balance_eigen_allocation(vals, m)
    return rot[:, perm]


def rotate_embeddings(
    df: DataFrame,
    rotation: np.ndarray,
    vec_col: str = "embedding",
    out_col: str | None = None,
) -> DataFrame:
    """Apply ``x @ rotation`` to every vector — map-only Arrow matmul,
    the rotation rides the closure (dim² doubles). Output replaces
    ``vec_col`` unless ``out_col`` is given."""
    rot = np.ascontiguousarray(rotation, dtype=np.float64)

    @pandas_udf(ArrayType(DoubleType()))
    def _rot(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        return pd.Series(list(mat @ rot))

    return df.withColumn(out_col or vec_col, _rot(F.col(vec_col)))


def l2_normalize(vec_col: Column | str, eps: float = 1e-12) -> Column:
    """Unit-norm an array column JVM-side (aggregate + transform — no
    Python). Cosine similarity on normalized vectors reduces to a dot
    product, which is what the PQ/IVF L2 machinery approximates best."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    norm = F.sqrt(
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )
    return F.transform(c, lambda x: x.cast("double") / F.greatest(norm, F.lit(eps)))
