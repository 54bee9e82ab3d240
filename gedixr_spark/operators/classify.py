"""Trainable quality classifier: distributed logistic regression over
feature arrays (SURVEY.md §7.4 extension — the learned upgrade over the
threshold gates in text.py: C4/Gopher rules and the bigram-LM
perplexity gate are fixed heuristics; production pipelines train a
lightweight classifier on labeled good/bad examples and score the
corpus with it, fastText-style).

Same iterate-broadcast-aggregate shape as clustering.kmeans_fit: the
driver holds only the (dim+1) weight vector; each iteration is ONE
full-batch gradient aggregate — per-row column math (dot product via
zip_with fold, sigmoid via F.exp) feeding a single Summarizer vector
sum, so executors never see global state and nothing but a (dim+1)
vector crosses the wire per iteration. Full-batch GD is deliberate:
exact, order-insensitive up to float-sum association, reproducible —
at 100 TB you fit on a (deterministic) sample anyway, and scoring is
the map-only part that touches the full corpus.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot_lit(vec_col: Column, w: np.ndarray) -> Column:
    """x · w for a literal weight vector (JVM column math, no UDF)."""
    warr = F.array(*[F.lit(float(v)) for v in w])
    return F.aggregate(
        F.zip_with(vec_col, warr, lambda x, v: x.cast("double") * v),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def logreg_fit(
    df: DataFrame,
    features_col: str = "features",
    label_col: str = "label",
    n_iter: int = 50,
    lr: float = 1.0,
    l2: float = 0.0,
    dim: int | None = None,
) -> np.ndarray:
    """Full-batch gradient-descent logistic regression. ``features``
    is array<double>, ``label`` ∈ {0, 1}. Returns weights as
    np.ndarray of length dim+1 — w[0] is the bias. ``l2`` applies to
    the non-bias weights only (standard)."""
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.stat import Summarizer

    if n_iter <= 0 or lr <= 0:
        raise ValueError(f"need n_iter > 0 and lr > 0, got {n_iter}, {lr}")
    if dim is None:
        head = df.select(features_col).first()
        if head is None:
            raise ValueError("cannot fit on an empty DataFrame")
        dim = len(head[0])
    n = df.count()
    if n == 0:
        raise ValueError("cannot fit on an empty DataFrame")
    w = np.zeros(dim + 1, dtype=np.float64)
    x = F.col(features_col)
    y = F.col(label_col).cast("double")
    for _ in range(n_iter):
        margin = F.lit(float(w[0])) + _dot_lit(x, w[1:])
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
        resid = p - y
        row = df.select(
            F.sum(resid).alias("g0"),
            Summarizer.sum(
                array_to_vector(F.transform(x, lambda v: v.cast("double") * resid))
            ).alias("g"),
        ).collect()[0]
        grad = np.concatenate([[row["g0"]], np.asarray(row["g"].toArray())]) / n
        if l2 > 0:
            grad[1:] += l2 * w[1:]
        w = w - lr * grad
    return w


def logreg_predict(
    df: DataFrame,
    weights: np.ndarray,
    features_col: str = "features",
    prob_col: str = "quality_prob",
    pred_col: str = "quality_pred",
    threshold: float = 0.5,
) -> DataFrame:
    """Score with trained weights — pure map-side column math (the
    100 TB-touching half). Adds sigmoid probability and a thresholded
    0/1 prediction."""
    w = np.asarray(weights, dtype=np.float64)
    margin = F.lit(float(w[0])) + _dot_lit(F.col(features_col), w[1:])
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return df.withColumn(prob_col, p).withColumn(
        pred_col, (F.col(prob_col) >= threshold).cast("int")
    )


def quality_feature_vector(
    df: DataFrame, text_col: str = "text", out_col: str = "features"
) -> DataFrame:
    """text.quality_features → a normalized feature array ready for
    logreg_fit/predict: [n_tokens/100, mean_token_len/10,
    stopword_ratio, upper_ratio]. The normalization keeps full-batch
    GD well-conditioned without a standardization pass."""
    from gedixr_spark.operators.text import quality_features

    qf = quality_features(df, text_col=text_col)
    return qf.withColumn(
        out_col,
        F.array(
            (F.col("n_tokens").cast("double") / 100.0),
            (F.col("mean_token_len") / 10.0),
            F.col("stopword_ratio"),
            F.col("upper_ratio"),
        ),
    )
