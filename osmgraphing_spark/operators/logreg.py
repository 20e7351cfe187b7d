"""In-engine logistic regression — the GPT-3/CCNet-style quality classifier.

LLM-data-pipeline extension: the classic crawl-filtering recipe trains a
linear classifier to separate a HIGH-QUALITY SEED source (WebText /
Wikipedia / books) from the raw crawl, then keeps crawl documents the
classifier scores seed-like (GPT-3 App. A; CCNet uses the same shape with
a fasttext model). This module trains that classifier fully inside the
engine — no sklearn, no driver-side data — with deterministic full-batch
gradient descent so training itself is replayable in SQL:

    w_{k+1,j} = w_{k,j} + lr/N · Σ_i (y_i − σ(w_k · x_i)) · x_{ij}

Scale design:
- the (narrow) feature frame is persisted once; each GD iteration is ONE
  map-side-combinable aggregate over it (p+1 sums — p is the feature
  count, single digits), nothing else touches the corpus.
- model state is p+1 doubles on the driver — bounded, data-scale-
  independent (the same discipline as convergence scalars / the raked
  cell matrix), folded back into the next iteration's plan as literals,
  so the whole training run is K aggregates over one cached frame.
- scoring is a pure column expression (σ of a dot product of literals) —
  whole-stage-codegen'd, zero shuffles, usable as a streaming filter too.

Determinism: features and labels are column expressions, iteration count
is fixed, and each update is plain IEEE double arithmetic → the
``doc_lr_quality`` driver query value-checks the trained weights AND every
document's score against an unrolled SQL replay of the same GD.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def _margin(feature_cols: list[str], weights: list[float]) -> Column:
    z = F.lit(float(weights[0]))
    for c, w in zip(feature_cols, weights[1:]):
        z = z + F.lit(float(w)) * F.col(c)
    return z


def train(
    features: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 1.0,
    iters: int = 4,
) -> list[float]:
    """Full-batch GD from w = 0. → [bias, w_1, …, w_p] after ``iters``
    steps. ``features`` should be the slim projection (features + label
    only); it is persisted here and released before returning."""
    f = features.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("_y"),
    ).persist()
    try:
        n = float(f.count())
        w = [0.0] * (len(feature_cols) + 1)
        if n == 0:
            return w
        for _ in range(iters):
            resid = F.col("_y") - _sigmoid(_margin(feature_cols, w))
            aggs = [F.sum(resid).alias("g0")] + [
                F.sum(resid * F.col(c)).alias(f"g{j + 1}")
                for j, c in enumerate(feature_cols)
            ]
            g = f.agg(*aggs).collect()[0]
            w = [
                w[j] + lr * float(g[f"g{j}"]) / n
                for j in range(len(w))
            ]
        return w
    finally:
        f.unpersist()


def score(feature_cols: list[str], weights: list[float]) -> Column:
    """σ(w · x) as a pure column expression over ``feature_cols``."""
    return _sigmoid(_margin(feature_cols, weights))
