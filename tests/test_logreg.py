"""In-engine logistic regression vs a numpy full-batch-GD mirror."""

from __future__ import annotations

import numpy as np
import pytest

from osmgraphing_spark.operators import logreg


def _toy(spark, n=200, seed=7):
    rng = np.random.RandomState(seed)
    x1 = rng.uniform(0, 1, n)
    x2 = rng.uniform(0, 1, n)
    # separable-ish: label depends on x1 - x2
    y = (x1 - x2 + rng.normal(0, 0.1, n) > 0).astype(float)
    rows = [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    return df, np.c_[x1, x2], y


def _mirror(X, y, lr, iters):
    n, p = X.shape
    Xb = np.c_[np.ones(n), X]
    w = np.zeros(p + 1)
    for _ in range(iters):
        r = y - 1.0 / (1.0 + np.exp(-Xb @ w))
        w = w + lr * (Xb.T @ r) / n
    return w


@pytest.mark.parametrize("iters,lr", [(1, 1.0), (4, 1.0), (8, 0.5)])
def test_train_matches_numpy(spark, iters, lr):
    df, X, y = _toy(spark)
    got = logreg.train(df, ["x1", "x2"], "y", lr=lr, iters=iters)
    exp = _mirror(X, y, lr, iters)
    np.testing.assert_allclose(got, exp, atol=1e-9)


def test_training_separates(spark):
    df, X, y = _toy(spark)
    w = logreg.train(df, ["x1", "x2"], "y", lr=2.0, iters=30)
    # direction learned: positive on x1, negative on x2
    assert w[1] > 0 > w[2]
    from pyspark.sql import functions as F

    scored = df.withColumn("s", logreg.score(["x1", "x2"], w))
    auc_pairs = scored.where("y = 1").selectExpr("avg(s) a").collect()[0]["a"]
    neg = scored.where("y = 0").selectExpr("avg(s) a").collect()[0]["a"]
    assert auc_pairs > neg + 0.1


def test_score_is_pure_projection(spark):
    df, _, _ = _toy(spark)
    out = df.select(logreg.score(["x1", "x2"], [0.1, 0.2, -0.3]).alias("s"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffles: codegen'd projection


def test_train_releases_cache(spark):
    df, _, _ = _toy(spark)
    jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
    before = jmap.size()
    logreg.train(df, ["x1", "x2"], "y", iters=2)
    assert spark.sparkContext._jsc.sc().getPersistentRDDs().size() <= before
