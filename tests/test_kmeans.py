"""Lloyd k-means — exact python-mirror replay + structural checks.

The portability contract (quantized int grid, integer round-half-up means,
lowest-cell-id tie-break) means the python mirror must match EXACTLY, not
within tolerance — any drift is a determinism bug, which is the property
the operator exists to provide.
"""

from __future__ import annotations

import numpy as np
import pytest

from osmgraphing_spark.operators import kmeans
from osmgraphing_spark.operators.similarity import Q_SCALE, int_centroids


def _quant(v):
    x = np.asarray(v, dtype=np.float64) * Q_SCALE
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int64)


def _py_lloyd(vecs, dim, k, iters, seed=42):
    """Exact mirror of kmeans.lloyd_kmeans on python ints."""
    q = {i: _quant(v) for i, v in vecs}
    cents = {j + 1: np.asarray(c, dtype=np.int64) for j, c in enumerate(int_centroids(dim, k, seed))}

    def assign(cents_d):
        out = {}
        for i, qv in q.items():
            best = min(
                ((int(((qv - c) ** 2).sum()), cid) for cid, c in cents_d.items()),
            )
            out[i] = (best[1], best[0])
        return out

    for _ in range(iters):
        a = assign(cents)
        acc: dict[int, list] = {}
        for i, (cid, _) in a.items():
            acc.setdefault(cid, []).append(q[i])
        cents = {
            cid: np.asarray(
                [(2 * int(s) + len(m)) // (2 * len(m)) for s in np.stack(m).sum(axis=0)],
                dtype=np.int64,
            )
            for cid, m in acc.items()
        }
    return assign(cents), cents


def _toy(n=80, dim=8, seed=5):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(4, dim))
    rows = []
    for i in range(n):
        c = centers[i % 4]
        rows.append((i, (c + 0.1 * rng.normal(size=dim)).astype("float32").tolist()))
    return rows


def test_lloyd_matches_python_mirror_exactly(spark):
    rows = _toy()
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got, cents = kmeans.lloyd_kmeans(df, dim=8, k=5, iters=3)
    out = {r["vec_id"]: (r["cell"], r["dist"]) for r in got.collect()}
    expect, pycents = _py_lloyd(rows, dim=8, k=5, iters=3)
    assert out == expect
    assert {cid: list(c) for cid, c in cents} == {
        cid: list(map(int, c)) for cid, c in pycents.items()
    }


def test_lloyd_partition_invariant(spark):
    rows = _toy(n=60)
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    a, _ = kmeans.lloyd_kmeans(df, dim=8, k=4, iters=2)
    b, _ = kmeans.lloyd_kmeans(df.repartition(7), dim=8, k=4, iters=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_lloyd_improves_over_init(spark):
    """Iterating must not increase total within-cluster distance vs the
    data-independent init (Lloyd monotonicity, integer rounding aside)."""
    rows = _toy(n=120)
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    init, _ = kmeans.lloyd_kmeans(df, dim=8, k=4, iters=0)
    run, _ = kmeans.lloyd_kmeans(df, dim=8, k=4, iters=4)
    d0 = init.groupBy().sum("dist").collect()[0][0]
    d4 = run.groupBy().sum("dist").collect()[0][0]
    assert d4 <= d0


def test_cluster_sizes_accounts_every_vector(spark):
    rows = _toy(n=50)
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    a, _ = kmeans.lloyd_kmeans(df, dim=8, k=3, iters=2)
    sizes = kmeans.cluster_sizes(a).collect()
    assert sum(r["n"] for r in sizes) == 50
    assert all(r["mean_dist"] >= 0 for r in sizes)


def test_lloyd_rejects_negative_iters(spark):
    df = spark.createDataFrame(_toy(n=4), ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        kmeans.lloyd_kmeans(df, dim=8, k=2, iters=-1)
