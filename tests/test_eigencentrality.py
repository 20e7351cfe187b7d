"""Eigenvector centrality vs a numpy L1-power-iteration mirror (fixed
iterations are an exact rational function of the adjacency — exact
agreement expected) plus a spectral cross-check against numpy's principal
eigenvector at convergence."""

from __future__ import annotations

import numpy as np
import pytest

from osmgraphing_spark.operators import eigencentrality

from .helpers import build_fixture


def _adj(n, edges, weights=None, symmetrize=True, add_weights=False):
    a = np.zeros((n, n), dtype=np.float64)
    w = weights if weights is not None else [1.0] * len(edges)
    for (s, d), ww in zip(edges, w):
        a[s, d] = ww if add_weights is False else a[s, d] + ww
    if symmetrize:
        if add_weights:
            a = a + a.T
            np.fill_diagonal(a, 0.0)
        else:
            a = np.maximum(a, a.T)
            np.fill_diagonal(a, 0.0)
            a[a > 0] = 1.0
    return a


def _py_eigen(a, iters):
    n = a.shape[0]
    x = np.full(n, 1.0 / n)
    for _ in range(iters):
        x = a.T @ x
        t = x.sum()
        assert t > 0
        x = x / t
    return x


@pytest.mark.parametrize("names", [("small",), ("stuttgart",), ("twocc",)])
def test_eigen_vs_mirror_unweighted(spark, names):
    g, edges, _ = build_fixture(spark, names)
    res = eigencentrality.run(g, max_iter=6)
    got = np.zeros(g.num_vertices)
    for r in res.collect():
        got[r["vid"]] = r["score"]
    exp = _py_eigen(_adj(g.num_vertices, edges), 6)
    np.testing.assert_allclose(got, exp, rtol=1e-12, atol=1e-12)


def test_eigen_vs_mirror_weighted_symmetrized(spark):
    g, edges, weights = build_fixture(spark, ("small",))
    res = eigencentrality.run(g, max_iter=5, weighted=True)
    got = np.zeros(g.num_vertices)
    for r in res.collect():
        got[r["vid"]] = r["score"]
    a = _adj(g.num_vertices, edges, weights, symmetrize=True, add_weights=True)
    exp = _py_eigen(a, 5)
    np.testing.assert_allclose(got, exp, rtol=1e-12, atol=1e-12)


def test_eigen_converges_to_principal_eigenvector(spark):
    # connected + odd cycle (non-bipartite) => power iteration converges
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 0), (1, 4)]
    n = 5
    df = spark.createDataFrame(
        [(f"v{s}", f"v{d}", 1.0) for s, d in edges],
        "src_key string, dst_key string, weight double",
    )
    from osmgraphing_spark.operators.build import build_graph

    g = build_graph(df, num_blocks=2, id_partitions=2)
    res = eigencentrality.run(g, max_iter=200, tol=1e-12)
    got = np.zeros(n)
    for r in res.collect():
        got[r["vid"]] = r["score"]
    a = _adj(n, [(r["src"], r["dst"]) for r in g.edges.collect()])
    vals, vecs = np.linalg.eigh(a)
    v = np.abs(vecs[:, np.argmax(vals)])
    v = v / v.sum()
    np.testing.assert_allclose(got, v, atol=1e-9)


def test_eigen_directed_dag_raises(spark):
    df = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0)],
        "src_key string, dst_key string, weight double",
    )
    from osmgraphing_spark.operators.build import build_graph

    g = build_graph(df, num_blocks=2, id_partitions=2)
    with pytest.raises(ValueError, match="no principal eigenvector"):
        eigencentrality.run(g, max_iter=6, symmetrize=False)


def test_eigen_leaves_no_blocks(spark):
    from .test_hits import _persistent_ids

    g, _, _ = build_fixture(spark, ("stuttgart",))
    before = _persistent_ids(spark)
    res = eigencentrality.run(g, max_iter=5)
    assert res.count() == g.num_vertices
    assert _persistent_ids(spark) <= before
