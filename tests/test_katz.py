"""Katz centrality vs a numpy fixed-iteration mirror (the recurrence is a
polynomial in the adjacency matrix — exact agreement expected)."""

from __future__ import annotations

import numpy as np
import pytest

from osmgraphing_spark.operators import katz

from .helpers import build_fixture


def _py_katz(n, edges, alpha, beta, iters, weights=None):
    x = np.full(n, beta, dtype=np.float64)
    w = np.asarray(weights if weights is not None else [1.0] * len(edges))
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    for _ in range(iters):
        nxt = np.full(n, beta, dtype=np.float64)
        np.add.at(nxt, dst, alpha * w * x[src])
        x = nxt
    return x


@pytest.mark.parametrize("names", [("small",), ("stuttgart",), ("twocc",)])
@pytest.mark.parametrize("weighted", [False, True])
def test_katz_vs_mirror(spark, names, weighted):
    g, edges, weights = build_fixture(spark, names)
    res = katz.run(g, alpha=0.07, beta=1.0, max_iter=6, weighted=weighted)
    got = np.zeros(g.num_vertices)
    for r in res.collect():
        got[r["vid"]] = r["katz"]
    exp = _py_katz(
        g.num_vertices, edges, 0.07, 1.0, 6, weights if weighted else None
    )
    np.testing.assert_allclose(got, exp, rtol=1e-12, atol=1e-12)


def test_katz_zero_iters_is_beta(spark):
    g, _, _ = build_fixture(spark, ("small",))
    vals = {r["katz"] for r in katz.run(g, beta=2.5, max_iter=0).collect()}
    assert vals == {2.5}


def test_katz_leaves_no_blocks(spark):
    from .test_hits import _persistent_ids

    g, _, _ = build_fixture(spark, ("stuttgart",))
    before = _persistent_ids(spark)
    res = katz.run(g, max_iter=5)
    assert res.count() == g.num_vertices
    assert _persistent_ids(spark) <= before
