"""HITS hubs & authorities vs a numpy mutual-reinforcement oracle."""

from __future__ import annotations

import numpy as np
import pytest

from osmgraphing_spark.operators import hits

from . import oracle
from .helpers import build_fixture


@pytest.mark.parametrize("names", [("small",), ("stuttgart",), ("twocc",)])
def test_hits_vs_oracle(spark, names):
    g, edges, _ = build_fixture(spark, names)
    n = g.num_vertices
    res = hits.run(g, max_iter=12, tol=0.0)
    got_h, got_a = np.zeros(n), np.zeros(n)
    for r in res.collect():
        got_h[r["vid"]], got_a[r["vid"]] = r["hub"], r["authority"]
    exp_h, exp_a = oracle.hits(n, edges, max_iter=12, tol=0.0)
    np.testing.assert_allclose(got_h, exp_h, atol=1e-9)
    np.testing.assert_allclose(got_a, exp_a, atol=1e-9)
    assert abs(got_h.sum() - 1.0) < 1e-9 and abs(got_a.sum() - 1.0) < 1e-9


def _persistent_ids(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = jmap.keysIterator()
    out = set()
    while it.hasNext():
        out.add(it.next())
    return out


def test_hits_converges_and_leaves_no_blocks(spark):
    g, _, _ = build_fixture(spark, ("stuttgart",))
    before = _persistent_ids(spark)
    res = hits.run(g, max_iter=50, tol=1e-9)
    assert res.count() == g.num_vertices
    # loop-scoped caches must be gone (block-hygiene discipline)
    assert _persistent_ids(spark) <= before
