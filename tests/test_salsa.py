"""SALSA vs a numpy degree-normalized walk oracle."""

from __future__ import annotations

import numpy as np
import pytest

from osmgraphing_spark.operators import salsa

from . import oracle
from .helpers import build_fixture


@pytest.mark.parametrize("names", [("small",), ("stuttgart",), ("twocc",)])
def test_salsa_vs_oracle(spark, names):
    g, edges, _ = build_fixture(spark, names)
    n = g.num_vertices
    res = salsa.run(g, max_iter=12, tol=0.0)
    got_h, got_a = np.zeros(n), np.zeros(n)
    for r in res.collect():
        got_h[r["vid"]], got_a[r["vid"]] = r["hub"], r["authority"]
    exp_h, exp_a = oracle.salsa(n, edges, max_iter=12, tol=0.0)
    np.testing.assert_allclose(got_h, exp_h, atol=1e-9)
    np.testing.assert_allclose(got_a, exp_a, atol=1e-9)
    assert abs(got_h.sum() - 1.0) < 1e-9 and abs(got_a.sum() - 1.0) < 1e-9


def test_salsa_tkc_resistance(spark):
    """The defining SALSA property vs HITS: a small complete community
    cannot swamp a star authority. Star: hubs 0..4 all point at authority
    5; clique: hubs 6,7 point at authorities 8,9. The star authority has 5
    in-links vs 2 — SALSA's walk normalization must rank it first."""
    from .helpers import graph_from_pairs, key_to_vid

    pairs = [("n0", "n5"), ("n1", "n5"), ("n2", "n5"), ("n3", "n5"),
             ("n4", "n5"), ("n6", "n8"), ("n6", "n9"), ("n7", "n8"),
             ("n7", "n9")]
    g = graph_from_pairs(spark, pairs)
    vid = key_to_vid(g)
    res = {r["vid"]: r["authority"] for r in salsa.run(g, max_iter=20, tol=0.0).collect()}
    assert res[vid["n5"]] > res[vid["n8"]] and res[vid["n5"]] > res[vid["n9"]]


def _persistent_ids(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = jmap.keysIterator()
    out = set()
    while it.hasNext():
        out.add(it.next())
    return out


def test_salsa_converges_and_leaves_no_blocks(spark):
    g, _, _ = build_fixture(spark, ("stuttgart",))
    before = _persistent_ids(spark)
    res = salsa.run(g, max_iter=50, tol=1e-9)
    assert res.count() == g.num_vertices
    assert _persistent_ids(spark) <= before
