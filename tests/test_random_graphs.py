"""Randomized cross-checks: seeded random digraphs of varying shape through
the whole engine vs the numpy oracles — the property-test layer the golden
fixtures can't cover (odd degree distributions, self-loop-free multigraphs,
disconnected shards)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmgraphing_spark.api import LinkGraph

from . import oracle


def _random_raw_edges(spark, n, m, seed, p_drop=0.0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, size=m)
    dst = rng.integers(0, n, size=m)
    keep = src != dst
    rows = [
        (f"v{int(s):05d}", f"v{int(d):05d}", 1.0)
        for s, d in zip(src[keep], dst[keep])
    ]
    return spark.createDataFrame(rows, "src_key string, dst_key string, weight double")


@pytest.mark.parametrize("n,m,seed", [(40, 120, 1), (60, 90, 2), (25, 300, 3)])
def test_random_graph_all_algorithms(spark, n, m, seed):
    raw = _random_raw_edges(spark, n, m, seed)
    lg = LinkGraph.from_edges(raw, num_blocks=4)
    nv = lg.graph.num_vertices
    edges = [
        (r["src"], r["dst"]) for r in lg.graph.edges.select("src", "dst").collect()
    ]

    got_pr = np.zeros(nv)
    for r in lg.pagerank(check_every=8).collect():
        got_pr[r["vid"]] = r["rank"]
    np.testing.assert_allclose(got_pr, oracle.pagerank(nv, edges), atol=1e-6)

    got_cc = np.full(nv, -1, dtype=np.int64)
    for r in lg.connected_components().collect():
        got_cc[r["vid"]] = r["component"]
    np.testing.assert_array_equal(got_cc, oracle.connected_components(nv, edges))

    assert lg.triangle_count() == oracle.triangles(nv, edges)
