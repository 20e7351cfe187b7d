"""Convex-hull route explorator (G4) + the alpha LU solve (F9).

Oracle: pure-Python DFS enumerates ALL simple paths of a tiny multi-metric
graph; a dense alpha grid then computes which paths are optimal for SOME
convex weighting (the lower hull) — the set the explorator must return,
mirroring the reference's explorator tests
(/root/reference/src/routing/explorating.rs:140-366)."""

from __future__ import annotations

import numpy as np
import pytest

from osmgraphing_spark.functions.algebra import (
    SingularSystemError,
    equalizing_alpha,
    lu_solve,
)
from osmgraphing_spark.operators import explore
from osmgraphing_spark.operators.build import build_graph


# ---------------------------------------------------------------------------
# F9: the k x k solve
# ---------------------------------------------------------------------------

def test_lu_solve_matches_numpy():
    rng = np.random.default_rng(7)
    for n in (1, 2, 3, 5):
        for _ in range(20):
            a = rng.normal(size=(n, n)) + np.eye(n)
            b = rng.normal(size=n)
            got = lu_solve(a, b)
            np.testing.assert_allclose(got, np.linalg.solve(a, b), atol=1e-9)


def test_lu_solve_singular_raises():
    with pytest.raises(SingularSystemError):
        lu_solve([[1.0, 2.0], [2.0, 4.0]], [1.0, 1.0])


def test_equalizing_alpha_two_routes():
    # routes (10,1) and (1,10): alpha=(.5,.5) equalizes at 5.5
    alpha = equalizing_alpha([[10.0, 1.0], [1.0, 10.0]])
    np.testing.assert_allclose(alpha, [0.5, 0.5], atol=1e-12)
    assert abs(alpha @ [10.0, 1.0] - alpha @ [1.0, 10.0]) < 1e-12


# ---------------------------------------------------------------------------
# G4: hull exploration vs brute-force oracle
# ---------------------------------------------------------------------------

def _metric_graph(spark, edges):
    raw = spark.createDataFrame(
        [(s, d, list(map(float, m))) for s, d, m in edges],
        "src_key string, dst_key string, metrics array<double>",
    )
    return build_graph(raw, num_blocks=2, id_partitions=2, metric_names=["m1", "m2"])


def _vids(g):
    return {r["key"]: r["vid"] for r in g.vertices.collect()}


def _all_simple_paths(edges, src, dst):
    adj = {}
    for s, d, m in edges:
        adj.setdefault(s, []).append((d, np.asarray(m, float)))
    out = []

    def dfs(node, path, cost):
        if node == dst:
            out.append((tuple(path), cost.copy()))
            return
        for nxt, m in adj.get(node, []):
            if nxt not in path:
                dfs(nxt, path + [nxt], cost + m)

    dfs(src, [src], np.zeros(2))
    return out


def _hull_paths(paths):
    """Paths optimal (strictly, up to 1e-9) for some alpha on a dense grid."""
    keys = set()
    for t in np.linspace(0.0, 1.0, 401):
        alpha = np.array([t, 1.0 - t])
        scored = [(float(alpha @ c), p) for p, c in paths]
        best = min(s for s, _ in scored)
        winners = [p for s, p in scored if s <= best + 1e-9]
        if len(winners) == 1:
            keys.add(winners[0])
    return keys


THREE_ROUTE_EDGES = [
    ("s", "a", (5.0, 0.5)), ("a", "t", (5.0, 0.5)),
    ("s", "b", (0.5, 5.0)), ("b", "t", (0.5, 5.0)),
    ("s", "c", (2.0, 2.0)), ("c", "t", (2.0, 2.0)),
]

TWO_ROUTE_EDGES = [
    ("s", "a", (5.0, 0.5)), ("a", "t", (5.0, 0.5)),
    ("s", "b", (0.5, 5.0)), ("b", "t", (0.5, 5.0)),
    # middle route costs (6,6): above the (10,1)-(1,10) segment -> NOT on hull
    ("s", "c", (3.0, 3.0)), ("c", "t", (3.0, 3.0)),
]


@pytest.mark.parametrize(
    "edges,n_expected",
    [(THREE_ROUTE_EDGES, 3), (TWO_ROUTE_EDGES, 2)],
    ids=["compromise-on-hull", "compromise-off-hull"],
)
def test_explorator_matches_hull_oracle(spark, edges, n_expected):
    g = _metric_graph(spark, edges)
    vid = _vids(g)
    key_of = {v: k for k, v in vid.items()}
    pairs = spark.createDataFrame([(vid["s"], vid["t"])], "src long, dst long")

    got = explore.explore_pareto_routes(g, pairs).collect()
    got_paths = {tuple(key_of[n] for n in r["nodes"]) for r in got}

    oracle = _hull_paths(_all_simple_paths(edges, "s", "t"))
    assert got_paths == oracle
    assert len(got) == n_expected
    # every returned alpha is a valid convex weighting and its route is the
    # argmin under that alpha among ALL simple paths
    all_paths = _all_simple_paths(edges, "s", "t")
    for r in got:
        alpha = np.array(r["alpha"])
        assert alpha.min() >= -1e-9 and abs(alpha.sum() - 1.0) < 1e-9
        scalar = alpha @ np.array(r["costs"])
        best = min(float(alpha @ c) for _, c in all_paths)
        assert scalar <= best + 1e-6


def test_explorator_multiple_pairs(spark):
    g = _metric_graph(spark, THREE_ROUTE_EDGES)
    vid = _vids(g)
    pairs = spark.createDataFrame(
        [(vid["s"], vid["t"]), (vid["a"], vid["t"])], "src long, dst long"
    )
    got = explore.explore_pareto_routes(g, pairs)
    by_pair = {
        (r["src"], r["dst"]): r
        for r in got.groupBy("src", "dst").count().collect()
    }
    assert by_pair[(vid["s"], vid["t"])]["count"] == 3
    # a -> t has a single path, found by both unit alphas, reported once
    assert by_pair[(vid["a"], vid["t"])]["count"] == 1


def test_path_metric_costs_fold(spark):
    g = _metric_graph(spark, THREE_ROUTE_EDGES)
    vid = _vids(g)
    pairs = spark.createDataFrame([(vid["s"], vid["t"])], "src long, dst long")
    ga = explore.alpha_weighted(g, [1.0, 0.0])
    from osmgraphing_spark.operators import sssp

    routes = sssp.shortest_paths(ga, pairs, weighted=True)
    costed = explore.path_metric_costs(g, routes.select("src", "dst", "nodes"))
    row = costed.collect()[0]
    np.testing.assert_allclose(row["costs"], [1.0, 10.0])  # the (m1-cheap) route
