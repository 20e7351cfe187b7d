"""Graph contraction (page→host rollup) vs a pure-python mirror."""

from __future__ import annotations

import random
from collections import defaultdict

import pytest

from osmgraphing_spark.operators import contract as contract_op


@pytest.fixture(scope="module")
def fixture(spark):
    rng = random.Random(93)
    edges = [
        (rng.randrange(30), rng.randrange(30), round(rng.uniform(0.5, 3.0), 3))
        for _ in range(120)
    ]
    # groups: vid -> vid // 7 ("host of page"); leave vids 28-29 unmapped
    mapping = [(v, v // 7) for v in range(28)]
    edf = spark.createDataFrame(edges, "src long, dst long, w double")
    mdf = spark.createDataFrame(mapping, "vid long, group long")
    return edges, dict(mapping), edf, mdf


def _mirror(edges, groups, weighted, drop_self_loops):
    agg = defaultdict(lambda: [0, 0.0])
    for s, d, w in edges:
        if s not in groups or d not in groups:
            continue
        gs, gd = groups[s], groups[d]
        if drop_self_loops and gs == gd:
            continue
        agg[(gs, gd)][0] += 1
        agg[(gs, gd)][1] += w
    if weighted:
        return {k: (n, round(w, 6)) for k, (n, w) in agg.items()}
    return {k: n for k, (n, _) in agg.items()}


def test_contract_counts_match_mirror(spark, fixture):
    edges, groups, edf, mdf = fixture
    got = {
        (r["src"], r["dst"]): r["n_edges"]
        for r in contract_op.contract(edf, mdf).collect()
    }
    assert got == _mirror(edges, groups, weighted=False, drop_self_loops=False)


def test_contract_weighted_sums(spark, fixture):
    edges, groups, edf, mdf = fixture
    got = {
        (r["src"], r["dst"]): (r["n_edges"], round(r["weight"], 6))
        for r in contract_op.contract(edf, mdf, weight_col="w").collect()
    }
    want = _mirror(edges, groups, weighted=True, drop_self_loops=False)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) <= 1e-6


def test_contract_drop_self_loops(spark, fixture):
    edges, groups, edf, mdf = fixture
    got = {
        (r["src"], r["dst"]): r["n_edges"]
        for r in contract_op.contract(edf, mdf, drop_self_loops=True).collect()
    }
    assert got == _mirror(edges, groups, weighted=False, drop_self_loops=True)
    assert all(s != d for s, d in got)


def test_contract_drops_unmapped_endpoints(spark, fixture):
    edges, groups, edf, mdf = fixture
    # at least one fixture edge touches an unmapped vid (28/29) with the
    # other endpoint mapped — contraction must drop it, not null-group it
    touched = [e for e in edges if (e[0] in groups) != (e[1] in groups)]
    assert touched, "fixture regression: no half-mapped edge"
    total = sum(
        r["n_edges"] for r in contract_op.contract(edf, mdf).collect()
    )
    assert total == sum(
        1 for s, d, _ in edges if s in groups and d in groups
    )


def test_module_mapping_prefix(spark):
    verts = spark.createDataFrame(
        [
            (0, "pkg_a/sub/one.py"),
            (1, "pkg_a/two.py"),
            (2, "pkg_b/sub/deep/three.py"),
            (3, "root.py"),
        ],
        "vid long, key string",
    )
    got = {
        r["vid"]: r["group"]
        for r in contract_op.module_mapping(verts, "key", depth=1).collect()
    }
    assert got == {0: "pkg_a", 1: "pkg_a", 2: "pkg_b", 3: "root.py"}
    got2 = {
        r["vid"]: r["group"]
        for r in contract_op.module_mapping(verts, "key", depth=2).collect()
    }
    assert got2 == {
        0: "pkg_a/sub",
        1: "pkg_a/two.py",
        2: "pkg_b/sub",
        3: "root.py",
    }
