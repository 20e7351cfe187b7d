"""Adamic-Adar link prediction vs a brute-force python oracle."""

from __future__ import annotations

import math
import random
from collections import defaultdict

from pyspark.sql import functions as F

from osmgraphing_spark.operators import linkpred
from tests.helpers import graph_from_pairs


def _brute_aa(edges, max_center_degree=None, include_existing=False):
    """edges: iterable of (u, v) directed; returns {(u,v): (common, aa)}."""
    nbrs = defaultdict(set)
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    out = {}
    for w, ns in nbrs.items():
        d = len(ns)
        if max_center_degree is not None and d > max_center_degree:
            continue
        ns_sorted = sorted(ns)
        for i, u in enumerate(ns_sorted):
            for v in ns_sorted[i + 1 :]:
                c, s = out.get((u, v), (0, 0.0))
                out[(u, v)] = (c + 1, s + 1.0 / math.log(d))
    if not include_existing:
        out = {
            (u, v): cs for (u, v), cs in out.items() if v not in nbrs[u]
        }
    return out


def _check(spark, pairs, **kw):
    g = graph_from_pairs(spark, pairs)
    vid_to_key = {r["vid"]: r["key"] for r in g.vertices.collect()}
    got = {
        (vid_to_key[r["u"]], vid_to_key[r["v"]]): (r["common"], r["adamic_adar"])
        for r in linkpred.adamic_adar(g, **kw).collect()
    }
    # brute oracle runs on keys; vid assignment is key-order-preserving so
    # the u < v orientation agrees
    want = _brute_aa(pairs, **kw)
    assert set(got) == set(want)
    for p, (c, s) in want.items():
        assert got[p][0] == c
        assert abs(got[p][1] - s) < 1e-6


def test_adamic_adar_path_and_square(spark):
    # path a-b-c: (a,c) share b with deg 2 → aa = 1/ln 2
    _check(spark, [("a", "b"), ("b", "c")])
    # square: opposite corners share two deg-2 centers → aa = 2/ln 2
    _check(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])


def test_adamic_adar_center_cap_drops_hub(spark):
    # star with 5 leaves: center degree 5; cap 4 removes every wedge
    star = [("hub", f"x{i}") for i in range(5)]
    g = graph_from_pairs(spark, star)
    assert linkpred.adamic_adar(g, max_center_degree=4).count() == 0
    assert linkpred.adamic_adar(g).count() == 10  # all leaf pairs


def test_adamic_adar_random_graph_matches_brute(spark):
    rng = random.Random(7)
    keys = [f"n{i:02d}" for i in range(30)]
    pairs = sorted(
        {
            (a, b)
            for a, b in (
                (rng.choice(keys), rng.choice(keys)) for _ in range(120)
            )
            if a != b
        }
    )
    _check(spark, pairs)
    _check(spark, pairs, max_center_degree=6)
    _check(spark, pairs, include_existing=True)


def test_adamic_adar_excludes_existing_edges(spark):
    # triangle + pendant: (a,b) are connected AND share c → excluded by default
    g = graph_from_pairs(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")])
    got = {(r["u"], r["v"]) for r in linkpred.adamic_adar(g).collect()}
    vid = {r["key"]: r["vid"] for r in g.vertices.collect()}
    assert (vid["a"], vid["b"]) not in got
    assert (min(vid["a"], vid["d"]), max(vid["a"], vid["d"])) in got


def _brute_project(edges, min_shared=1, max_partner_degree=None):
    """edges: (member, partner); returns {(u,v): (shared, jaccard)} with
    true-degree jaccard denominators and capped partners excluded from
    the shared counts (the operator's estimator contract)."""
    partners = defaultdict(set)   # member -> full partner set
    members = defaultdict(set)    # partner -> member set
    for m, p in edges:
        partners[m].add(p)
        members[p].add(m)
    shared = defaultdict(int)
    for p, ms in members.items():
        if max_partner_degree is not None and len(ms) > max_partner_degree:
            continue
        ms_sorted = sorted(ms)
        for i, u in enumerate(ms_sorted):
            for v in ms_sorted[i + 1 :]:
                shared[(u, v)] += 1
    return {
        (u, v): (
            s,
            round(s / (len(partners[u]) + len(partners[v]) - s), 6),
        )
        for (u, v), s in shared.items()
        if s >= min_shared
    }


def test_bipartite_project_vs_brute(spark):
    rng = random.Random(13)
    edges = list({(rng.randrange(20), 100 + rng.randrange(12)) for _ in range(120)})
    df = spark.createDataFrame(edges, "src long, dst long")

    for kw in ({}, {"min_shared": 3}, {"max_partner_degree": 8},
               {"min_shared": 2, "max_partner_degree": 6}):
        got = {
            (r["u"], r["v"]): (r["shared"], r["jaccard"])
            for r in linkpred.bipartite_project(df, **kw).collect()
        }
        assert got == _brute_project(edges, **kw), kw

    # duplicate rows collapse before counting (distinct edge contract)
    noisy = spark.createDataFrame(edges + edges[:30], "src long, dst long")
    got = {
        (r["u"], r["v"]): (r["shared"], r["jaccard"])
        for r in linkpred.bipartite_project(noisy, min_shared=2).collect()
    }
    assert got == _brute_project(edges, min_shared=2)


def _brute_battery(edges, max_center_degree=None, include_existing=False):
    """{(u,v): (common, jaccard, cosine, aa, ra, pa)} python mirror."""
    nbrs = defaultdict(set)
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    acc = {}
    for w, ns in nbrs.items():
        d = len(ns)
        if max_center_degree is not None and d > max_center_degree:
            continue
        ns_sorted = sorted(ns)
        for i, u in enumerate(ns_sorted):
            for v in ns_sorted[i + 1 :]:
                c, aa, ra = acc.get((u, v), (0, 0.0, 0.0))
                acc[(u, v)] = (c + 1, aa + 1.0 / math.log(d), ra + 1.0 / d)
    out = {}
    for (u, v), (c, aa, ra) in acc.items():
        if not include_existing and v in nbrs[u]:
            continue
        du, dv = len(nbrs[u]), len(nbrs[v])
        out[(u, v)] = (
            c,
            round(c / (du + dv - c), 6),
            round(c / math.sqrt(du * dv), 6),
            round(aa, 6),
            round(ra, 6),
            du * dv,
        )
    return out


def test_link_predictor_battery_matches_brute(spark):
    rng = random.Random(29)
    keys = list(range(25))
    pairs = sorted(
        {(a, b) for a, b in ((rng.choice(keys), rng.choice(keys)) for _ in range(90))
         if a != b}
    )
    df = spark.createDataFrame(pairs, "src long, dst long")
    for kw in ({}, {"max_center_degree": 6}, {"include_existing": True},
               {"min_common": 2}):
        got = {
            (r["u"], r["v"]): (
                r["common"], r["jaccard"], r["cosine"],
                r["adamic_adar"], r["resource_alloc"], r["pref_attach"],
            )
            for r in linkpred.link_predictor_scores(df, **kw).collect()
        }
        want = _brute_battery(
            pairs,
            max_center_degree=kw.get("max_center_degree"),
            include_existing=kw.get("include_existing", False),
        )
        want = {p: t for p, t in want.items() if t[0] >= kw.get("min_common", 1)}
        assert set(got) == set(want), kw
        for p, t in want.items():
            for gi, wi in zip(got[p], t):
                assert abs(gi - wi) < 1e-6, (p, got[p], t, kw)


def _brute_butterflies(edges, max_partner_degree=None):
    partners = defaultdict(set)
    members = defaultdict(set)
    for m, p in set(edges):
        partners[m].add(p)
        members[p].add(m)
    shared = defaultdict(int)
    for p, ms in members.items():
        if max_partner_degree is not None and len(ms) > max_partner_degree:
            continue
        ms_sorted = sorted(ms)
        for i, u in enumerate(ms_sorted):
            for v in ms_sorted[i + 1 :]:
                shared[(u, v)] += 1
    per_m = defaultdict(lambda: [0, 0])  # butterflies, max_shared
    for (u, v), s in shared.items():
        if s < 2:
            continue
        bf = s * (s - 1) // 2
        for m in (u, v):
            per_m[m][0] += bf
            per_m[m][1] = max(per_m[m][1], s)
    return {m: tuple(t) for m, t in per_m.items()}


def test_butterfly_counts_vs_brute(spark):
    # square u-p-v-q-u = exactly one butterfly credited to both members
    sq = spark.createDataFrame(
        [(1, 100), (1, 101), (2, 100), (2, 101)], "src long, dst long"
    )
    got = {r["m"]: (r["butterflies"], r["max_shared"])
           for r in linkpred.butterfly_counts(sq).collect()}
    assert got == {1: (1, 2), 2: (1, 2)}

    rng = random.Random(31)
    edges = list({(rng.randrange(15), 100 + rng.randrange(10)) for _ in range(90)})
    df = spark.createDataFrame(edges, "src long, dst long")
    for cap in (None, 6):
        got = {r["m"]: (r["butterflies"], r["max_shared"])
               for r in linkpred.butterfly_counts(df, max_partner_degree=cap).collect()}
        assert got == _brute_butterflies(edges, max_partner_degree=cap), cap

    # global count: sum of member credits is 2x the number of butterflies;
    # complete 3x3 biclique has C(3,2)^2 = 9 butterflies
    k33 = spark.createDataFrame(
        [(m, 100 + p) for m in range(3) for p in range(3)], "src long, dst long"
    )
    rows = linkpred.butterfly_counts(k33).collect()
    assert sum(r["butterflies"] for r in rows) == 2 * 9
