"""Graph-shape statistics vs pure-Python oracles."""

from __future__ import annotations

import itertools

from osmgraphing_spark.operators import graphstats


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_reciprocity_mixed(spark):
    """2-cycle + one-way tail: 2 of 3 edges reciprocal."""
    e = [(0, 1), (1, 0), (1, 2)]
    r = graphstats.reciprocity(_edges_df(spark, e)).collect()[0]
    assert (r["n_edges"], r["n_reciprocal"]) == (3, 2)
    assert r["reciprocity"] == round(2 / 3, 6)


def test_reciprocity_ignores_self_loops_and_dups(spark):
    e = [(0, 1), (0, 1), (1, 1), (1, 0)]
    r = graphstats.reciprocity(_edges_df(spark, e)).collect()[0]
    assert (r["n_edges"], r["n_reciprocal"], r["reciprocity"]) == (2, 2, 1.0)


def _assort_oracle(edges):
    import math

    out_d, in_d = {}, {}
    for s, t in edges:
        out_d[s] = out_d.get(s, 0) + 1
        in_d[t] = in_d.get(t, 0) + 1
    xs = [float(out_d[s]) for s, t in edges]
    ys = [float(in_d[t]) for s, t in edges]
    n = len(edges)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    vx, vy = sxx - sx * sx / n, syy - sy * sy / n
    if vx <= 0 or vy <= 0:
        return None
    return round((sxy - sx * sy / n) / math.sqrt(vx * vy), 6)


def test_assortativity_star_vs_chain(spark):
    """Hub-to-leaves star mixed with a chain: matches the python oracle and
    is negative (hubs point at low-in-degree leaves)."""
    e = [(0, i) for i in range(1, 6)] + [(1, 2), (2, 3), (3, 4), (9, 0), (8, 0)]
    got = graphstats.degree_assortativity(_edges_df(spark, e)).collect()[0]
    assert got["n_edges"] == len(e)
    assert got["assortativity"] == _assort_oracle(e)


def test_assortativity_null_on_constant_degrees(spark):
    """A perfect cycle has constant out- and in-degrees → zero variance →
    NULL, not a crash or a fabricated 0."""
    e = [(0, 1), (1, 2), (2, 0)]
    got = graphstats.degree_assortativity(_edges_df(spark, e)).collect()[0]
    assert got["assortativity"] is None


def _clustering_oracle(edges):
    adj = {}
    for s, t in edges:
        if s == t:
            continue
        adj.setdefault(s, set()).add(t)
        adj.setdefault(t, set()).add(s)
    out = {}
    for v, nb in adj.items():
        d = len(nb)
        tri = sum(
            1 for a, b in itertools.combinations(sorted(nb), 2) if b in adj[a]
        )
        coef = round(tri / (d * (d - 1) / 2), 6) if d >= 2 else 0.0
        out[v] = (d, tri, coef)
    return out


def test_clustering_coefficients_matches_python(spark):
    """Triangle + square sharing a vertex + pendant: coefficient spectrum
    {1.0, partial, 0.0} all exercised."""
    e = [
        (0, 1), (1, 2), (2, 0),          # triangle
        (2, 3), (3, 4), (4, 5), (5, 2),  # square hanging off vertex 2
        (0, 9),                           # pendant
    ]
    got = {
        r["vid"]: (r["degree"], r["triangles"], r["coefficient"])
        for r in graphstats.clustering_coefficients(_edges_df(spark, e)).collect()
    }
    assert got == _clustering_oracle(e)
    assert got[1][2] == 1.0 and got[9][2] == 0.0 and 0 < got[0][2] < 1


def test_clustering_direction_and_dup_invariant(spark):
    """The undirected view dedups direction: adding reverse/duplicate edges
    must not change any coefficient."""
    e = [(0, 1), (1, 2), (2, 0), (2, 3)]
    doubled = e + [(b, a) for a, b in e] + e
    a = sorted(map(tuple, graphstats.clustering_coefficients(_edges_df(spark, e)).collect()))
    b = sorted(map(tuple, graphstats.clustering_coefficients(_edges_df(spark, doubled)).collect()))
    assert a == b


def _modularity_oracle(edges, labels):
    """Pure-python Newman modularity per community: (intra, degsum, q)."""
    ue = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    m = len(ue)
    lab = lambda v: labels.get(v, v)  # noqa: E731 — singleton fallback
    intra, deg = {}, {}
    for a, b in ue:
        la, lb = lab(a), lab(b)
        deg[la] = deg.get(la, 0) + 1
        deg[lb] = deg.get(lb, 0) + 1
        if la == lb:
            intra[la] = intra.get(la, 0) + 1
    return {
        c: (intra.get(c, 0), d, round(intra.get(c, 0) / m - (d / (2 * m)) ** 2, 6))
        for c, d in deg.items()
    }


def test_modularity_two_triangles_bridge(spark):
    """Two triangles joined by one bridge, labelled by triangle: the
    textbook high-modularity partition; swapping one vertex's label must
    lower total Q."""
    e = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    good = {0: 10, 1: 10, 2: 10, 3: 20, 4: 20, 5: 20}
    bad = {**good, 2: 20}

    def q_total(lab_map):
        ldf = spark.createDataFrame(list(lab_map.items()), "vid long, label long")
        rows = graphstats.modularity(_edges_df(spark, e), ldf).collect()
        want = _modularity_oracle(e, lab_map)
        assert {
            r["label"]: (r["intra_edges"], r["degree_sum"], r["q"]) for r in rows
        } == want
        return sum(r["q"] for r in rows)

    assert q_total(good) > q_total(bad)
    # known value: m=7, each triangle intra=3, deg 7 in each community
    assert abs(q_total(good) - 2 * (3 / 7 - (7 / 14) ** 2)) < 1e-5


def test_modularity_singleton_fallback_and_dups(spark):
    """Unlabelled vertices are singleton communities; direction and
    duplicate edges must not change anything."""
    e = [(0, 1), (1, 0), (0, 1), (1, 2), (2, 2)]
    labels = {0: 7, 1: 7}  # vertex 2 unlabelled -> community '2'
    ldf = spark.createDataFrame(list(labels.items()), "vid long, label long")
    rows = graphstats.modularity(_edges_df(spark, e), ldf).collect()
    assert {
        r["label"]: (r["intra_edges"], r["degree_sum"], r["q"]) for r in rows
    } == _modularity_oracle(e, labels)


def test_modularity_of_lpa_labels(spark):
    """End-to-end with the engine's own community detector: LPA labels on
    two cliques + bridge score the same Q as the python oracle on those
    labels."""
    from tests.helpers import graph_from_pairs

    import itertools as it

    cl1 = list(it.permutations(range(4), 2))
    cl2 = list(it.permutations(range(4, 8), 2))
    e = cl1 + cl2 + [(3, 4), (4, 3)]
    g = graph_from_pairs(spark, [(f"v{a}", f"v{b}") for a, b in e])
    from osmgraphing_spark.operators import lpa

    labels = lpa.run(g, max_iter=10)
    lab_map = {r["vid"]: r["label"] for r in labels.collect()}
    edges_vid = [(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()]
    rows = graphstats.modularity(g.edges, labels).collect()
    assert {
        r["label"]: (r["intra_edges"], r["degree_sum"], r["q"]) for r in rows
    } == _modularity_oracle(edges_vid, lab_map)
    assert sum(r["q"] for r in rows) > 0.3  # two cliques: strongly modular


def test_powerlaw_fit_recovers_exponent(spark):
    """Degrees drawn deterministically from a discrete power law with
    alpha=2.5 must fit back near 2.5; a regular graph must fit far away."""
    import math
    import random

    from osmgraphing_spark.operators.graphstats import powerlaw_fit

    rng = random.Random(47)
    # build a graph whose degree sequence follows d ~ x^(-2.5): star
    # gadgets give exact degrees without needing a realized power-law graph
    edges = []
    nxt = 10_000
    alpha_true = 2.5
    for v in range(800):
        u = rng.random()
        d = max(2, int(round((1 - u) ** (-1.0 / (alpha_true - 1.0)))))
        d = min(d, 200)
        for _ in range(d):
            edges.append((v, nxt))
            nxt += 1
    df = spark.createDataFrame(edges, "src long, dst long")
    row = powerlaw_fit(df, d_min=2).collect()[0]
    # python mirror for the exact MLE value
    from collections import Counter

    degc = Counter()
    for a, b in edges:
        degc[a] += 1
        degc[b] += 1
    tail = [d for d in degc.values() if d >= 2]
    alpha_py = 1.0 + len(tail) / sum(math.log(d / 1.5) for d in tail)
    assert abs(row["alpha"] - round(alpha_py, 6)) < 2e-6
    assert row["n_tail"] == len(tail)
    # and the estimate is in the scale-free band
    assert 2.0 < row["alpha"] < 3.2

    ring = spark.createDataFrame(
        [(i, (i + 1) % 40) for i in range(40)], "src long, dst long"
    )
    reg = powerlaw_fit(ring, d_min=2).collect()[0]
    assert reg["alpha"] > 3.2  # constant degree 2 = no tail at all


def test_rich_club_python_mirror(spark):
    import random

    from osmgraphing_spark.operators.graphstats import rich_club

    random.seed(3)
    edges = list({(random.randrange(40), random.randrange(40)) for _ in range(150)})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["k"]: (r["n_rich"], r["rich_edges"], r["phi"])
           for r in rich_club(df, [1, 2, 4, 8]).collect()}

    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    deg: dict[int, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    for k in (1, 2, 4, 8):
        rich = {v for v, d in deg.items() if d > k}
        if len(rich) < 2:
            assert k not in got
            continue
        ek = sum(1 for a, b in und if a in rich and b in rich)
        n, e, phi = got[k]
        assert (n, e) == (len(rich), ek)
        assert phi == round(2.0 * ek / (len(rich) * (len(rich) - 1)), 6)


def test_attribute_assortativity_mirror_and_extremes(spark):
    from osmgraphing_spark.operators.graphstats import attribute_assortativity

    def run(edges, labels):
        e = spark.createDataFrame(edges, "src long, dst long")
        lab = spark.createDataFrame(labels, "vid long, label string")
        return attribute_assortativity(e, lab).collect()[0]["assortativity"]

    # perfect homophily: every edge stays inside its class
    labels = [(i, "x" if i < 3 else "y") for i in range(6)]
    assert run([(0, 1), (1, 2), (3, 4), (4, 5)], labels) == 1.0
    # perfect disassortativity on a 2-class bipartite digraph: r < 0
    assert run([(0, 3), (1, 4), (2, 5), (3, 0)], labels) < 0
    # single class: undefined → NULL
    assert run([(0, 1)], [(0, "x"), (1, "x")]) is None
    # python mirror on a mixed case
    import random

    random.seed(5)
    edges = list({(random.randrange(12), random.randrange(12)) for _ in range(40)})
    labels = [(i, str(i % 3)) for i in range(12)]
    got = run(edges, labels)
    lab = dict(labels)
    e = {(a, b) for a, b in edges if a != b}
    from collections import Counter

    mix = Counter((lab[a], lab[b]) for a, b in e)
    m = sum(mix.values())
    trn = sum(v for (i, j), v in mix.items() if i == j)
    row = Counter()
    col = Counter()
    for (i, j), v in mix.items():
        row[i] += v
        col[j] += v
    sabn = sum(row[i] * col[i] for i in set(row) | set(col))
    assert got == round((m * trn - sabn) / (m * m - sabn), 6)


def test_double_sweep_diameter(spark):
    """Directed path 0->1->2->3 plus shortcut 0->2: from start 0 the BFS
    eccentricity is 2 (0->2->3), farthest vertex = 3 (tie-break none);
    sweep 2 from 3 reaches nothing, so the bound stays max(2, 0) = 2."""
    from osmgraphing_spark.operators import graphstats as gs
    from .helpers import graph_from_pairs, key_to_vid

    g = graph_from_pairs(
        spark, [("a0", "a1"), ("a1", "a2"), ("a2", "a3"), ("a0", "a2")]
    )
    vid = key_to_vid(g)
    row = gs.double_sweep_diameter(g, weighted=False).collect()[0]
    assert row["start"] == vid["a0"]
    assert row["ecc_start"] == 2.0
    assert row["far"] == vid["a3"]
    assert row["diameter_lb"] == 2.0


def test_double_sweep_weighted_cycle(spark):
    """Weighted 3-cycle a->b (1), b->c (1), c->a (5): from a, dist(c)=2 is
    the farthest; from c the far sweep pays 5+1=6 to b — the second sweep
    must RAISE the bound to 6 (max of the two eccentricities)."""
    from osmgraphing_spark.operators import graphstats as gs
    from osmgraphing_spark.operators.build import build_graph
    from .helpers import key_to_vid

    raw = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 5.0)],
        "src_key string, dst_key string, weight double",
    )
    g = build_graph(raw, num_blocks=2, id_partitions=2)
    vid = key_to_vid(g)
    row = gs.double_sweep_diameter(g, weighted=True).collect()[0]
    assert row["start"] == vid["a"]
    assert row["ecc_start"] == 2.0 and row["far"] == vid["c"]
    assert row["diameter_lb"] == 6.0
