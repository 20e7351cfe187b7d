"""CC / LPA / triangle golden tests — exact-match layer (north rule:
components and labels exactly; triangle counts exact)."""

from __future__ import annotations

import numpy as np
import pytest

from osmgraphing_spark.operators import cc, lpa, triangles
from osmgraphing_spark.plans.checkpoint import CheckpointManager

from . import oracle
from .helpers import build_fixture, stem_vids


def _label_vec(df, n, col):
    v = np.full(n, -1, dtype=np.int64)
    for r in df.collect():
        v[r["vid"]] = r[col]
    return v


@pytest.mark.parametrize(
    "names", [("small",), ("twocc",), ("small", "bait", "stuttgart")]
)
def test_cc_vs_oracle(spark, names):
    g, edges, _ = build_fixture(spark, names)
    got = _label_vec(cc.run(g), g.num_vertices, "component")
    expected = oracle.connected_components(g.num_vertices, edges)
    np.testing.assert_array_equal(got, expected)


def test_twocc_components_disjoint(spark):
    """twocc invariant (FIXTURES.md §3.4): the small component and the
    3-cycle repo never merge without a cross-repo edge."""
    g, edges, _ = build_fixture(spark, ("twocc",))
    sv = stem_vids(g)
    comp = _label_vec(cc.run(g), g.num_vertices, "component")
    small_labels = {comp[sv[s]] for s in "abcdefgh"}
    cycle_labels = {comp[sv[s]] for s in "xyz"}
    assert len(small_labels) == 1 and len(cycle_labels) == 1
    assert small_labels != cycle_labels


def test_cc_resume(spark, tmp_ckpt):
    g, edges, _ = build_fixture(spark, ("twocc",))
    ck = CheckpointManager(spark, tmp_ckpt, "cc")
    got = _label_vec(cc.run(g, checkpoint=ck), g.num_vertices, "component")
    resumed = _label_vec(
        cc.run(g, checkpoint=ck, resume=True), g.num_vertices, "component"
    )
    np.testing.assert_array_equal(got, resumed)
    np.testing.assert_array_equal(
        got, oracle.connected_components(g.num_vertices, edges)
    )


def test_lpa_resume(spark, tmp_ckpt):
    g, edges, _ = build_fixture(spark, ("small",))
    ck = CheckpointManager(spark, tmp_ckpt, "lpa")
    partial = lpa.run(g, max_iter=2, checkpoint=ck)  # 'crash' after 2 rounds
    assert ck.latest() == 1
    resumed = _label_vec(
        lpa.run(g, max_iter=10, checkpoint=ck, resume=True), g.num_vertices, "label"
    )
    fresh = _label_vec(lpa.run(g, max_iter=10), g.num_vertices, "label")
    np.testing.assert_array_equal(resumed, fresh)


@pytest.mark.parametrize("names", [("small",), ("bait",), ("twocc",)])
def test_lpa_vs_oracle(spark, names):
    g, edges, _ = build_fixture(spark, names)
    got = _label_vec(lpa.run(g, max_iter=10), g.num_vertices, "label")
    expected = oracle.label_propagation(g.num_vertices, edges, max_iter=10)
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize(
    "names", [("small",), ("bait",), ("twocc",), ("stuttgart",)]
)
def test_triangle_count_vs_oracle(spark, names):
    g, edges, _ = build_fixture(spark, names)
    assert triangles.count(g) == oracle.triangles(g.num_vertices, edges)


def test_triangles_per_vertex(spark):
    g, edges, _ = build_fixture(spark, ("small",))
    got = _label_vec(triangles.per_vertex(g), g.num_vertices, "triangles")
    np.testing.assert_array_equal(
        got, oracle.triangles_per_vertex(g.num_vertices, edges)
    )


def test_doulion_exact_at_p1_and_mirror_at_half(spark):
    """p=1 must equal the exact triangle count; p=0.5 must equal the
    python mirror of the SAME deterministic sample."""
    import hashlib
    import random
    from itertools import combinations

    from osmgraphing_spark.operators.sampling import RESOLUTION
    from osmgraphing_spark.operators.triangles import doulion_estimate

    rng = random.Random(67)
    edges = sorted({tuple(sorted((rng.randrange(18), rng.randrange(18))))
                    for _ in range(70)})
    edges = [e for e in edges if e[0] != e[1]]

    def tri_count(es):
        s = set(es)
        nodes = sorted({v for e in es for v in e})
        return sum(
            1 for a, b, c in combinations(nodes, 3)
            if (a, b) in s and (b, c) in s and (a, c) in s
        )

    df = spark.createDataFrame(edges, "src long, dst long")
    r1 = doulion_estimate(df, p=1.0).collect()[0]
    exact = tri_count(edges)
    assert r1["tri_sampled"] == exact and r1["estimate"] == float(exact)
    assert r1["n_sampled"] == r1["n_edges"] == len(edges)

    def bucket(a, b):
        h = hashlib.md5(f"{a}|{b}".encode()).hexdigest()
        return int(h[:14], 16) % RESOLUTION

    p = 0.5
    kept = [e for e in edges if bucket(*e) < round(p * RESOLUTION)]
    r5 = doulion_estimate(df, p=p).collect()[0]
    assert r5["n_sampled"] == len(kept)
    assert r5["tri_sampled"] == tri_count(kept)
    assert r5["estimate"] == round(tri_count(kept) / p**3, 4)
