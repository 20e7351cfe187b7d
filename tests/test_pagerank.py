"""PageRank golden tests: engine (both executors) vs numpy power-iteration
oracle, allclose atol=1e-6 (the reference's F64_ABS tolerance discipline,
/root/reference/src/approximating.rs:168-201), plus metamorphic checks
(DataFrame == CSR == salted) and the checkpoint-resume protocol."""

from __future__ import annotations

import numpy as np
import pytest

from osmgraphing_spark.operators import pagerank
from osmgraphing_spark.plans.checkpoint import CheckpointManager

from . import oracle
from .helpers import build_fixture


def _rank_vec(result, n):
    v = np.zeros(n)
    for r in result.ranks.collect():
        v[r["vid"]] = r["rank"]
    return v


@pytest.mark.parametrize("names", [("small",), ("bait",), ("stuttgart",)])
def test_pagerank_vs_oracle(spark, names):
    g, edges, _ = build_fixture(spark, names)
    res = pagerank.run(g, mode="dataframe", check_every=8)
    assert res.converged
    expected = oracle.pagerank(g.num_vertices, edges)
    np.testing.assert_allclose(_rank_vec(res, g.num_vertices), expected, atol=1e-6)


def test_pagerank_weighted_vs_oracle(spark):
    g, edges, weights = build_fixture(spark, ("stuttgart",))
    res = pagerank.run(g, weighted=True, check_every=8)
    assert res.converged
    expected = oracle.pagerank(
        g.num_vertices, edges, weights=weights, weighted=True
    )
    np.testing.assert_allclose(_rank_vec(res, g.num_vertices), expected, atol=1e-6)


def test_csr_equals_dataframe(spark):
    """Metamorphic: SpMV-over-CSR-blocks executor == join executor."""
    g, _, _ = build_fixture(spark, ("small", "stuttgart"), num_blocks=4)
    a = _rank_vec(pagerank.run(g, mode="dataframe", check_every=8), g.num_vertices)
    b = _rank_vec(pagerank.run(g, mode="csr", check_every=8), g.num_vertices)
    np.testing.assert_allclose(a, b, atol=1e-9)


def test_salted_equals_unsalted(spark):
    g, _, _ = build_fixture(spark, ("small",))
    a = _rank_vec(pagerank.run(g, salt=0, check_every=8), g.num_vertices)
    b = _rank_vec(pagerank.run(g, salt=4, check_every=8), g.num_vertices)
    np.testing.assert_allclose(a, b, atol=1e-9)


def test_checkpoint_resume_identical(spark, tmp_ckpt):
    """North rule: kill after superstep k, restart, identical final scores."""
    g, edges, _ = build_fixture(spark, ("stuttgart",))

    ck1 = CheckpointManager(spark, tmp_ckpt, "pr_interrupted")
    partial = pagerank.run(g, max_iter=3, checkpoint=ck1)  # 'crash' after 3
    assert not partial.converged
    assert ck1.latest() == 2

    resumed = pagerank.run(g, checkpoint=ck1, resume=True)
    assert resumed.converged
    fresh = pagerank.run(g)
    np.testing.assert_allclose(
        _rank_vec(resumed, g.num_vertices),
        _rank_vec(fresh, g.num_vertices),
        atol=1e-9,
    )
    # metrics rows carry per-partition lineage + convergence delta
    m = ck1.read_metrics(ck1.latest())
    assert m["delta"] < 1e-6
    assert m["partition_rows"] and sum(m["partition_rows"].values()) == g.num_vertices


def test_resume_of_converged_run_is_noop(spark, tmp_ckpt):
    g, _, _ = build_fixture(spark, ("small",))
    ck = CheckpointManager(spark, tmp_ckpt, "pr_done")
    first = pagerank.run(g, checkpoint=ck)
    assert first.converged
    again = pagerank.run(g, checkpoint=ck, resume=True)
    assert again.converged
    np.testing.assert_allclose(
        _rank_vec(again, g.num_vertices), _rank_vec(first, g.num_vertices), atol=0
    )


def test_ranks_sum_to_one(spark):
    g, _, _ = build_fixture(spark, ("stuttgart",))  # has dangling vertex 'dea'
    res = pagerank.run(g, check_every=8)
    assert abs(_rank_vec(res, g.num_vertices).sum() - 1.0) < 1e-9


def test_personalized_pagerank_vs_oracle(spark):
    """PPR with a sparse teleport set: restart AND dangling mass land on
    the teleport distribution; vertices outside it earn rank only through
    in-links. Oracle: numpy power iteration with the same rule."""
    g, edges, _ = build_fixture(spark, ("small", "stuttgart"))
    n = g.num_vertices
    sources = [0, 3]
    p = np.zeros(n)
    p[sources] = 1.0 / len(sources)
    reset = spark.createDataFrame(
        [(int(v), 1.0 / len(sources)) for v in sources], "vid long, p double"
    )
    res = pagerank.run(g, reset=reset, check_every=8)
    assert res.converged
    expected = oracle.personalized_pagerank(n, edges, p)
    np.testing.assert_allclose(_rank_vec(res, n), expected, atol=1e-6)
    # rank mass is conserved at 1 (teleport + dangling both ∝ p)
    assert abs(_rank_vec(res, n).sum() - 1.0) < 1e-9


def test_personalized_uniform_reset_equals_classic(spark):
    """A uniform reset must reproduce classic PageRank (the classic rule is
    the p = 1/n special case). Fixed 32 supersteps on both sides so the
    comparison is iterate-to-iterate; tolerance covers only the last-ulp
    difference between (1-d)/n and (1/n)*(1-d) accumulating per step."""
    g, _, _ = build_fixture(spark, ("stuttgart",))
    n = g.num_vertices
    # CAST to double first: bare `1.0/n` is Spark DECIMAL division, which
    # truncates to 6 decimal places and breaks Σp = 1 by ~n·3e-7
    uniform = g.vertices.sparkSession.range(n).selectExpr(
        "id AS vid", f"CAST(1.0 AS DOUBLE)/{n} AS p"
    )
    a = _rank_vec(pagerank.run(g, tol=0.0, max_iter=32, check_every=8), n)
    b = _rank_vec(
        pagerank.run(g, reset=uniform, tol=0.0, max_iter=32, check_every=8), n
    )
    np.testing.assert_allclose(a, b, atol=1e-12)



def test_warm_start_converges_faster(spark):
    """Incremental recompute: after a small edge delta, restarting from
    the previous converged ranks reaches tol in fewer supersteps than a
    cold uniform start, with the SAME fixed point."""
    import copy

    from pyspark.sql import functions as F

    from osmgraphing_spark.operators import pagerank as pr
    from osmgraphing_spark.operators.build import build_graph
    from osmgraphing_spark.operators.extract import extract_edges
    from osmgraphing_spark.sources.synth import powerlaw_corpus

    corpus = powerlaw_corpus(spark, 300, m=3)
    g1 = build_graph(extract_edges(corpus), num_blocks=4)
    r1 = pr.run(g1, tol=1e-8, check_every=4)
    assert r1.converged

    # delta: a sliver of edges vanishes (the weekly recrawl)
    g2 = copy.copy(g1)
    g2.edges = g1.edges.where(~(F.col("src") % 97 == 3))

    cold = pr.run(g2, tol=1e-8, check_every=1)
    warm = pr.run(g2, tol=1e-8, check_every=1, init_ranks=r1.ranks)
    assert cold.converged and warm.converged
    assert warm.iterations < cold.iterations, (warm.iterations, cold.iterations)

    got = {r["vid"]: r["rank"] for r in warm.ranks.collect()}
    want = {r["vid"]: r["rank"] for r in cold.ranks.collect()}
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-6


def test_auto_salt_engages_and_matches_on_skewed_graph(spark, monkeypatch):
    """salt='auto' on a hub-source graph: the plan must ENGAGE (salt_k >= 2,
    hub blocks split) and the ranks must equal the unsalted plan to 1e-9 —
    the north rule's explicit-skew-handling path, end to end. The absolute
    engagement floor is lowered so a pytest-sized graph exercises the real
    plan (the bench salt leg engages it at the true floor)."""
    from osmgraphing_spark.operators.build import build_graph
    from osmgraphing_spark.sources.synth import skewed_raw_edges

    monkeypatch.setattr(pagerank, "AUTO_SALT_MIN_BLOCK", 256)
    # one hub firing half the raw edges into a 20k dst space: after dedup
    # the hub keeps ~12.6k unique out-edges vs a ~4k partition target — the
    # unsplittable-block shape (a 2k dst space would collapse the hub to
    # under the target and the plan would, correctly, not engage)
    raw = skewed_raw_edges(spark, n_vertices=20_000, n_edges=40_000,
                           hub_share=0.5, n_hubs=1)
    g = build_graph(raw, num_blocks=8)
    auto = pagerank.run(g, salt="auto", check_every=8, max_iter=24)
    plain = pagerank.run(g, salt=0, check_every=8, max_iter=24)
    assert auto.salt_k >= 2, "skewed layout must trigger the salted plan"
    assert 1 <= auto.hot_srcs < g.num_blocks
    a = _rank_vec(auto, g.num_vertices)
    b = _rank_vec(plain, g.num_vertices)
    np.testing.assert_allclose(a, b, atol=1e-9)


def test_auto_salt_noop_on_balanced_graph(spark):
    """salt='auto' on a balanced fixture resolves to the plain plan."""
    g, _, _ = build_fixture(spark, ("small",))
    res = pagerank.run(g, salt="auto", check_every=8)
    assert res.salt_k == 0 and res.hot_srcs == 0
    assert res.converged
