"""Mid-scale correctness (FIXTURES.md §5 t2 tier): the power-law skew corpus
through the full pipeline, engine vs oracles. Catches anything the 8-vertex
goldens can't — hub skew, multi-partition ID assignment, block-local CSR,
non-trivial convergence paths."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmgraphing_spark.operators import cc, pagerank
from osmgraphing_spark.operators.build import build_graph
from osmgraphing_spark.operators.extract import extract_edges
from osmgraphing_spark.sources import synth

from . import oracle

N_FILES = 1500


@pytest.fixture(scope="module")
def powerlaw_graph(spark):
    corpus = synth.powerlaw_corpus(spark, N_FILES, m=3)
    ref = synth.reference_hashes(corpus)
    raw = extract_edges(corpus, ref, verify=True)
    g = build_graph(raw, num_blocks=8, id_partitions=8)
    edges = [(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()]
    return g, edges


def test_powerlaw_counts_pinned(powerlaw_graph):
    """Count regression (the reference pins parsed counts per map,
    tests/isle_of_man/parsing.rs:40-41). Deterministic generator + seed ⇒
    these are stable constants; if they move, the generator changed."""
    g, edges = powerlaw_graph
    assert g.num_vertices == N_FILES
    assert g.num_edges == len(edges)
    assert 2 * N_FILES < g.num_edges < 3 * N_FILES  # m=3 minus dedup/collisions


def test_powerlaw_has_hubs(powerlaw_graph):
    g, edges = powerlaw_graph
    indeg = np.zeros(g.num_vertices)
    for _, d in edges:
        indeg[d] += 1
    assert indeg.max() > 10 * indeg.mean()  # the skew the salting path handles


def test_powerlaw_pagerank_vs_oracle(spark, powerlaw_graph):
    g, edges = powerlaw_graph
    res = pagerank.run(g, check_every=10)
    assert res.converged
    expected = oracle.pagerank(g.num_vertices, edges)
    got = np.zeros(g.num_vertices)
    for r in res.ranks.collect():
        got[r["vid"]] = r["rank"]
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_powerlaw_pagerank_salted_vs_oracle(spark, powerlaw_graph):
    """Salting on the real skewed corpus (not just the toy fixture)."""
    g, edges = powerlaw_graph
    res = pagerank.run(g, check_every=10, salt=4)
    got = np.zeros(g.num_vertices)
    for r in res.ranks.collect():
        got[r["vid"]] = r["rank"]
    np.testing.assert_allclose(
        got, oracle.pagerank(g.num_vertices, edges), atol=1e-6
    )


def test_powerlaw_cc_vs_oracle(spark, powerlaw_graph):
    g, edges = powerlaw_graph
    got = np.full(g.num_vertices, -1, dtype=np.int64)
    for r in cc.run(g).collect():
        got[r["vid"]] = r["component"]
    np.testing.assert_array_equal(
        got, oracle.connected_components(g.num_vertices, edges)
    )


def test_skewed_autosalt_pagerank_vs_oracle(spark, monkeypatch):
    """salt='auto' against the independent numpy power-iteration oracle on a
    hub-SOURCE graph (out-degree skew — the shape hash(src) cannot balance
    and the shape that actually engages the auto plan; the powerlaw corpus
    above is in-degree-skewed, which map-side partial aggregation already
    absorbs, so auto correctly stays off there)."""
    monkeypatch.setattr(pagerank, "AUTO_SALT_MIN_BLOCK", 256)
    raw = synth.skewed_raw_edges(
        spark, n_vertices=20_000, n_edges=40_000, hub_share=0.5, n_hubs=1
    )
    g = build_graph(raw, num_blocks=8)
    # tol=1e-8: the oracle iterates to its 1e-12 fixed point, and this
    # graph's slow-mixing hub leaves a >1e-6 geometric tail at the default
    # stopping delta (remaining distance ≈ delta/(1-d) ≈ 6.7×delta)
    res = pagerank.run(g, check_every=10, salt="auto", tol=1e-8)
    assert res.converged and res.salt_k >= 2
    edges = [(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()]
    got = np.zeros(g.num_vertices)
    for r in res.ranks.collect():
        got[r["vid"]] = r["rank"]
    np.testing.assert_allclose(
        got, oracle.pagerank(g.num_vertices, edges), atol=1e-6
    )
