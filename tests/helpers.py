"""Shared test plumbing: fixture corpus → built Graph + vid-space edge lists
for the oracles (the analogue of the reference's tests/helpers/mod.rs)."""

from __future__ import annotations

from osmgraphing_spark.operators.build import Graph, build_graph
from osmgraphing_spark.operators.extract import extract_edges
from osmgraphing_spark.sources import synth


_CACHE: dict = {}


def build_fixture(spark, names=("small",), num_blocks: int = 8) -> tuple[Graph, list, list]:
    """→ (graph, edges [(src_vid, dst_vid)], weights [w]) for oracle input.

    Memoized per (names, num_blocks): tests share one built graph the way
    the reference's test helpers share one parsed graph per fixture
    (tests/helpers/mod.rs:78-143)."""
    ck = (tuple(names), num_blocks)
    if ck in _CACHE:
        return _CACHE[ck]
    out = _build_fixture_uncached(spark, names, num_blocks)
    _CACHE[ck] = out
    return out


def _build_fixture_uncached(spark, names, num_blocks) -> tuple[Graph, list, list]:
    corpus = synth.fixture_corpus(spark, names)
    ref = synth.reference_hashes(corpus)
    raw = extract_edges(corpus, ref, verify=True)
    g = build_graph(raw, num_blocks=num_blocks, id_partitions=4)
    rows = g.edges.select("src", "dst", "weight").collect()
    edges = [(r["src"], r["dst"]) for r in rows]
    weights = [r["weight"] for r in rows]
    return g, edges, weights


def key_to_vid(graph: Graph) -> dict[str, int]:
    return {r["key"]: r["vid"] for r in graph.vertices.collect()}


def stem_vids(graph: Graph) -> dict[str, int]:
    """'fixtures/small::src/b.py' → {'b': vid} (stems unique per fixture set)."""
    out = {}
    for key, vid in key_to_vid(graph).items():
        stem = key.rsplit("/", 1)[-1].rsplit(".", 1)[0]
        out[stem] = vid
    return out


def graph_from_pairs(spark, pairs, num_blocks: int = 2) -> Graph:
    """Build a Graph straight from (src_key, dst_key) string pairs (weight
    1.0) — for operator tests whose oracles work on keys. Vid assignment is
    key-sorted, so key order and vid order agree."""
    raw = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs],
        "src_key string, dst_key string, weight double",
    )
    return build_graph(raw, num_blocks=num_blocks, id_partitions=2)
