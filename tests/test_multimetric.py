"""Multi-metric edge state + config-declared `generating` pipeline.

Golden model: the reference's small fixture carries per-edge metric TRIPLES
(meters, kmph, s) where kmph is the constant 30 and s is derived as
meters/kmph in seconds (/root/reference/tests/small/parsing.rs:60-132;
metric matrix store /root/reference/src/network/graph/mod.rs:95-96; the
derivation vocabulary /root/reference/resources/blueprint.yaml:64-117).
Here the same triples come out of build_graph(metric_names=["meters"]) plus
a generating list [constant kmph=30, calc s = meters/kmph → seconds].
"""

from __future__ import annotations

import pytest

from osmgraphing_spark.functions import generating as gen
from osmgraphing_spark.operators.build import build_graph
from osmgraphing_spark.sources.synth import SMALL_RAW_EDGES

GEN_SPECS = [
    {"op": "constant", "name": "kmph", "value": 30.0},
    {
        "op": "calc", "name": "s", "a": "meters", "b": "kmph",
        "a_unit": "meters", "b_unit": "kilometers_per_hour", "out_unit": "seconds",
    },
]

# the reference's fwd-edge golden table: (src, dst) → (meters, kmph, s)
REF_TRIPLES = {
    ("b", "a"): (1.0, 30.0, 0.12), ("b", "c"): (1.0, 30.0, 0.12),
    ("c", "a"): (1.0, 30.0, 0.12), ("c", "b"): (1.0, 30.0, 0.12),
    ("d", "b"): (1.0, 30.0, 0.12), ("d", "e"): (2.0, 30.0, 0.24),
    ("d", "h"): (1.0, 30.0, 0.12), ("e", "d"): (2.0, 30.0, 0.24),
    ("e", "f"): (1.0, 30.0, 0.12), ("f", "e"): (1.0, 30.0, 0.12),
    ("f", "h"): (1.0, 30.0, 0.12), ("g", "e"): (1.0, 30.0, 0.12),
    ("g", "f"): (1.0, 30.0, 0.12), ("h", "c"): (4.0, 30.0, 0.48),
    ("h", "d"): (1.0, 30.0, 0.12), ("h", "f"): (1.0, 30.0, 0.12),
}


def _raw_multi(spark, rows):
    return spark.createDataFrame(
        [(s, d, [w]) for (s, d, w) in rows],
        "src_key string, dst_key string, metrics array<double>",
    )


def _mm_graph(spark):
    g = build_graph(
        _raw_multi(spark, SMALL_RAW_EDGES),
        num_blocks=4, id_partitions=2, metric_names=["meters"],
    )
    return gen.apply_generating(g, GEN_SPECS)


def test_multi_metric_build(spark):
    """Golden: the 19 raw small-fixture edges dedup to the reference's 16,
    each carrying the exact (meters, kmph, s) triple."""
    g = _mm_graph(spark)
    assert g.metric_names == ["meters", "kmph", "s"]
    key = {r["vid"]: r["key"] for r in g.vertices.collect()}
    got = {
        (key[r["src"]], key[r["dst"]]): tuple(r["metrics"])
        for r in g.edges.collect()
    }
    assert set(got) == set(REF_TRIPLES)
    for sd, (m, k, s) in REF_TRIPLES.items():
        gm, gk, gs = got[sd]
        assert gm == pytest.approx(m, abs=1e-6)
        assert gk == pytest.approx(k, abs=1e-6)
        assert gs == pytest.approx(s, abs=1e-6)
    # weight stays an alias of metrics[0] so every algorithm's weighted mode
    # keeps working on a multi-metric graph
    w = {(key[r["src"]], key[r["dst"]]): r["weight"] for r in g.edges.collect()}
    assert all(w[sd] == REF_TRIPLES[sd][0] for sd in REF_TRIPLES)


def test_generating_specs(spark):
    """copy / convert / raw calc vocabulary + error modes."""
    g = build_graph(
        _raw_multi(spark, [("a", "b", 1500.0), ("b", "c", 500.0)]),
        num_blocks=2, id_partitions=2, metric_names=["len_m"],
    )
    g = gen.apply_generating(g, [
        {"op": "copy", "name": "len_copy", "from": "len_m"},
        {"op": "convert", "name": "len_km", "from": "len_m",
         "from_unit": "meters", "to_unit": "kilometers"},
        {"op": "constant", "name": "two", "value": 2.0},
        {"op": "calc", "name": "half_km", "a": "len_km", "b": "two",
         "kind": "quotient"},
        {"op": "calc", "name": "double_km", "a": "len_km", "b": "two",
         "kind": "product"},
    ])
    rows = {tuple(r["metrics"]) for r in g.edges.collect()}
    assert rows == {
        (1500.0, 1500.0, 1.5, 2.0, 0.75, 3.0),
        (500.0, 500.0, 0.5, 2.0, 0.25, 1.0),
    }
    with pytest.raises(ValueError, match="duplicate"):
        gen.apply_generating(g, [{"op": "copy", "name": "two", "from": "len_m"}])
    with pytest.raises(ValueError, match="unknown metric"):
        gen.apply_generating(g, [{"op": "copy", "name": "x", "from": "nope"}])


def test_multi_metric_dedup_and_clamp(spark):
    """Vector dedup: rows collapse only when EVERY metric agrees at the
    1e-6 grid (reference finalize rule, building.rs:503-573); clamp is
    per-component."""
    raw = spark.createDataFrame(
        [
            ("a", "b", [1.0, 5.0]),
            ("a", "b", [1.0, 5.0]),          # exact dup → collapses
            ("a", "b", [1.0, 6.0]),          # 2nd metric differs → kept
            ("b", "c", [0.0, -3.0]),         # both clamp to 1e-6
        ],
        "src_key string, dst_key string, metrics array<double>",
    )
    g = build_graph(raw, num_blocks=2, id_partitions=2, metric_names=["m1", "m2"])
    mets = sorted(tuple(r["metrics"]) for r in g.edges.collect())
    assert len(mets) == 3
    assert (1e-6, 1e-6) in mets
    assert sum(1 for m in mets if m[0] == 1.0) == 2


def test_metric_means_and_normalize(spark):
    g = build_graph(
        _raw_multi(spark, [("a", "b", 2.0), ("b", "c", 4.0), ("c", "a", 6.0)]),
        num_blocks=2, id_partitions=2, metric_names=["m"],
    )
    g = gen.apply_generating(g, [{"op": "constant", "name": "k", "value": 10.0}])
    means = g.metric_means()
    assert means["m"] == pytest.approx(4.0)
    assert means["k"] == pytest.approx(10.0)
    normed = {
        tuple(r["metrics"]) for r in g.normalized_metrics().collect()
    }
    assert normed == {(0.5, 1.0), (1.0, 1.0), (1.5, 1.0)}
