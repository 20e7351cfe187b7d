"""Parity operators: units, haversine, strict readers, graph sinks,
workload generator, balancer update rules."""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmgraphing_spark.functions import geo, units
from osmgraphing_spark.operators import balance, cc, workload
from osmgraphing_spark.sources import readers, writers

from .helpers import build_fixture


def test_unit_conversion_matrix():
    assert units.conversion_factor("meters", "kilometers") == 0.001
    assert units.conversion_factor("kilometers", "meters") == 1000.0
    assert units.conversion_factor("hours", "seconds") == 3600.0
    assert units.conversion_factor("minutes", "hours") == pytest.approx(1 / 60)
    assert units.conversion_factor("meters", "f64") == 1.0
    with pytest.raises(units.UnitConversionError):
        units.conversion_factor("meters", "seconds")
    with pytest.raises(units.UnitConversionError):
        units.conversion_factor("furlongs", "meters")


def test_unit_convert_and_derive(spark):
    df = spark.createDataFrame([(12000.0, 60.0)], "dist_m double, speed_kmph double")
    out = df.select(
        units.convert(F.col("dist_m"), "meters", "kilometers").alias("km"),
        units.derive(
            F.col("dist_m"), "meters", F.col("speed_kmph"), "kilometers_per_hour", "minutes"
        ).alias("mins"),
    ).collect()[0]
    assert out["km"] == 12.0
    assert out["mins"] == pytest.approx(12.0)  # 12 km at 60 km/h = 12 min


def test_haversine_known_distance(spark):
    # Berlin (52.5200, 13.4050) ↔ Munich (48.1351, 11.5820) ≈ 504 km
    df = spark.createDataFrame(
        [(52.52, 13.405, 48.1351, 11.582)], "la double, lo double, lb double, lob double"
    )
    got = df.select(
        geo.haversine_km(F.col("la"), F.col("lo"), F.col("lb"), F.col("lob")).alias("d")
    ).collect()[0]["d"]
    assert got == pytest.approx(504.2, abs=2.0)
    # zero distance
    z = df.select(
        geo.haversine_km(F.col("la"), F.col("lo"), F.col("la"), F.col("lo")).alias("d")
    ).collect()[0]["d"]
    assert z == pytest.approx(0.0, abs=1e-9)


def test_strict_reader_comments_and_failfast(spark, tmp_path):
    p = tmp_path / "edges.txt"
    p.write_text("# comment line\n0 1 2.5\n1 2 3.5\n")
    df = readers.read_commented_csv(
        spark, str(p), "src long, dst long, w double", sep=" "
    )
    assert sorted((r["src"], r["dst"], r["w"]) for r in df.collect()) == [
        (0, 1, 2.5), (1, 2, 3.5),
    ]
    bad = tmp_path / "bad.txt"
    bad.write_text("0 1 2.5\n1 notanumber 3\n")
    with pytest.raises(Exception):
        readers.read_commented_csv(
            spark, str(bad), "src long, dst long, w double", sep=" "
        ).collect()


def test_graph_roundtrip_sink(spark, tmp_path):
    g, edges, weights = build_fixture(spark, ("small",))
    base = str(tmp_path / "graph_out")
    writers.write_graph_tables(g, base)
    v, e = readers.read_graph_tables(spark, base)
    assert v.count() == g.num_vertices
    got = sorted((r["src"], r["dst"], r["weight"]) for r in e.collect())
    assert got == sorted(zip([a for a, _ in edges], [b for _, b in edges], weights))
    manifest = json.load(open(os.path.join(base, "manifest.json")))
    assert manifest["num_vertices"] == 8 and manifest["num_edges"] == 16


def test_export_edges_csv_projection(spark, tmp_path):
    g, _, _ = build_fixture(spark, ("small",))
    path = str(tmp_path / "csv_out")
    writers.export_edges_csv(g, path, ["src", "ignored_col", "weight"])
    df = spark.read.option("header", "true").csv(path)
    assert df.columns == ["src", "ignored_col", "weight"]
    assert df.select("ignored_col").distinct().collect()[0][0] == "_"


def test_route_pair_generator_reachability(spark):
    """twocc: generated pairs never cross the two components (the
    reference's pair generator drops unreachable pairs the same way,
    random_or_all.rs:96-122)."""
    g, edges, _ = build_fixture(spark, ("twocc",))
    comps = cc.run(g)
    pairs = workload.generate_route_pairs(g, comps, n_pairs=40)
    comp_map = {r["vid"]: r["component"] for r in comps.collect()}
    rows = pairs.collect()
    assert len(rows) > 0
    for r in rows:
        assert comp_map[r["src"]] == comp_map[r["dst"]]
    # deterministic across calls
    again = workload.generate_route_pairs(g, comps, n_pairs=40).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_edge_workload_aggregation(spark):
    paths = spark.createDataFrame(
        [([0, 1, 2],), ([1, 2],), ([2],)], "edges array<long>"
    )
    got = {r["edge_id"]: r["workload"] for r in workload.edge_workloads(paths).collect()}
    assert got == {0: 1, 1: 2, 2: 3}


def test_balancer_updates(spark):
    metrics = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (2, 3.0)], "edge_id long, metric double"
    )
    loads = spark.createDataFrame([(0, 10), (1, 20)], "edge_id long, workload long")

    ee = balance.explicit_euler_update(metrics, loads, correction=0.5)
    rows = {r["edge_id"]: r["metric"] for r in ee.collect()}
    # hand-computed: norm loads (mean 15) → {0: 10/15, 1: 20/15, 2: 0};
    # blended with correction .5, clamped, then renormalized by the mean
    raw = {0: 1.0 + (10 / 15 - 1.0) * 0.5, 1: 2.0 + (20 / 15 - 2.0) * 0.5, 2: 3.0 + (0 - 3.0) * 0.5}
    mean = sum(raw.values()) / 3
    for k in raw:
        assert rows[k] == pytest.approx(raw[k] / mean, abs=1e-12)

    av = balance.averaging_update(metrics, loads, iteration=3)
    rows = {r["edge_id"]: r["metric"] for r in av.collect()}
    raw = {0: (3 * 1.0 + 10 / 15) / 4, 1: (3 * 2.0 + 20 / 15) / 4, 2: (3 * 3.0) / 4}
    mean = sum(raw.values()) / 3
    for k in raw:
        assert rows[k] == pytest.approx(raw[k] / mean, abs=1e-12)


def test_balance_loop_matches_python_mirror(spark):
    """The full balancing binary composition (contract → batched CH route
    → usage count → blend rule → clamp → renormalize), two iterations on
    a diamond with unique shortest paths, against an exact python mirror
    — including the route FLIP in iteration 2 after iteration 1's update
    makes the previously-unused branch cheaper."""
    from osmgraphing_spark.operators import balance

    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (1, 4, 5.0), (4, 3, 5.0)],
        "src long, dst long, w double",
    )
    pairs = spark.createDataFrame([(1, 3, 2)], "src long, dst long, count int")
    out, hist = balance.balance_loop(edges, pairs, num_iter=2, rule="averaging")
    got = {(r["src"], r["dst"]): r["w"] for r in out.collect()}
    assert [h["routed_pairs"] for h in hist] == [1, 1]
    assert all(abs(h["mean_w"] - 1.0) < 1e-6 for h in hist)

    F64 = 1e-6
    w = {(1, 2): 1.0, (2, 3): 1.0, (1, 4): 5.0, (4, 3): 5.0}
    for it in range(2):
        via2 = w[(1, 2)] + w[(2, 3)]
        via4 = w[(1, 4)] + w[(4, 3)]
        path = [(1, 2), (2, 3)] if via2 <= via4 else [(1, 4), (4, 3)]
        usage = {e: (2.0 if e in path else 0.0) for e in w}
        pos = [v for v in usage.values() if v > 0]
        mu = sum(pos) / len(pos)
        norm = {e: (usage[e] / mu if usage[e] > 0 else 0.0) for e in w}
        new = {e: max(F64, (it * w[e] + norm[e]) / (it + 1)) for e in w}
        m = sum(new.values()) / len(new)
        w = {e: new[e] / m for e in w}
    for e, v in w.items():
        assert got[e] == pytest.approx(v, abs=1e-6), e


def test_balance_loop_resume_identical(spark, tmp_path):
    """Kill-and-resume drill for the balancing loop: a run checkpointed
    after iteration 0 and RESUMED for iteration 1 must produce exactly
    the weights of an uninterrupted 2-iteration run (the PageRank
    resumability discipline applied to the flagship workflow)."""
    from osmgraphing_spark.operators import balance
    from osmgraphing_spark.plans.checkpoint import CheckpointManager

    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (1, 4, 5.0), (4, 3, 5.0)],
        "src long, dst long, w double",
    )
    pairs = spark.createDataFrame([(1, 3, 2)], "src long, dst long, count int")

    full, _ = balance.balance_loop(edges, pairs, num_iter=2)
    want = {(r["src"], r["dst"]): r["w"] for r in full.collect()}

    root = str(tmp_path / "ckpt")
    ck1 = CheckpointManager(spark, root, "balance")
    balance.balance_loop(edges, pairs, num_iter=1, checkpoint=ck1)
    assert ck1.latest() == 0  # iteration 0 durably committed

    ck2 = CheckpointManager(spark, root, "balance")
    resumed, hist = balance.balance_loop(
        edges, pairs, num_iter=2, checkpoint=ck2, resume=True
    )
    got = {(r["src"], r["dst"]): r["w"] for r in resumed.collect()}
    assert [h["iteration"] for h in hist] == [0, 1]  # history carried over
    for k, v in want.items():
        assert got[k] == pytest.approx(v), k
