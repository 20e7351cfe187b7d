"""The reference CI's flagship balancing job as a pinned golden: 2 averaging
metric updates on isle_of_man with the real 10,000-route workload file
(/root/reference/.github/workflows/rust.yml runs exactly this;
balancing/config.yaml: averaging, min_new_metric 0.1). Every stage is
deterministic — pbf parse, single-task witnessed CH, per-pair bidirectional
Dijkstra, count-weighted blend — so the per-iteration blended means are
constants to ~1e-7 (the mean's float summation order varies run to run, so
the pin is at 1e-5); if they move past that, something in the
contract→route→blend stack changed behavior, not just performance."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

PBF = "/root/reference/resources/isle_of_man_2020-03-14/graph.osm.pbf"
PAIRS = "/root/reference/resources/isle_of_man_2020-03-14/10_000.route-pairs"


@pytest.mark.skipif(
    not (os.path.exists(PBF) and os.path.exists(PAIRS)),
    reason="reference isle_of_man fixture not present",
)
def test_balance_isle_of_man_two_iterations_golden(spark):
    from osmgraphing_spark.operators.balance import balance_loop
    from osmgraphing_spark.sources import pbf as _pbf
    from osmgraphing_spark.sources.readers import read_route_pairs

    g = _pbf.pbf_graph(spark, PBF, num_blocks=16)
    rp = read_route_pairs(spark, PAIRS)
    vk = g.vertices.select("key", "vid")
    pairs = (
        rp.join(
            vk.select(F.col("key").alias("_sk"), F.col("vid").alias("src")),
            F.col("src_id").cast("string") == F.col("_sk"),
        )
        .join(
            vk.select(F.col("key").alias("_dk"), F.col("vid").alias("dst")),
            F.col("dst_id").cast("string") == F.col("_dk"),
        )
        .select("src", "dst", "count")
    )
    balanced, hist = balance_loop(
        g.edges.select("src", "dst", F.col("weight").alias("w")),
        pairs, num_iter=2, rule="averaging", min_metric=0.1,
    )
    assert [h["routed_pairs"] for h in hist] == [10_000, 10_000]
    # blended-metric goldens (measured 2026-08-22; see docstring for the
    # 1e-5 pin rationale)
    assert [round(h["mean_w"], 5) for h in hist] == [1.03202, 1.0136]
    assert balanced.count() == 61_579
