"""OSM PBF source (sources/pbf.py): wire-format units, street-semantics
tables, and the end-to-end golden against the reference's own fixture
(reference resource files used as DATA only)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from osmgraphing_spark.sources import pbf

PBF = "/root/reference/resources/isle_of_man_2020-03-14/graph.osm.pbf"


def test_varint_zigzag_roundtrip():
    def enc(v):
        out = bytearray()
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    for v in (0, 1, 127, 128, 300, 2**35, 2**63 - 1):
        got, pos = pbf._varint(enc(v), 0)
        assert got == v and pos == len(enc(v))
    for v in (0, -1, 1, -2, 2, -(2**31), 2**31):
        z = (v << 1) ^ (v >> 63)  # zigzag encode
        assert pbf._zigzag(z & (2**64 - 1) if z < 0 else z) == v


def test_way_to_edges_oneway_vocabulary():
    refs = np.array([1, 2, 3], dtype=np.int64)
    t = {"highway": "primary"}
    # two-way: forward + backward pairs
    got = list(pbf.way_to_edges({**t}, refs, "car", True))
    assert [(s, d) for s, d, *_ in got] == [(1, 2), (2, 3), (3, 2), (2, 1)]
    # oneway=yes: forward only
    got = list(pbf.way_to_edges({**t, "oneway": "yes"}, refs, "car", True))
    assert [(s, d) for s, d, *_ in got] == [(1, 2), (2, 3)]
    # oneway=-1: reversed
    got = list(pbf.way_to_edges({**t, "oneway": "-1"}, refs, "car", True))
    assert [(s, d) for s, d, *_ in got] == [(3, 2), (2, 1)]
    # creative unknown value: defaults to two-way (reference warns + no)
    got = list(pbf.way_to_edges({**t, "oneway": "sometimes"}, refs, "car", True))
    assert len(got) == 4


def test_street_admission_matrix():
    # picky car: track excluded, residential included, cycleway never
    assert pbf.is_admitted("residential", "car", True)
    assert not pbf.is_admitted("track", "car", True)
    assert pbf.is_admitted("track", "car", False)
    assert not pbf.is_admitted("cycleway", "car", False)
    # bicycle: primary only when not picky
    assert not pbf.is_admitted("primary", "bicycle", True)
    assert pbf.is_admitted("primary", "bicycle", False)
    # pedestrian: path yes, motorway no
    assert pbf.is_admitted("path", "pedestrian", True)
    assert not pbf.is_admitted("motorway", "pedestrian", True)
    # non-street ways (no highway tag / unknown value) emit nothing
    refs = np.array([1, 2], dtype=np.int64)
    assert list(pbf.way_to_edges({"building": "yes"}, refs, "car", True)) == []
    assert (
        list(pbf.way_to_edges({"highway": "proposed"}, refs, "car", True)) == []
    )


def test_maxspeed_parse():
    assert pbf.parse_maxspeed({"maxspeed": "80"}, "residential") == 80.0
    assert pbf.parse_maxspeed({"maxspeed": "2"}, "residential") == 5.0  # MIN_KMH
    assert pbf.parse_maxspeed({}, "motorway") == 130.0
    assert pbf.parse_maxspeed({"maxspeed": "60 mph"}, "residential") == 100.0
    assert pbf.parse_maxspeed({"maxspeed": "walk"}, "primary") == 15.0
    assert pbf.parse_maxspeed({"maxspeed": "??"}, "secondary") == 70.0  # fallback


@pytest.mark.skipif(not os.path.exists(PBF), reason="reference pbf absent")
def test_blob_index_covers_file():
    idx = pbf.blob_index(PBF)
    assert idx[0][2] == "OSMHeader" and all(t == "OSMData" for _, _, t in idx[1:])
    last_off, last_size, _ = idx[-1]
    assert last_off + last_size == os.path.getsize(PBF)


@pytest.mark.skipif(not os.path.exists(PBF), reason="reference pbf absent")
def test_isle_of_man_reference_golden(spark):
    """THE parity pin: the reference's isle_of_man parsing test expects
    30,575 nodes and 61,579 edges after the car+picky street filter and
    builder dedup (/root/reference/tests/isle_of_man/parsing.rs:40-41);
    the blob-parallel decode + build_graph reproduces both exactly."""
    g = pbf.pbf_graph(spark, PBF, num_blocks=4)
    assert g.num_vertices == 30_575
    assert g.num_edges == 61_579
    assert g.metric_names == ["kmph", "lanecount"]


@pytest.mark.skipif(not os.path.exists(PBF), reason="reference pbf absent")
def test_pbf_haversine_metrics(spark):
    """with_haversine reproduces the isle_of_man config's generated
    metrics (kilometers from node coords, hours = km / kmph); spot-check
    one edge's distance is positive and below the island's diameter."""
    g = pbf.pbf_graph(spark, PBF, num_blocks=4, with_haversine=True)
    assert g.metric_names == ["kmph", "lanecount", "kilometers", "hours"]
    from pyspark.sql import functions as F

    row = (
        g.edges.select(
            F.min(F.element_at("metrics", 3)).alias("lo"),
            F.max(F.element_at("metrics", 3)).alias("hi"),
        ).collect()[0]
    )
    assert 0.0 <= row["lo"] and row["hi"] < 60.0


@pytest.mark.skipif(not os.path.exists(PBF), reason="reference pbf absent")
def test_blueprint_cli_ingests_pbf_map_file(tmp_path):
    """The reference's osm.pbf.yaml shape (vehicles + provided kmph/
    lanecount + generated haversine km and calc hours) runs through the
    batch CLI: street filter honors the vehicles section, haversine is
    materialized by pbf_graph, hours derives via the generic calc spec,
    and the golden counts hold."""
    from osmgraphing_spark.cli import JobConfig, run

    cfgf = tmp_path / "job.yaml"
    cfgf.write_text(f"""\
parsing:
  map-file: '{PBF}'
  vehicles:
    category: 'Car'
    are_drivers_picky: true
  nodes:
  - meta: {{ info: 'NodeId', id: 'node-id' }}
  - metric: {{ unit: 'Latitude', id: 'latitude' }}
  - metric: {{ unit: 'Longitude', id: 'longitude' }}
  edges:
    data:
    - meta: {{ info: 'SrcId', id: 'src-id' }}
    - meta: {{ info: 'DstId', id: 'dst-id' }}
    - ignored
    - metric: {{ unit: 'KilometersPerHour', id: 'kmph' }}
    - metric: {{ unit: 'LaneCount', id: 'lanecount' }}
  generating:
    edges:
    - haversine: {{ unit: 'Kilometers', id: 'kilometers' }}
    - calc:
        result: {{ unit: 'Hours', id: 'hours' }}
        a: {{ unit: 'Kilometers', id: 'kilometers' }}
        b: {{ unit: 'KilometersPerHour', id: 'kmph' }}
output: '{tmp_path}/out'
algorithms: ['degrees']
master: 'local[4]'
num_blocks: 4
""")
    cfg = JobConfig.from_file(str(cfgf))
    assert cfg.map_format == "pbf"
    assert cfg.vehicle == "car" and cfg.picky and cfg.pbf_haversine
    assert [sp["op"] for sp in cfg.generating] == ["calc"]
    summary = run(cfg)
    assert summary["vertices"] == 30_575 and summary["edges"] == 61_579


@pytest.mark.skipif(not os.path.exists(PBF), reason="reference pbf absent")
def test_pbf_to_fmi_roundtrip(spark, tmp_path):
    """The reference's pbf→fmi conversion workflow (pbf_to_fmi.yaml):
    parse the pbf, write a native .fmi with the config's column order,
    read it BACK with sources.fmi and rebuild — the golden counts hold
    across the round trip and the total kilometers metric agrees."""
    from pyspark.sql import functions as F

    from osmgraphing_spark.sources import fmi, writers

    out = str(tmp_path / "iom.fmi")
    g = writers.pbf_to_fmi(spark, PBF, out, num_blocks=4)
    assert g.num_vertices == 30_575 and g.num_edges == 61_579

    node_schema = [
        ("node_idx", "long"), ("node_id", "long"),
        ("latitude", "double"), ("longitude", "double"),
    ]
    edge_schema = [
        ("edge_id", "long"), ("src_id", "long"), ("dst_id", "long"),
        ("kilometers", "double"), ("hours", "double"), ("lane_count", "long"),
    ]
    t = fmi.read_fmi(spark, out, node_schema, edge_schema)
    assert (t.metric_count, t.node_count, t.edge_count) == (3, 30_575, 61_579)

    g2 = fmi.fmi_graph(
        spark, out, node_schema, edge_schema,
        src_col="src_id", dst_col="dst_id", num_blocks=4,
    )
    assert g2.num_vertices == 30_575 and g2.num_edges == 61_579
    km1 = g.edges.agg(
        F.round(F.sum(F.round(F.element_at("metrics", 3), 6)), 3)
    ).collect()[0][0]
    km2 = g2.edges.agg(
        F.round(F.sum(F.element_at("metrics", 1)), 3)
    ).collect()[0][0]
    assert km1 == km2
