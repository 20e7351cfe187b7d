"""FMI text-graph source (sources/fmi.py) — parse + strictness + the full
file→Graph→algorithm path, pinned against the reference's OWN resource files
when present (read as data fixtures, never as code)."""

from __future__ import annotations

import os

import pytest

from osmgraphing_spark.operators import sssp
from osmgraphing_spark.sources import fmi

REF = "/root/reference/resources"

PLAIN_NODES = [("node_id", "long"), ("lat", "double"), ("lon", "double")]
PLAIN_EDGES = [
    ("src_id", "long"),
    ("dst_id", "long"),
    ("meters", "double"),
    ("kmph", "double"),
]


def _write(tmp_path, text):
    p = tmp_path / "g.fmi"
    p.write_text(text)
    return str(p)


SYNTH = """\
# synthetic plain fmi
2

# edge-count below
3
# nodes
10 48.5 9.0   # a
20 48.6 9.1
# edges
10 20 100 50
20 10 100 50  # back
10 10 7 30
"""


def test_plain_parse_counts_types_and_inline_comments(spark, tmp_path):
    t = fmi.read_fmi(spark, _write(tmp_path, SYNTH), PLAIN_NODES, PLAIN_EDGES)
    assert (t.metric_count, t.node_count, t.edge_count) == (None, 2, 3)
    nodes = {r["node_id"]: (r["lat"], r["lon"]) for r in t.nodes.collect()}
    assert nodes == {10: (48.5, 9.0), 20: (48.6, 9.1)}
    edges = sorted(
        (r["src_id"], r["dst_id"], r["meters"], r["kmph"])
        for r in t.edges.collect()
    )
    assert edges == [
        (10, 10, 7.0, 30.0),
        (10, 20, 100.0, 50.0),
        (20, 10, 100.0, 50.0),
    ]


def test_header_count_mismatch_fails(spark, tmp_path):
    bad = SYNTH.replace("\n3\n", "\n4\n")
    with pytest.raises(ValueError, match="header declares"):
        fmi.read_fmi(spark, _write(tmp_path, bad), PLAIN_NODES, PLAIN_EDGES)


def test_malformed_token_fails(spark, tmp_path):
    bad = SYNTH.replace("10 20 100 50", "10 20 oops 50")
    with pytest.raises(Exception, match="typed cast|CAST_INVALID_INPUT"):
        fmi.read_fmi(spark, _write(tmp_path, bad), PLAIN_NODES, PLAIN_EDGES)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference resources absent")
def test_simple_stuttgart_reference_file(spark):
    """The reference's own 6-node demo graph parses to its documented
    counts and a spot-checked edge (graph.fmi:1-30)."""
    t = fmi.read_fmi(
        spark, f"{REF}/simple_stuttgart/graph.fmi", PLAIN_NODES, PLAIN_EDGES
    )
    assert (t.node_count, t.edge_count) == (6, 13)
    row = t.edges.where(
        (t.edges.src_id == 26033921) & (t.edges.dst_id == 26160028)
    ).collect()
    assert len(row) == 1 and row[0]["meters"] == 8000.0


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference resources absent")
def test_bidirectional_bait_golden_through_fmi_graph(spark):
    """End-to-end: the reference's bidirectional_bait graph.fmi through
    fmi_graph → BSP SSSP reproduces the bait golden (top 3-hop path cost 9
    beats the 2-hop bottom path's 10 — tests/bidirectional_bait/routing/
    fastest.rs), previously pinned only via a hand-built fixture."""
    g = fmi.fmi_graph(
        spark,
        f"{REF}/bidirectional_bait/graph.fmi",
        PLAIN_NODES,
        PLAIN_EDGES,
        num_blocks=4,
    )
    assert g.num_vertices == 5 and g.num_edges == 10
    vid = {r["key"]: r["vid"] for r in g.vertices.collect()}
    d = sssp.run(g, [vid["0"]], weighted=True, max_iter=10)
    cost = {
        r["vid"]: r["dist"] for r in d.collect()
    }
    assert cost[vid["2"]] == pytest.approx(9.0)  # ll -> rr via the top path


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference resources absent")
def test_ch_file_positional_mode(spark):
    """graph.ch.fmi has 6-wide node AND edge rows — width discrimination is
    impossible, so the reader slices by file position; 3-count CH header."""
    ch_nodes = [
        ("ignored_idx", "string"),
        ("node_id", "long"),
        ("lat", "double"),
        ("lon", "double"),
        ("ignored_elev", "string"),
        ("level", "long"),
    ]
    ch_edges = [
        ("src_id", "long"),
        ("dst_id", "long"),
        ("meters", "double"),
        ("seconds", "double"),
        ("sc0", "long"),
        ("sc1", "long"),
    ]
    t = fmi.read_fmi(spark, f"{REF}/small/graph.ch.fmi", ch_nodes, ch_edges)
    assert (t.metric_count, t.node_count, t.edge_count) == (3, 8, 25)
    assert t.nodes.where(t.nodes.level == 4).collect()[0]["node_id"] == 7
    # shortcut slots parse as longs, -1 = none
    assert t.edges.where(t.edges.sc0 == -1).count() > 0


def test_blueprint_schema_lowering():
    raw = {
        "parsing": {
            "map-file": "x.fmi",
            "nodes": [
                "ignored",
                {"meta": {"info": "NodeId", "id": "node-id"}},
                {"metric": {"unit": "Latitude", "id": "latitude"}},
                {"metric": {"unit": "Longitude", "id": "longitude"}},
            ],
            "edges": {
                "data": [
                    {"meta": {"info": "SrcId", "id": "src-id"}},
                    {"meta": {"info": "DstId", "id": "dst-id"}},
                    {"metric": {"unit": "Kilometers", "id": "kilometers"}},
                ]
            },
        }
    }
    n, e = fmi.schemas_from_blueprint(raw)
    assert n == [
        ("ignored_n0", "string"),
        ("node_id", "long"),
        ("latitude", "double"),
        ("longitude", "double"),
    ]
    assert e == [
        ("src_id", "long"),
        ("dst_id", "long"),
        ("kilometers", "double"),
    ]


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference resources absent")
def test_blueprint_cli_ingests_fmi_map_file(tmp_path):
    """A reference-shaped YAML whose map-file is an actual .fmi now runs
    through the batch CLI end-to-end (blueprint → fmi_graph → algorithms),
    instead of requiring a parquet corpus."""
    from osmgraphing_spark.cli import JobConfig, run

    cfgf = tmp_path / "job.yaml"
    cfgf.write_text(f"""\
parsing:
  map-file: '{REF}/bidirectional_bait/graph.fmi'
  nodes:
  - meta: {{ info: 'NodeId', id: 'node-id' }}
  - metric: {{ unit: 'Latitude', id: 'lat' }}
  - metric: {{ unit: 'Longitude', id: 'lon' }}
  edges:
    data:
    - meta: {{ info: 'SrcId', id: 'src-id' }}
    - meta: {{ info: 'DstId', id: 'dst-id' }}
    - metric: {{ unit: 'Meters', id: 'meters' }}
    - metric: {{ unit: 'KilometersPerHour', id: 'kmph' }}
output: '{tmp_path}/out'
algorithms: ['degrees']
master: 'local[4]'
num_blocks: 4
""")
    cfg = JobConfig.from_file(str(cfgf))
    assert cfg.map_format == "fmi"
    assert cfg.fmi_edge_schema == [
        ["src_id", "long"], ["dst_id", "long"],
        ["meters", "double"], ["kmph", "double"],
    ]
    summary = run(cfg)
    assert summary["vertices"] == 5 and summary["edges"] == 10


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference resources absent")
def test_read_route_pairs_reference_file(spark):
    """The reference's real 10k-route workload file parses with the
    declared count asserted and typed columns."""
    from osmgraphing_spark.sources.readers import read_route_pairs

    rp = read_route_pairs(
        spark, f"{REF}/isle_of_man_2020-03-14/10_000.route-pairs"
    )
    assert rp.count() == 10_000
    first = rp.orderBy("src_id", "dst_id").first()
    assert first["count"] >= 1


def test_read_route_pairs_strictness(spark, tmp_path):
    from osmgraphing_spark.sources.readers import read_route_pairs

    p = tmp_path / "w.route-pairs"
    p.write_text("# c\n2\n\n1 2 1\n")  # declares 2, has 1
    with pytest.raises(ValueError, match="declares 2"):
        read_route_pairs(spark, str(p))


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference resources absent")
def test_blueprint_cli_balancing_workflow(tmp_path):
    """The reference's flagship balancing binary, driven by its own
    config shape (parsing + balancing.optimizing_with + routing
    .route-pairs-file) through the batch CLI: per-iteration in-engine
    contraction + batched CH routing + averaging blend, min_new_metric
    floor honored, balanced metric parquet + history emitted."""
    from osmgraphing_spark.cli import JobConfig, run

    rp = tmp_path / "pairs.route-pairs"
    rp.write_text("# route-count\n2\n\n0 2 3\n1 0 1\n")
    cfgf = tmp_path / "job.yaml"
    cfgf.write_text(f"""\
parsing:
  map-file: '{REF}/bidirectional_bait/graph.fmi'
  nodes:
  - meta: {{ info: 'NodeId', id: 'node-id' }}
  - metric: {{ unit: 'Latitude', id: 'lat' }}
  - metric: {{ unit: 'Longitude', id: 'lon' }}
  edges:
    data:
    - meta: {{ info: 'SrcId', id: 'src-id' }}
    - meta: {{ info: 'DstId', id: 'dst-id' }}
    - metric: {{ unit: 'Meters', id: 'meters' }}
    - metric: {{ unit: 'KilometersPerHour', id: 'kmph' }}
balancing:
  optimizing_with:
    metric-id: 'workload'
    method:
      averaging
  number_of_metric-updates: 2
  min_new_metric: 0.1
routing:
  route-pairs-file: '{rp}'
output: '{tmp_path}/out'
algorithms: ['balancing']
master: 'local[4]'
num_blocks: 4
""")
    cfg = JobConfig.from_file(str(cfgf))
    assert cfg.balancing["rule"] == "averaging"
    assert cfg.balancing["num_iter"] == 2
    assert cfg.balancing["min_metric"] == 0.1
    summary = run(cfg)
    hist = summary["balancing_history"]
    assert [h["routed_pairs"] for h in hist] == [2, 2]
    import duckdb

    df = duckdb.sql(
        f"SELECT * FROM '{tmp_path}/out/balancing/*.parquet'"
    ).df()
    assert len(df) == 10
    assert df["balanced_w"].min() >= 0.1 - 1e-9  # the floor binds
    # BOTH endpoints map back to external node ids — a consumer of the
    # written edge table must never be stuck with internal dense vids
    assert {"src_key", "dst_key"} <= set(df.columns)
    assert df["src_key"].notna().all() and df["dst_key"].notna().all()
