"""miniyaml parser + blueprint-dialect lowering + YAML CLI end-to-end.

The reference is configured by YAML job files
(/root/reference/src/configs/parsing/mod.rs:86-142, schema in
resources/blueprint.yaml); these tests pin (1) the parser on the exact
syntax shapes those files use, (2) the blueprint→JobConfig lowering
semantics, (3) a reference-shaped .yaml file driving the batch CLI
end-to-end.
"""

from __future__ import annotations

import json
import os

import pytest

from osmgraphing_spark import miniyaml
from osmgraphing_spark.blueprint import lower_blueprint
from osmgraphing_spark.cli import JobConfig, run as cli_run
from osmgraphing_spark.sources import synth


def test_scalars_and_flow():
    doc = """
# comment
a: 1
b: -2.5
c: true
d: 'quoted # not comment'
e: { info: 'NodeId', id: 'node-id' }
f: [1, 2.5, 'x', {k: v}]
g: ~
h:
"""
    assert miniyaml.loads(doc) == {
        "a": 1,
        "b": -2.5,
        "c": True,
        "d": "quoted # not comment",
        "e": {"info": "NodeId", "id": "node-id"},
        "f": [1, 2.5, "x", {"k": "v"}],
        "g": None,
        "h": None,
    }


def test_block_shapes_of_the_reference_configs():
    doc = """
parsing:
  nodes:
  - meta: { info: 'NodeId', id: 'node-id' }
  - ignored
  edges:
    data: []
  generating:
    edges:
    - convert:
        from: { unit: 'Meters', id: 'meters' }
        to: { unit: 'Kilometers', id: 'kilometers' }
method:
  averaging
"""
    d = miniyaml.loads(doc)
    assert d["parsing"]["nodes"] == [
        {"meta": {"info": "NodeId", "id": "node-id"}},
        "ignored",
    ]
    assert d["parsing"]["edges"]["data"] == []
    conv = d["parsing"]["generating"]["edges"][0]["convert"]
    assert conv == {
        "from": {"unit": "Meters", "id": "meters"},
        "to": {"unit": "Kilometers", "id": "kilometers"},
    }
    # plain scalar as a block value (balancing config's `method:` shape)
    assert d["method"] == "averaging"


def test_strictness():
    with pytest.raises(miniyaml.MiniYamlError):
        miniyaml.loads("a: 1\n\tb: 2")  # tab indent
    with pytest.raises(miniyaml.MiniYamlError):
        miniyaml.loads("a: 1\na: 2")  # duplicate key
    with pytest.raises(miniyaml.MiniYamlError):
        miniyaml.loads("a: { b: 1")  # unterminated flow


def test_parses_real_reference_configs():
    """Every actually-valid YAML under the reference's resources/ parses
    (blueprint.yaml itself documents mutually-exclusive alternatives as a
    bare scalar inside a map — invalid YAML by design, excluded)."""
    import glob

    paths = [
        p
        for p in sorted(glob.glob("/root/reference/resources/**/*.yaml", recursive=True))
        if not p.endswith(("blueprint.yaml", "balancing/config.yaml"))
    ]
    if not paths:
        pytest.skip("reference resources not available")
    for p in paths:
        d = miniyaml.load(p)
        assert isinstance(d, dict) and d, p
    # spot-check one known structure
    fmi = miniyaml.load("/root/reference/resources/small/fmi.yaml")
    assert fmi["parsing"]["map-file"] == "resources/small/graph.fmi"
    gen = fmi["parsing"]["generating"]["edges"]
    assert gen[1]["calc"]["result"] == {"unit": "Hours", "id": "hours"}


def test_lower_blueprint_semantics():
    raw = {
        "parsing": {
            "map-file": "/x/corpus.parquet",
            "vehicles": {"category": "Car"},
            "edges": {
                "will_normalize_metrics_by_mean": True,
                "data": [
                    {"meta": {"info": "SrcId", "id": "src-id"}},
                    {"metric": {"unit": "Meters", "id": "meters"}},
                    {"metric": {"unit": "KilometersPerHour", "id": "kmph"}},
                ],
            },
            "generating": {
                "edges": [
                    "ignored",
                    {"meta": {"info": "EdgeId", "id": "edge-id"}},
                    {"custom": {"unit": "F64", "id": "kmph2", "default": 30.0}},
                    {
                        "copy": {
                            "from": {"unit": "Meters", "id": "meters"},
                            "to": {"unit": "Kilometers", "id": "kilometers"},
                        }
                    },
                    {
                        "calc": {
                            "result": {"unit": "Hours", "id": "hours"},
                            "a": {"unit": "Kilometers", "id": "kilometers"},
                            "b": {"unit": "KilometersPerHour", "id": "kmph2"},
                        }
                    },
                ]
            },
        },
        "routing": {"metrics": [{"id": "meters"}]},
    }
    kwargs, warns = lower_blueprint(raw)
    assert kwargs["corpus"] == "/x/corpus.parquet"
    assert kwargs["normalize_metrics"] is True
    assert kwargs["metric_names"] == ["meters"]
    assert kwargs["generating"] == [
        {"op": "constant", "name": "kmph2", "value": 30.0},
        {
            "op": "convert",
            "name": "kilometers",
            "from": "meters",
            "from_unit": "meters",
            "to_unit": "kilometers",
        },
        {
            "op": "calc",
            "name": "hours",
            "a": "kilometers",
            "b": "kmph2",
            "a_unit": "kilometers",
            "b_unit": "kilometers_per_hour",
            "out_unit": "hours",
        },
    ]
    joined = "\n".join(warns)
    assert "vehicles" in joined and "routing" in joined
    assert any("declares 2 metrics" in w for w in warns)

    with pytest.raises(ValueError, match="haversine"):
        lower_blueprint(
            {
                "parsing": {
                    "map-file": "x",
                    "generating": {"edges": [{"haversine": {"unit": "Meters", "id": "m"}}]},
                }
            }
        )
    with pytest.raises(ValueError, match="merge"):
        lower_blueprint(
            {
                "parsing": {
                    "map-file": "x",
                    "generating": {"edges": [{"merge": {"from": "x.csv"}}]},
                }
            }
        )


def test_cli_accepts_blueprint_yaml(spark, tmp_path):
    """A reference-shaped .yaml config drives the batch CLI end-to-end:
    parsing/generating lowered, metrics algorithm writes the derived
    vector, normalization applied in place."""
    corpus_path = str(tmp_path / "corpus.parquet")
    synth.fixture_corpus(spark, ("small",)).write.parquet(corpus_path)
    out = str(tmp_path / "out")

    cfg = tmp_path / "job.yaml"
    cfg.write_text(
        f"""
# migrated blueprint config
parsing:
  map-file: '{corpus_path}'
  edges:
    data:
    - metric: {{ unit: 'Meters', id: 'meters' }}
  generating:
    edges:
    - custom: {{ unit: 'KilometersPerHour', id: 'kmph', default: 30.0 }}
    - copy:
        from: {{ unit: 'Meters', id: 'meters' }}
        to: {{ unit: 'Kilometers', id: 'kilometers' }}
    - calc:
        result: {{ unit: 'Hours', id: 'hours' }}
        a: {{ unit: 'Kilometers', id: 'kilometers' }}
        b: {{ unit: 'KilometersPerHour', id: 'kmph' }}
algorithms: ['metrics', 'degrees']
output: '{out}'
num_blocks: 4
"""
    )
    cfg_obj = JobConfig.from_file(str(cfg))
    assert cfg_obj.metric_names == ["meters"]
    assert [s["op"] for s in cfg_obj.generating] == ["constant", "convert", "calc"]

    summary = cli_run(cfg_obj)
    assert summary["edges"] == 16
    rows = spark.read.parquet(os.path.join(out, "metrics")).collect()
    assert set(rows[0].asDict()) == {"src", "dst", "meters", "kmph", "kilometers", "hours"}
    for r in rows:
        assert r["kmph"] == 30.0
        assert abs(r["kilometers"] - r["meters"] / 1000.0) < 1e-9
        assert abs(r["hours"] - r["kilometers"] / 30.0) < 1e-9


def test_cli_json_still_works(tmp_path):
    cfg = tmp_path / "j.json"
    cfg.write_text(json.dumps({"corpus": "/x", "output": "/y", "algorithms": ["cc"]}))
    assert JobConfig.from_file(str(cfg)).algorithms == ["cc"]
