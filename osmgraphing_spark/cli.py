"""Job CLI — the engine's `osmgraphing --config cfg.yaml` equivalent
(/root/reference/src/bin/osmgraphing/mod.rs:39-57: config-driven batch run).

Config is a JSON or YAML file (``.yaml``/``.yml`` parsed by the
dependency-free ``miniyaml`` shim). Two dialects:

- native (below): the engine's own keys, JSON or YAML.
- blueprint: a reference-shaped file with a top-level ``parsing:`` section
  (resources/blueprint.yaml dialect) — lowered by ``blueprint
  .lower_blueprint`` with explicit warnings for semantic deltas.

Native shape:

    {
      "corpus": "/path/corpus.parquet",          # (repo,path,commit,lang,content)
      "reference_hashes": "/path/ref.parquet",   # optional sha256 sidecar
      "algorithms": ["pagerank", "cc", "lpa", "triangles"],
      "output": "/path/results",
      "checkpoint_root": "/path/ckpt",           # optional; enables resume
      "num_blocks": 32,
      "pagerank": {"damping": 0.85, "tol": 1e-6, "max_iter": 200},
      "sssp": {"sources": ["repo/src/a.py"], "weighted": true},
      "generating": [                           # blueprint.yaml generating:
        {"op": "constant", "name": "kmph", "value": 30.0},
        {"op": "calc", "name": "s", "a": "weight", "b": "kmph",
         "a_unit": "meters", "b_unit": "kilometers_per_hour",
         "out_unit": "seconds"}
      ]
    }

Run locally or on a cluster (north rule):

    spark-submit --py-files osmgraphing_spark.zip -m ... , or simply
    python -m osmgraphing_spark.cli --config job.json [--resume]

`scripts/make_pyfiles_zip.py` builds the --py-files artifact.
"""

from __future__ import annotations

import argparse
import json
import os
from dataclasses import dataclass, field


@dataclass
class JobConfig:
    corpus: str
    output: str
    algorithms: list[str] = field(default_factory=lambda: ["pagerank"])
    reference_hashes: str | None = None
    checkpoint_root: str | None = None
    num_blocks: int = 32
    master: str | None = None
    pagerank: dict = field(default_factory=dict)
    lpa: dict = field(default_factory=dict)
    sssp: dict = field(default_factory=dict)
    generating: list = field(default_factory=list)
    # blueprint parity: name metrics[0] (the extracted weight) after the
    # config's first declared metric id, and/or mean-normalize the vector
    # (parsing.edges.will_normalize_metrics_by_mean)
    metric_names: list = field(default_factory=list)
    normalize_metrics: bool = False
    warnings: list = field(default_factory=list)
    # graph-file ingest (reference .fmi/.pbf map-files, sources/fmi+pbf):
    # corpus then names the graph file instead of a parquet corpus table
    map_format: str = "parquet"  # parquet | fmi | pbf
    fmi_node_schema: list = field(default_factory=list)  # [[name, type], ...]
    fmi_edge_schema: list = field(default_factory=list)
    vehicle: str = "car"
    picky: bool = True
    pbf_haversine: bool = False

    VALID_ALGOS = (
        "pagerank", "cc", "lpa", "triangles", "degrees", "sssp", "metrics",
        "scc", "build_order", "coreness", "harmonic", "closeness", "stats",
        "clustering", "louvain", "neighborhood", "betweenness", "truss",
        "hits", "salsa", "katz", "eigencentrality", "balancing",
    )
    balancing: dict = field(default_factory=dict)
    betweenness: dict = field(default_factory=dict)
    truss: dict = field(default_factory=lambda: {"k": 4})

    @classmethod
    def from_file(cls, path: str) -> "JobConfig":
        if path.endswith((".yaml", ".yml")):
            from . import miniyaml

            raw = miniyaml.load(path)
        else:
            with open(path) as f:
                raw = json.load(f)
        if not isinstance(raw, dict):
            raise ValueError(f"config root must be a mapping, got {type(raw).__name__}")
        if "parsing" in raw:  # reference blueprint dialect
            from .blueprint import lower_blueprint

            kwargs, warns = lower_blueprint(raw)
            # native keys in the same file (output, algorithms, ...) win —
            # a migrating user keeps parsing:/generating: and adds them.
            # Reference-dialect sections that lower_blueprint consumes are
            # NOT native overrides (a blueprint 'balancing:' is its binary's
            # config shape, not our JobConfig.balancing dict)
            _dialect = {"parsing", "balancing", "routing", "writing"}
            for k, v in raw.items():
                if k in cls.__dataclass_fields__ and k not in _dialect:
                    kwargs[k] = v
            kwargs["warnings"] = warns
            raw = kwargs
        unknown = set(raw) - set(cls.__dataclass_fields__)
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        cfg = cls(**raw)
        missing = [a for a in cfg.algorithms if a not in cls.VALID_ALGOS]
        if missing:
            raise ValueError(f"unknown algorithms: {missing} (valid: {cls.VALID_ALGOS})")
        if "sssp" in cfg.algorithms and not cfg.sssp.get("sources"):
            raise ValueError('algorithm "sssp" requires sssp.sources: [vertex keys]')
        if "balancing" in cfg.algorithms and not cfg.balancing.get("route_pairs"):
            raise ValueError(
                'algorithm "balancing" requires balancing.route_pairs (or a '
                "blueprint routing.route-pairs-file)"
            )
        return cfg


def run(cfg: JobConfig, resume: bool = False) -> dict:
    from .api import LinkGraph
    from .session import get_spark

    spark = get_spark(app_name="osmgraphing-spark-job", master=cfg.master)
    if cfg.map_format == "pbf":
        from .sources import pbf as _pbf

        g = _pbf.pbf_graph(
            spark, cfg.corpus, vehicle=cfg.vehicle, picky=cfg.picky,
            num_blocks=cfg.num_blocks, with_haversine=cfg.pbf_haversine,
            hours=False,  # hours derive from the config's calc spec below
        )
        lg = LinkGraph(g, cfg.checkpoint_root)
    elif cfg.map_format == "fmi":
        from .sources import fmi as _fmi

        g = _fmi.fmi_graph(
            spark, cfg.corpus,
            [tuple(t) for t in cfg.fmi_node_schema],
            [tuple(t) for t in cfg.fmi_edge_schema],
            num_blocks=cfg.num_blocks,
        )
        lg = LinkGraph(g, cfg.checkpoint_root)
    else:
        corpus = spark.read.parquet(cfg.corpus)
        ref = (
            spark.read.parquet(cfg.reference_hashes)
            if cfg.reference_hashes
            else None
        )
        lg = LinkGraph.from_corpus(
            spark, corpus, ref, num_blocks=cfg.num_blocks,
            checkpoint_root=cfg.checkpoint_root,
        )
    import sys
    from dataclasses import replace as _replace

    for w in cfg.warnings:
        print(f"config warning: {w}", file=sys.stderr)
    if cfg.metric_names:
        lg = _replace(lg, graph=lg.graph.with_metric_vector(cfg.metric_names))
    if cfg.generating:
        lg = lg.generate_metrics(cfg.generating)
    if cfg.normalize_metrics:
        from pyspark.sql import functions as F

        g = lg.graph.with_metric_vector()
        means = g.metric_means()  # one pass, k algebraic aggs
        arr = F.array(
            *[
                F.element_at(F.col("metrics"), i + 1) / F.lit(means[n])
                for i, n in enumerate(g.metric_names)
            ]
        )
        # withColumn is narrow: the resting hash(src) layout survives
        lg = _replace(lg, graph=_replace(g, edges=g.edges.withColumn("metrics", arr)))
    summary = {
        "vertices": lg.graph.num_vertices,
        "edges": lg.graph.num_edges,
        "outputs": {},
    }
    os.makedirs(cfg.output, exist_ok=True)
    for algo in cfg.algorithms:
        out_path = os.path.join(cfg.output, algo)
        if algo == "pagerank":
            df = lg.with_keys(lg.pagerank(resume=resume, **cfg.pagerank))
        elif algo == "cc":
            df = lg.with_keys(lg.connected_components(resume=resume))
        elif algo == "lpa":
            df = lg.with_keys(lg.label_propagation(resume=resume, **cfg.lpa))
        elif algo == "degrees":
            df = lg.with_keys(lg.degrees().withColumnRenamed("src", "vid"))
        elif algo == "triangles":
            n = lg.triangle_count()
            df = spark.createDataFrame([(n,)], "n_triangles bigint")
        elif algo == "balancing":
            from pyspark.sql import functions as F

            from .operators.balance import balance_loop
            from .sources.readers import read_route_pairs

            bcfg = dict(cfg.balancing)
            rp = read_route_pairs(spark, bcfg.pop("route_pairs"))
            # route-pairs carry EXTERNAL node ids → map through the vertex
            # table (inner joins: the reference's generator only emits
            # reachable in-graph pairs, so drops indicate a stale file)
            vk = lg.graph.vertices.select(
                F.col("key"), F.col("vid")
            )
            pairs = (
                rp.join(
                    vk.select(
                        F.col("key").alias("_sk"), F.col("vid").alias("src")
                    ),
                    F.col("src_id").cast("string") == F.col("_sk"),
                )
                .join(
                    vk.select(
                        F.col("key").alias("_dk"), F.col("vid").alias("dst")
                    ),
                    F.col("dst_id").cast("string") == F.col("_dk"),
                )
                .select("src", "dst", "count")
            )
            balanced, hist = balance_loop(
                lg.graph.edges.select(
                    "src", "dst", F.col("weight").alias("w")
                ),
                pairs,
                checkpoint=lg._ckpt("balancing"),
                resume=resume,
                **bcfg,
            )
            # map BOTH endpoints back to external keys — consumers of the
            # written edge table must be able to relate src AND dst to
            # the original node ids, not just src
            df = (
                balanced.select("src", "dst", F.col("w").alias("balanced_w"))
                .join(
                    vk.select(
                        F.col("vid").alias("src"), F.col("key").alias("src_key")
                    ),
                    "src",
                )
                .join(
                    vk.select(
                        F.col("vid").alias("dst"), F.col("key").alias("dst_key")
                    ),
                    "dst",
                )
                .select("src", "dst", "src_key", "dst_key", "balanced_w")
            )
            summary.setdefault("balancing_history", hist)
        elif algo == "sssp":
            opts = dict(cfg.sssp)
            opts["source_keys"] = opts.pop("sources")
            res = lg.sssp(resume=resume, **opts)
            df = res.join(lg.graph.vertices, "vid")
        elif algo == "scc":
            df = lg.with_keys(lg.scc())
        elif algo == "build_order":
            df = lg.build_order()
        elif algo == "coreness":
            df = lg.with_keys(lg.coreness())
        elif algo == "harmonic":
            df = lg.with_keys(lg.harmonic_centrality())
        elif algo == "closeness":
            df = lg.with_keys(lg.closeness_centrality())
        elif algo == "truss":
            df = lg.truss(**cfg.truss)
        elif algo == "hits":
            df = lg.with_keys(lg.hits())
        elif algo == "salsa":
            df = lg.with_keys(lg.salsa())
        elif algo == "katz":
            df = lg.with_keys(lg.katz())
        elif algo == "eigencentrality":
            df = lg.with_keys(lg.eigencentrality())
        elif algo == "stats":
            df = lg.graph_stats()
        elif algo == "clustering":
            df = lg.with_keys(lg.clustering_coefficients())
        elif algo == "louvain":
            df = lg.with_keys(lg.louvain())
        elif algo == "neighborhood":
            df = lg.neighborhood_function()
        elif algo == "betweenness":
            opts = dict(cfg.betweenness)
            keys = opts.pop("sources", None)
            if keys:
                verts = lg.graph.vertices
                opts["sources"] = [
                    r["vid"] for r in verts.where(verts["key"].isin(list(keys))).collect()
                ]
            df = lg.with_keys(lg.betweenness(**opts))
        elif algo == "metrics":
            from pyspark.sql import functions as F

            g = lg.graph.with_metric_vector()
            cols = [
                F.element_at(F.col("metrics"), i + 1).alias(n_)
                for i, n_ in enumerate(g.metric_names)
            ]
            df = g.edges.select("src", "dst", *cols)
        df.write.mode("overwrite").parquet(out_path)
        summary["outputs"][algo] = out_path
    with open(os.path.join(cfg.output, "summary.json"), "w") as f:
        json.dump(summary, f)
    return summary


def main() -> None:
    ap = argparse.ArgumentParser(prog="osmgraphing_spark")
    ap.add_argument("--config", required=True)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()
    summary = run(JobConfig.from_file(args.config), resume=args.resume)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
