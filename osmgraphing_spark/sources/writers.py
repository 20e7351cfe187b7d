"""Graph sinks.

The reference writes the finalized graph back out as (a) an FMI text file
with header counts + node rows + edge rows in config-declared column order
(/root/reference/src/io/writing/network/graph/fmi.rs:24-210), (b) edge CSVs
(/root/reference/src/io/writing/network/mod.rs:13-230), and (c) per-edge
external-value files (/root/reference/src/io/writing/network/edges.rs:63-123).

Spark-first equivalents: partitioned parquet (Iceberg in production) vertex
+ edge tables with pinned schemas and a counts manifest (the header), plus
a config-projected CSV export (column order honored, `_` placeholder for
ignored columns — mod.rs:72-216) and an external-values sink. Optional
denormalize-by-mean on write mirrors fmi.rs:105-121.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.build import Graph


def write_graph_tables(graph: Graph, base_dir: str, denormalize_by_mean: bool = False) -> None:
    edges = graph.edges.select("src", "dst", "weight", "out_deg", "out_wsum")
    if denormalize_by_mean:
        mean = edges.agg(F.avg("weight").alias("m"))
        edges = edges.crossJoin(F.broadcast(mean)).select(
            "src", "dst", (F.col("weight") * F.col("m")).alias("weight"),
            "out_deg", "out_wsum",
        )
    graph.vertices.select("vid", "key").write.mode("overwrite").parquet(
        f"{base_dir}/vertices"
    )
    edges.write.mode("overwrite").parquet(f"{base_dir}/edges")
    # the FMI header's role: pinned counts, written LAST as the manifest
    with open(os.path.join(base_dir, "manifest.json"), "w") as f:
        json.dump(
            {
                "num_vertices": graph.num_vertices,
                "num_edges": graph.num_edges,
                "num_blocks": graph.num_blocks,
            },
            f,
        )


def export_edges_csv(
    graph: Graph, path: str, columns: list[str], placeholder: str = "_"
) -> None:
    """Config-projected CSV export: emit exactly ``columns`` in order;
    unknown names become the placeholder column (the reference's 'ignored'
    writer columns, mod.rs:72-216)."""
    known = {"src", "dst", "weight", "out_deg", "out_wsum"}
    cols = [
        F.col(c).cast("string").alias(c) if c in known else F.lit(placeholder).alias(c)
        for c in columns
    ]
    graph.edges.select(*cols).write.mode("overwrite").option("header", "true").csv(path)


def write_external_values(values: DataFrame, path: str) -> None:
    """(edge or vertex id, value) CSV — the per-edge workloads sink (K3)."""
    values.write.mode("overwrite").option("header", "true").csv(path)
