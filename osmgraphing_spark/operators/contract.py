"""Graph contraction by a vertex → group mapping — the page→host rollup.

Web-scale link analysis rarely stays at page granularity: the standard
move is to contract the page graph to the HOST (or domain) graph and run
PageRank/SCC/reciprocity there; on a code link graph the same contraction
maps file → package and yields the module-dependency graph. The reference
has the inverse operation only (explode ways into edges,
/root/reference/src/network/graph/building.rs); contraction is its
many-to-one dual and the missing rollup step between the two
granularities this engine already serves (vertex-level operators and the
SCC condensation, which is contraction by the computed SCC label — this
operator generalizes it to ANY mapping: host, package, community label
from LPA/Louvain, k-means cell).

Scale shape: two equi-joins keyed on the edge endpoints (the resting
hash(src) layout serves the src side; a small mapping — hosts, packages,
nations — broadcasts automatically under the join threshold) + ONE
algebraic groupBy((g_src, g_dst)). The per-supernode fan-in (a 1M-page
host) is absorbed by map-side combine: partial (count, sum) per partition
per group pair, so no hot reduce key sees raw edges. Output is
|groups|²-bounded, usually tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def contract(
    edges: DataFrame,
    mapping: DataFrame,
    weight_col: str | None = None,
    drop_self_loops: bool = False,
) -> DataFrame:
    """Contract `edges` (src, dst[, weight_col]) by `mapping`
    (vid, group) → supergraph (src, dst, n_edges[, weight]) where `src`,
    `dst` are GROUP ids, `n_edges` counts contracted edges and `weight`
    sums `weight_col` over them (present only when `weight_col` is given).

    Edges with an unmapped endpoint are dropped (inner joins) — the same
    referenced-only discipline as vertex-id assignment (operators/build).
    Self-loops of the supergraph (intra-group edges) are kept by default:
    on a host graph they are the intra-site links, usually the majority
    class and a signal in their own right; `drop_self_loops=True` removes
    them for algorithms that want the strict inter-group graph.
    """
    m = mapping.select(
        F.col(mapping.columns[0]).alias("vid"),
        F.col(mapping.columns[1]).alias("group"),
    )
    cols = ["src", "dst"] + ([weight_col] if weight_col else [])
    e = (
        edges.select(*cols)
        .join(
            m.select(F.col("vid").alias("src"), F.col("group").alias("g_src")),
            "src",
        )
        .join(
            m.select(F.col("vid").alias("dst"), F.col("group").alias("g_dst")),
            "dst",
        )
    )
    if drop_self_loops:
        e = e.where(F.col("g_src") != F.col("g_dst"))
    aggs = [F.count("*").alias("n_edges")]
    if weight_col:
        aggs.append(F.round(F.sum(weight_col), 6).alias("weight"))
    return (
        e.groupBy(F.col("g_src").alias("src"), F.col("g_dst").alias("dst"))
        .agg(*aggs)
    )


def module_mapping(
    vertices: DataFrame,
    path_col: str = "key",
    depth: int = 1,
    sep: str = "/",
) -> DataFrame:
    """(vid, group) mapping for CODE graphs whose vertex key is a file
    path: group = the first `depth` path segments joined by `sep` (the
    package / top-level module). Pure column expressions — a map-only pass
    over the vertex table. Files shallower than `depth` map to their own
    full path (a file at repo root is its own module)."""
    parts = F.split(F.col(path_col), sep)
    prefix = F.slice(parts, 1, depth)
    return vertices.select(
        F.col(vertices.columns[0]).alias("vid"),
        F.array_join(prefix, sep).alias("group"),
    )
