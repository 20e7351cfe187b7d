"""Query-workload generation + per-edge workload aggregation.

Two reference capabilities re-expressed:

- **route-pair generator** (K6, /root/reference/src/io/writing/routing/
  random_or_all.rs:32-158): sample random (src, dst) vertex pairs, keep
  only pairs where dst is reachable from src, sort, cap. The reference
  runs a full Dijkstra per sampled pair *just to test reachability*; here
  reachability is one join against the connected-components labels the
  engine already computes — O(1) per pair instead of O(E log V).
  Sampling is hash-derived (seeded, parallelism-independent), mirroring
  the reference's seeded Pcg32 (defaults.rs:1).

- **per-edge workload aggregation** (A1, /root/reference/src/bin/
  osmgraphing/balancing/multithreading.rs:68-80): given traversal paths
  (arrays of edge ids), count uses per edge — explode + groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import SEED
from .build import Graph


def generate_route_pairs(
    graph: Graph,
    components: DataFrame,
    n_pairs: int,
    seed: int = SEED,
    max_count: int | None = None,
) -> DataFrame:
    """→ (src, dst) sampled uniformly over ordered vertex pairs, filtered to
    pairs in the same (undirected) component, sorted, capped."""
    n = graph.num_vertices
    idx = F.col("id")
    pairs = (
        graph.edges.sparkSession.range(0, n_pairs * 4)
        .select(
            (F.abs(F.xxhash64(idx, F.lit(seed))) % n).alias("src"),
            (F.abs(F.xxhash64(idx, F.lit(seed + 1))) % n).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    comp_s = components.select(F.col("vid").alias("src"), F.col("component").alias("c_s"))
    comp_d = components.select(F.col("vid").alias("dst"), F.col("component").alias("c_d"))
    reachable = (
        pairs.join(comp_s, "src")
        .join(comp_d, "dst")
        .where(F.col("c_s") == F.col("c_d"))
        .select("src", "dst")
        .orderBy("src", "dst")
    )
    return reachable.limit(max_count if max_count is not None else n_pairs)


def edge_workloads(paths: DataFrame, path_col: str = "edges") -> DataFrame:
    """paths (…, edges: array<long>) → (edge_id, workload): uses per edge
    across all paths (A1 — the core link-weight aggregation)."""
    return (
        paths.select(F.explode(F.col(path_col)).alias("edge_id"))
        .groupBy("edge_id")
        .agg(F.count("*").alias("workload"))
    )
