"""Convex-hull route explorator over multi-metric graphs (G4 + F9).

The reference enumerates the Pareto-spread alternative routes between two
vertices: seed with one best route per unit metric weighting, then for each
facet of found routes solve the k x k "equalizing alpha" system and re-run
the routing query under that alpha until no new route appears
(/root/reference/src/routing/explorating.rs:140-366; the LU solve is
helpers/algebra.rs:19-73). The output is the set of routes optimal for SOME
convex metric weighting — the lower convex hull of the per-route metric-cost
vectors.

Spark-first shape: the reference runs one *bidirectional Dijkstra* per
facet; here each candidate alpha prices every edge as ``dot(alpha,
metrics)`` (a column expression — no data movement) and runs the existing
BSP shortest-path operator (operators/sssp.py) on the re-priced graph. The
alpha/facet bookkeeping is a handful of k-vectors and stays on the driver in
BOTH engines; every routing query is fully distributed. Batching note: all
sources of a query batch share one BSP run (sssp.run is multi-source);
facet alphas are explored sequentially like the reference's facet queue.
"""

from __future__ import annotations

import itertools

import numpy as np

from ..functions.algebra import SingularSystemError, equalizing_alpha
from . import sssp
from .build import Graph

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def alpha_weighted(graph: Graph, alpha) -> Graph:
    """Re-price every edge with ``weight = dot(alpha, metrics)`` — pure
    column arithmetic over the resting edge layout (zero shuffle, the
    repricing the reference does once per explorator facet)."""
    if not graph.metric_names:
        raise ValueError("alpha_weighted needs a multi-metric graph")
    if len(alpha) != len(graph.metric_names):
        raise ValueError(
            f"alpha width {len(alpha)} != metric width {len(graph.metric_names)}"
        )
    w = None
    for i, a in enumerate(alpha):
        term = F.element_at(F.col("metrics"), i + 1) * F.lit(float(a))
        w = term if w is None else w + term
    return Graph(
        vertices=graph.vertices,
        edges=graph.edges.withColumn("weight", w),
        num_vertices=graph.num_vertices,
        num_edges=graph.num_edges,
        num_blocks=graph.num_blocks,
        metric_names=graph.metric_names,
    )


def path_metric_costs(graph: Graph, routes: DataFrame) -> DataFrame:
    """(src, dst, nodes) routes → + ``costs array<double>``: the per-metric
    total along each route. One explode over consecutive node pairs + one
    equi-join against the (unique after build-dedup) edge table + one
    groupBy — O(total path length) rows, never O(|E|)."""
    k = len(graph.metric_names or [])
    if not k:
        raise ValueError("path_metric_costs needs a multi-metric graph")
    hops = routes.select(
        "src", "dst", "nodes",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("nodes"), 1, F.greatest(F.size("nodes") - 1, F.lit(0))).alias("u"),
                F.slice(F.col("nodes"), 2, F.greatest(F.size("nodes") - 1, F.lit(0))).alias("v"),
            )
        ).alias("hop"),
    ).select(
        "src", "dst", "nodes",
        F.col("hop.u").alias("u"), F.col("hop.v").alias("v"),
    )
    e = graph.edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v"), "metrics"
    )
    per_metric = [
        F.sum(F.element_at(F.col("metrics"), i + 1)).alias(f"_m{i}")
        for i in range(k)
    ]
    agg = (
        hops.join(e, ["u", "v"], "inner")
        .groupBy("src", "dst", "nodes")
        .agg(*per_metric)
    )
    return agg.select(
        "src", "dst", "nodes",
        F.array(*[F.col(f"_m{i}") for i in range(k)]).alias("costs"),
    )


def _best_route(graph: Graph, pairs: DataFrame, alpha) -> list[dict]:
    """One routing query under one alpha: reprice → BSP shortest path →
    path flatten → per-metric cost fold. → [{src, dst, nodes, costs}]."""
    ga = alpha_weighted(graph, alpha)
    routes = sssp.shortest_paths(ga, pairs, weighted=True)
    costed = path_metric_costs(graph, routes.select("src", "dst", "nodes"))
    return [
        {
            "src": r["src"], "dst": r["dst"],
            "nodes": tuple(r["nodes"]), "costs": np.array(r["costs"]),
        }
        for r in costed.collect()
    ]


def explore_pareto_routes(
    graph: Graph,
    pairs: DataFrame,
    max_routes: int = 16,
    tol: float = 1e-6,
) -> DataFrame:
    """(src, dst) pairs → (src, dst, nodes array<long>, costs array<double>,
    alpha array<double>): every route optimal for some convex metric
    weighting, tagged with one alpha that finds it (unit alphas for the
    seeds, facet alphas thereafter). Pairs without any path are absent —
    same contract as sssp.route_costs.

    Algorithm = the reference's explorator (explorating.rs:140-366): seed
    one route per unit alpha, then repeatedly pop a k-facet of found routes,
    solve its equalizing alpha (F9), and re-query; a strictly cheaper route
    under that alpha is a new hull vertex and spawns k sub-facets.
    ``max_routes`` bounds the hull walk per pair (the reference bounds by
    tolerance only; a cap is safer on adversarial metric spreads)."""
    spark = graph.edges.sparkSession
    k = len(graph.metric_names or [])
    if k < 2:
        raise ValueError("explorator needs >= 2 metrics")

    found: dict[tuple, dict[tuple, np.ndarray]] = {}
    alpha_of: dict[tuple, dict[tuple, np.ndarray]] = {}

    def add(route, alpha) -> bool:
        key = (route["src"], route["dst"])
        per = found.setdefault(key, {})
        if route["nodes"] in per:
            return False
        per[route["nodes"]] = route["costs"]
        alpha_of.setdefault(key, {})[route["nodes"]] = np.asarray(alpha, float)
        return True

    # seed: one best route per unit metric
    for i in range(k):
        alpha = np.eye(k)[i]
        for route in _best_route(graph, pairs, alpha):
            add(route, alpha)

    # facet queue per pair (driver-side: |found| is small by construction)
    for key, per in found.items():
        facets = [c for c in itertools.combinations(sorted(per), k) if len(per) >= k]
        seen_facets = set(facets)
        while facets and len(per) < max_routes:
            facet = facets.pop()
            try:
                alpha = equalizing_alpha([per[n] for n in facet])
            except SingularSystemError:
                continue
            if (alpha < -tol).any():
                continue
            alpha = np.clip(alpha, 0.0, None)
            alpha = alpha / alpha.sum()
            facet_value = float(alpha @ per[facet[0]])
            one_pair = spark.createDataFrame(
                [(key[0], key[1])], "src long, dst long"
            )
            for route in _best_route(graph, one_pair, alpha):
                if float(alpha @ route["costs"]) < facet_value - tol and add(route, alpha):
                    for drop in facet:
                        sub = tuple(sorted(set(facet) - {drop} | {route["nodes"]}))
                        if sub not in seen_facets and len(sub) == k:
                            seen_facets.add(sub)
                            facets.append(sub)

    rows = [
        (
            key[0], key[1], list(nodes),
            [float(x) for x in per[nodes]],
            [float(x) for x in alpha_of[key][nodes]],
        )
        for key, per in found.items()
        for nodes in sorted(per)
    ]
    return spark.createDataFrame(
        rows,
        "src long, dst long, nodes array<long>, "
        "costs array<double>, alpha array<double>",
    )
