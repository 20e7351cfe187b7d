"""Strongly connected components — BSP trim + forward-min coloring +
backward mark (Orzan's coloring scheme, the standard Pregel-style SCC).

The reference's graph is stored directed (CSR fwd + CSC bwd,
/root/reference/src/network/graph/mod.rs) but its algorithms only use
undirected reachability; on a CODE link graph direction matters — an SCC
is an import cycle, and condensing SCCs yields the build-order DAG. This
closes that gap with the same superstep discipline as PageRank/CC/SSSP.

Per outer round over the ACTIVE subgraph:
1. **trim**: vertices with in-degree 0 or out-degree 0 (or isolated) are
   singleton SCCs — assign and remove (one peel layer per round).
2. **color**: forward-propagate min vertex id along edges to fixpoint:
   color(v) = min vid that reaches v within the active subgraph.
3. **mark**: from each root r (color(r) = r), propagate BACKWARD along
   intra-color edges to fixpoint; marked vertices form exactly SCC(r) —
   they reach r (the backward walk) and r reaches them (color(v) = r
   means r is v's minimum reacher, so r →* v).
4. assign scc = color for marked vertices, remove, repeat.

Every outer round removes all current roots' SCCs (the minimum active vid
is always a root), so the loop terminates; labels (min vid of the SCC)
are exactly deterministic.

Scale: all steps are joins + algebraic min/count aggregates (map-side
combine bounds hub fan-in). Lineage discipline: ONE EphemeralTruncator
per live frame (active vertices/edges, colors, marked, frontier, done) —
each truncate() eagerly writes the new step before deleting the old, and
no other frame ever reads another truncator's superseded step, so every
frame is always backed by an on-disk parquet file (recoverable after any
block/executor loss; the hazard ADVICE r1 flagged for shared lazy
truncation cannot occur). Known cliff (documented, inherent to BSP SCC):
a depth-D DAG chain needs O(D) trim/color rounds — the diameter bound
every Pregel SCC shares; web-scale link graphs are small-diameter so
rounds stay modest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.checkpoint import EphemeralTruncator
from ..plans.superstep import BlockScope, iterative_conf
from .build import Graph


def run(graph: Graph, max_outer: int = 50, max_inner: int = 200) -> DataFrame:
    """→ (vid long, scc long), scc = min vid of the strongly connected
    component. Raises RuntimeError if not converged in `max_outer` outer
    rounds (exactness over silent truncation)."""
    spark = graph.edges.sparkSession
    edges = (
        graph.edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    )
    with iterative_conf(spark):
        return _scc(edges, graph.vertices.select("vid"), spark, max_outer, max_inner)


def run_edges(
    edges: DataFrame, max_outer: int = 50, max_inner: int = 200
) -> DataFrame:
    """Same over a plain directed (src, dst) frame → (id long, scc long);
    the vertex set is the ids appearing in the edges."""
    spark = edges.sparkSession
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    # vertex set from the RAW edges: a vertex appearing only in self-loops
    # still exists (as a singleton SCC) even though its edges are dropped
    verts = (
        edges.select(F.col("src").alias("vid"))
        .unionAll(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )
    with iterative_conf(spark):
        out = _scc(e, verts, spark, max_outer, max_inner)
    return out.select(F.col("vid").alias("id"), "scc")


def _edges_between(edges: DataFrame, vset: DataFrame) -> DataFrame:
    """Edges with BOTH endpoints in vset (two semi-joins)."""
    return (
        edges.join(vset.select(F.col("vid").alias("src")), "src", "left_semi")
        .join(vset.select(F.col("vid").alias("dst")), "dst", "left_semi")
        .select("src", "dst")
    )


def _scc(
    edges: DataFrame,
    vertices: DataFrame,
    spark: SparkSession,
    max_outer: int,
    max_inner: int,
) -> DataFrame:
    scope = BlockScope(spark)
    t_e = EphemeralTruncator(spark, "scc-edges")
    t_v = EphemeralTruncator(spark, "scc-verts")
    t_c = EphemeralTruncator(spark, "scc-colors")
    t_m = EphemeralTruncator(spark, "scc-marked")
    t_f = EphemeralTruncator(spark, "scc-frontier")
    t_i = EphemeralTruncator(spark, "scc-intra")
    t_d = EphemeralTruncator(spark, "scc-done")

    active_e = t_e.truncate(edges)
    active_v = t_v.truncate(vertices.select("vid"))
    done = spark.createDataFrame([], "vid long, scc long")

    for _outer in range(max_outer):
        if active_v.limit(1).count() == 0:
            scope.release_new()
            return done

        # -- 1. trim one layer: in-deg 0 OR out-deg 0 (or isolated)
        outd = active_e.groupBy("src").agg(F.count("*").alias("od"))
        ind = active_e.groupBy("dst").agg(F.count("*").alias("idg"))
        both = active_v.join(
            outd.withColumnRenamed("src", "vid"), "vid", "left"
        ).join(ind.withColumnRenamed("dst", "vid"), "vid", "left")
        done = t_d.truncate(
            done.unionByName(
                both.where(F.col("od").isNull() | F.col("idg").isNull()).select(
                    "vid", F.col("vid").alias("scc")
                )
            )
        )
        active_v = t_v.truncate(
            both.where(F.col("od").isNotNull() & F.col("idg").isNotNull()).select("vid")
        )
        active_e = t_e.truncate(_edges_between(active_e, active_v))

        if active_v.limit(1).count() == 0:
            scope.release_new()
            return done
        if active_e.limit(1).count() == 0:
            done = t_d.truncate(
                done.unionByName(active_v.select("vid", F.col("vid").alias("scc")))
            )
            scope.release_new()
            return done

        # -- 2. forward-min coloring to fixpoint
        colors = t_c.truncate(active_v.select("vid", F.col("vid").alias("color")))
        for _i in range(max_inner):
            msgs = active_e.join(
                colors.select(F.col("vid").alias("src"), "color"), "src"
            ).select(F.col("dst").alias("vid"), "color")
            # reap deferred: `changed` still reads the previous colors step
            new_colors = t_c.truncate(
                colors.unionByName(msgs).groupBy("vid").agg(F.min("color").alias("color")),
                reap=False,
            )
            changed = (
                new_colors.join(colors.withColumnRenamed("color", "old"), "vid")
                .where(F.col("color") < F.col("old"))
                .limit(1)
                .count()
            )
            t_c.reap()
            colors = new_colors
            if changed == 0:
                break
        else:
            raise RuntimeError(f"SCC coloring did not converge in {max_inner} rounds")

        # -- 3. backward mark within color classes, starting at the roots
        intra = t_i.truncate(
            active_e.join(
                colors.select(F.col("vid").alias("src"), F.col("color").alias("c_src")),
                "src",
            )
            .join(
                colors.select(F.col("vid").alias("dst"), F.col("color").alias("c_dst")),
                "dst",
            )
            .where(F.col("c_src") == F.col("c_dst"))
            .select("src", "dst")
        )
        marked = t_m.truncate(
            colors.where(F.col("vid") == F.col("color")).select("vid", "color")
        )
        frontier = marked
        for _i in range(max_inner):
            preds = (
                intra.join(frontier.select(F.col("vid").alias("dst"), "color"), "dst")
                .select(F.col("src").alias("vid"), "color")
                .distinct()
            )
            frontier = t_f.truncate(
                preds.join(marked.select("vid"), "vid", "left_anti")
            )
            if frontier.limit(1).count() == 0:
                break
            marked = t_m.truncate(marked.unionByName(frontier))
        else:
            raise RuntimeError(f"SCC marking did not converge in {max_inner} rounds")

        # -- 4. assign SCC = color for marked vertices, remove, repeat
        done = t_d.truncate(
            done.unionByName(marked.select("vid", F.col("color").alias("scc")))
        )
        active_v = t_v.truncate(active_v.join(marked.select("vid"), "vid", "left_anti"))
        active_e = t_e.truncate(_edges_between(active_e, active_v))
        scope.release_new()

    raise RuntimeError(f"SCC did not converge in {max_outer} outer rounds")
