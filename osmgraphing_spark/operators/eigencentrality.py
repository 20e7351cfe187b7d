"""Eigenvector centrality — L1-normalized power iteration on the link graph.

Beyond-reference centrality completing the link-analysis family
(PageRank/personalized PageRank: `pagerank.py`; HITS: `hits.py`; Katz:
`katz.py`): the principal eigenvector of the (weighted) adjacency,

    x_0      = 1/|V|
    x'(v)    = Σ_{u→v} w(u,v) · x_k(u)
    x_{k+1}  = x' / Σ_v x'(v)          (L1, not the textbook L2)

L1 normalization keeps every step a plain sum — bit-reproducible in an
unrolled SQL oracle (the `eigen_links` driver query) — and rescales, not
reorders, the fixpoint: the converged ranking equals the L2-normalized
principal eigenvector's. By default the graph is symmetrized (undirected
view), the setting where power iteration is well-posed for any connected
non-bipartite graph; the directed in-edge variant is available but can
legitimately decay to zero mass on DAG-like graphs (documented, guarded).

Scale design (the pagerank.py discipline):
- ONE resting hash(src) edge layout persisted up front; per superstep only
  the slim (vid, score) state shuffles to it, then one groupBy(dst) with an
  algebraic SUM (map-side combine caps hub fan-in).
- the L1 normalizer enters as an in-plan 1-row aggregate broadcast
  cross-joined back (the hits.py pattern) — a full iteration composes
  lazily into ONE action; no per-step driver round-trip except the optional
  convergence delta.
- per-stride reliable parquet truncation (EphemeralTruncator) +
  BlockScope release; loop-scoped persists drained every iteration.

Reference anchor: the reference computes per-vertex metrics on its parsed
graph via metric recomputation passes (/root/reference/src/network/graph/
building.rs finalize); this extends that per-vertex metric family with the
spectral centrality the Rust engine lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import EphemeralTruncator
from ..plans.superstep import BlockScope, iterative_conf
from .build import Graph

__all__ = ["run"]


def run(
    graph: Graph,
    max_iter: int = 8,
    tol: float = 0.0,
    weighted: bool = False,
    symmetrize: bool = True,
    truncate_every: int = 2,
) -> DataFrame:
    """→ (vid long, score double): eigenvector centrality after exactly
    ``max_iter`` L1-normalized power iterations (``tol > 0`` adds early
    stop on max|Δ| < tol; leave 0 for the value-checkable fixed mode).

    ``symmetrize=True`` (default) runs on the undirected view — the
    standard, always-well-posed setting. With ``symmetrize=False`` the
    in-edge directed variant is used; if total mass ever hits 0 (possible
    on DAGs, where no eigenvector exists) a ValueError is raised rather
    than dividing by zero.
    """
    if max_iter < 0:
        raise ValueError(f"max_iter must be >= 0, got {max_iter}")
    spark = graph.edges.sparkSession
    with iterative_conf(spark):
        return _run_loop(
            spark, graph, max_iter, tol, weighted, symmetrize,
            max(truncate_every, 1),
        )


def _run_loop(spark, graph, max_iter, tol, weighted, symmetrize, stride):
    wcol = F.col("weight") if weighted else F.lit(1.0)
    if symmetrize and weighted:
        # A + Aᵀ: if both directions exist their weights add (self-loops
        # dropped, matching Graph.symmetrized_edges' undirected view)
        fwd = graph.edges.select("src", "dst", F.col("weight").alias("w"))
        bwd = graph.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"),
            F.col("weight").alias("w"),
        )
        edges = (
            fwd.unionAll(bwd)
            .where(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
        )
    elif symmetrize:
        # A ∨ Aᵀ (the cc/triangles undirected view), unit weights
        edges = graph.symmetrized_edges().select("src", "dst", F.lit(1.0).alias("w"))
    else:
        edges = graph.edges.select("src", "dst", wcol.alias("w"))
    edges = (
        edges.repartition(graph.num_blocks, F.col("src"))
        .sortWithinPartitions("src", "dst")
        .persist()
    )
    n_e = edges.count()
    verts = (
        graph.vertices.select("vid")
        .repartition(graph.num_blocks, F.col("vid"))
        .sortWithinPartitions("vid")
        .persist()
    )
    n = verts.count()

    trunc = EphemeralTruncator(spark, "eigen")
    scope = BlockScope(spark)

    cached: list[DataFrame] = []

    def _pin(df: DataFrame) -> DataFrame:
        df = df.persist()
        cached.append(df)
        return df

    def _drain():
        for df in cached:
            df.unpersist()
        cached.clear()

    state = verts.select("vid", (F.lit(1.0) / F.lit(float(n))).alias("score"))

    from ..plans.superstep import sized_shuffle

    it = 0
    # gather/normalize shuffles carry vertex-sized state; run the loop at
    # adaptive width (edge count as the join-work proxy) so fixture-sized
    # graphs skip the full-width per-task fixed cost
    with sized_shuffle(spark, n_e):
        return _power_loop(
            spark, edges, verts, state, max_iter, tol, stride, trunc, scope,
            _pin, _drain,
        )


def _power_loop(
    spark, edges, verts, state, max_iter, tol, stride, trunc, scope, _pin, _drain
):
    it = 0
    while it < max_iter:
        raw = (
            edges.join(state.select(F.col("vid").alias("src"), "score"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("score") * F.col("w")).alias("s"))
            .withColumnRenamed("dst", "vid")
        )
        # raw is referenced by the normalizer's total AND its main branch;
        # pin so the gather shuffle's upstream work runs once (hits.py note)
        full = _pin(
            verts.join(raw, "vid", "left").select(
                "vid", F.coalesce("s", F.lit(0.0)).alias("score")
            )
        )
        total = full.agg(F.sum("score").alias("t"))
        new_state = full.crossJoin(F.broadcast(total)).select(
            "vid",
            F.when(F.col("t") > 0, F.col("score") / F.col("t"))
            .otherwise(F.lit(None))
            .alias("score"),
        )
        it += 1
        if it % stride == 0 or it == max_iter or tol > 0:
            # reap=False: the optional delta below still reads the previous
            # step's parquet (the hits.py deferred-reap pattern)
            new_state = trunc.truncate(new_state, reap=False)
            _drain()
            scope.release_new()
            dead = new_state.where(F.col("score").isNull()).limit(1).count()
            if dead:
                for df in (edges, verts):
                    df.unpersist()
                raise ValueError(
                    "eigencentrality: total mass reached 0 at iteration "
                    f"{it} (directed DAG-like graph has no principal "
                    "eigenvector; use symmetrize=True)"
                )
            if tol > 0:
                delta = float(
                    new_state.join(
                        state.select("vid", F.col("score").alias("o")), "vid"
                    )
                    .agg(F.max(F.abs(F.col("score") - F.col("o"))).alias("d"))
                    .collect()[0][0]
                    or 0.0
                )
            else:
                delta = float("inf")
            trunc.reap()
            state = new_state
            if tol > 0 and delta < tol:
                break
        else:
            state = new_state.localCheckpoint(eager=False)

    for df in (edges, verts):
        df.unpersist()
    return state
