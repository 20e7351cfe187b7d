"""Connected components — alternating small-star / large-star.

Fills the role of the reference's whole-graph reachability knowledge (its
route-pair generator runs Dijkstra per sampled pair purely to test "is dst
reachable", /root/reference/src/io/writing/routing/random_or_all.rs:32-158);
here reachability structure is computed once for all vertices, BSP-style.

Algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14), alternating two rounds until the edge set is stable:

    large-star(E): for each u over its full (symmetric) neighborhood N(u):
                   m = min(N(u) ∪ {u}); emit (v → m) for every v ∈ N(u), v > u
    small-star(E): E is now all high→low; per u with out-neighbors V(u):
                   m = min(V(u)); emit (v → m) for v ∈ V(u)∖{m}, plus (u → m)

Each half-round is one groupBy + one join of built-in ops (whole-stage
codegen, map-side partial min). Converges in O(log² n) rounds. At the
fixpoint every non-root points at its component's minimum vid — labels are
exactly deterministic (north rule: "component assignments exactly"), no
hash-order dependence.

Scale: the symmetric-neighborhood groupBy is the skew point (hub vertices);
`min` is algebraic so map-side combine bounds reducer fan-in the same way
salting would — no row for a hub reaches one reducer un-combined.
Per-round state checkpoints via plans.checkpoint (resumable).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import CheckpointManager, EphemeralTruncator, SuperstepMetrics
from ..plans.superstep import BlockScope
from .build import Graph


def _symmetric(edges: DataFrame) -> DataFrame:
    return edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    nbr = _symmetric(edges)
    mins = (
        nbr.unionAll(nbr.select(F.col("src"), F.col("src").alias("dst")))
        .groupBy("src")
        .agg(F.min("dst").alias("mn"))
    )
    return (
        nbr.join(mins, "src", "inner")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    # precondition: every edge points high → low (large-star output)
    mins = edges.groupBy("src").agg(F.min("dst").alias("mn"))
    linked = (
        edges.join(mins, "src", "inner")
        .where(F.col("dst") != F.col("mn"))
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
    )
    self_link = mins.select(F.col("src"), F.col("mn").alias("dst"))
    return (
        linked.unionAll(self_link)
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def run(
    graph: Graph,
    max_iter: int = 50,
    checkpoint: CheckpointManager | None = None,
    resume: bool = False,
) -> DataFrame:
    """→ (vid long, component long), component = min vid of the (undirected)
    connected component."""
    from ..plans.superstep import iterative_conf

    with iterative_conf(graph.edges.sparkSession):
        return _run_loop(graph, max_iter, checkpoint, resume)


def components_of_pairs(
    pairs: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """CC labels over an arbitrary pair table (no `Graph` needed) →
    (id, component), component = min id of the component. Only ids that
    appear in `pairs` are returned — callers union in isolated ids.

    This is the dedup endgame's clustering step (near-dup PAIRS → dup
    CLUSTERS): the pair graph from MinHash-LSH is itself power-law (a
    boilerplate document matches thousands of near-copies), so the same
    star-contraction scale properties apply — algebraic `min` map-side
    combine bounds hub fan-in, per-round state is materialized reliably.
    """
    edges = (
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    spark = pairs.sparkSession
    from ..plans.superstep import iterative_conf

    # The pair table is typically the output of an expensive upstream plan
    # (LSH bucket join, SemDeDup, snapshot diff): reliably truncate it ONCE
    # so the signature probe, round 0, and the member scan below all read
    # parquet instead of re-running the candidate generator.
    trunc_in = EphemeralTruncator(spark, "ccpairs-in")
    edges = trunc_in.truncate(edges)
    with iterative_conf(spark):
        final = _contract(edges, spark, max_iter, None, False, "ccpairs")
    parent = final.groupBy("src").agg(F.min("dst").alias("component"))
    labels = parent.select(F.col("src").alias("id"), "component")
    members = edges.select(F.col("src").alias("id")).unionAll(
        edges.select(F.col("dst").alias("id"))
    ).distinct()
    roots = (
        members.join(labels.select("id"), "id", "left_anti")
        .select("id", F.col("id").alias("component"))
    )
    return labels.unionAll(roots)


def components_incremental(
    pairs: DataFrame,
    prior_labels: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Warm-started CC (the counterpart of PageRank's ``init_ranks`` warm
    start, fed by the same ``snapshot.edge_diff`` audit): → (id, component)
    over today's ``pairs`` given yesterday's ``prior_labels`` (id,
    component).

    SOUNDNESS PRECONDITION — the edge set only GREW: each prior label is
    injected as a (id → component) seed edge, which pre-merges yesterday's
    components in round zero, so the star-contraction rounds track the
    DELTA's structure instead of re-deriving every old component from its
    raw edges. Merging is monotone (labels = min vid), so added edges are
    exact; a REMOVED edge can split a component, which a seed edge would
    silently bridge — when ``snapshot.edge_diff`` reports any `removed`
    rows, recompute from scratch with :func:`components_of_pairs` instead
    (the same recompute-on-shrink contract as the reference's full
    re-parse on graph change).

    Labels stay canonical: a prior component id IS the min vid of its old
    member set, so min-vid over (new edges ∪ seed edges) equals min-vid
    over the grown graph exactly — incremental output is bit-identical to
    the full recompute, only cheaper."""
    seeds = (
        prior_labels.select(
            F.col(prior_labels.columns[0]).alias(src_col),
            F.col(prior_labels.columns[1]).alias(dst_col),
        )
        .where(F.col(src_col) != F.col(dst_col))
    )
    new_pairs = pairs.select(
        F.col(src_col).alias(src_col), F.col(dst_col).alias(dst_col)
    )
    return components_of_pairs(
        new_pairs.unionByName(seeds), src_col, dst_col, max_iter
    )


def _run_loop(graph, max_iter, checkpoint, resume):
    # symmetrized_edges() is already self-loop-free and distinct — one scan
    edges = graph.symmetrized_edges()
    spark = graph.edges.sparkSession
    final = _contract(edges, spark, max_iter, checkpoint, resume, "cc")

    parent = final.groupBy("src").agg(F.min("dst").alias("component"))
    labels = parent.select(F.col("src").alias("vid"), "component")
    roots_and_isolated = (
        graph.vertices.select("vid")
        .join(labels.select("vid"), "vid", "left_anti")
        .select("vid", F.col("vid").alias("component"))
    )
    return labels.unionAll(roots_and_isolated)


def _contract(edges, spark, max_iter, checkpoint, resume, tag):
    """Alternate large-star/small-star until the edge set is stable; returns
    the converged high→low edge set (every non-root → its component min).

    Runs at adaptive shuffle width (`plans.superstep.sized_shuffle`): the
    per-round state IS the edge set, so a fixture-sized pair graph runs its
    ~log² n rounds at width 1 (per-task fixed cost dominates there) while
    big graphs keep the session's full width."""
    from ..plans.superstep import sized_shuffle

    scope = BlockScope(spark)
    trunc = EphemeralTruncator(spark, tag) if checkpoint is None else None

    start = 0
    if checkpoint is not None and resume:
        latest = checkpoint.latest()
        if latest is not None:
            edges = checkpoint.read(latest)
            start = latest + 1

    n_e = edges.limit(8_000_000).count()
    with sized_shuffle(spark, n_e):
        return _contract_rounds(
            edges, spark, max_iter, checkpoint, start, trunc, scope
        )


def _contract_rounds(edges, spark, max_iter, checkpoint, start, trunc, scope):

    def _signature(df: DataFrame) -> tuple[int, int]:
        """(row count, order-free content hash) — ONE cheap aggregate
        instead of two exceptAll scans per round. Wrap-around sum of
        per-row xxhash64 is order/partitioning independent; a collision
        on non-adversarial data is ~2^-64 per round."""
        r = df.agg(
            F.count("*").alias("n"),
            # decimal(38,0) accumulator: immune to ANSI long-overflow up to
            # ~1e19 rows while staying order/partitioning independent
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return int(r["n"]), int(r["h"] or 0)

    sig = _signature(edges)
    for it in range(start, max_iter):
        t0 = time.time()
        new_edges = _small_star(_large_star(edges))
        if checkpoint is not None:
            new_edges = checkpoint.write(
                it,
                new_edges,
                SuperstepMetrics(
                    step=it,
                    delta=-1.0,
                    rows=-1,
                    wall_ms=(time.time() - t0) * 1000,
                ),
            )
        else:
            # reliable per-round truncation (a round's output is the whole
            # state — the MapReduce formulation materializes it anyway);
            # then release every block the round pinned in executor storage
            new_edges = trunc.truncate(new_edges)
            scope.release_new()
        new_sig = _signature(new_edges)
        changed = new_sig != sig
        if checkpoint is not None:
            checkpoint.amend_metrics(
                it,
                SuperstepMetrics(
                    step=it,
                    delta=float(changed),
                    rows=new_sig[0],
                    wall_ms=(time.time() - t0) * 1000,
                ),
            )
        edges, sig = new_edges, new_sig
        if not changed:
            break

    return edges
