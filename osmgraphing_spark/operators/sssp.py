"""Single/multi-source shortest paths — BSP Bellman-Ford with a delta
frontier.

Closes the reference's point-to-point cost capability (its flagship:
bidirectional Dijkstra, /root/reference/src/routing/dijkstra.rs:144-342, and
the route-pair generator that keeps only pairs with a real path + cost,
/root/reference/src/io/writing/routing/random_or_all.rs:32-158). A priority
queue is the wrong shape for BSP; the Spark-native equivalent is iterative
edge relaxation:

    dist'(s, v) = min(dist(s, v), min over in-edges (u→v): dist(s, u) + w)

run for every source s SIMULTANEOUSLY (state keyed (source, vid)) until no
distance improves. Positive weights (the build clamps metrics ≥ 1e-6,
building.rs:69-88) guarantee convergence in ≤ V-1 rounds; real graphs
converge in ~diameter rounds.

Scale design:
- **delta frontier**: only rows whose distance improved last round relax
  again — per-round join size tracks the BFS wavefront, not |state|. The
  edge side rests in its build-time hash(src) layout (zero re-shuffle).
- multi-source batches the reference's per-pair Dijkstra loop into ONE BSP
  run over however many sources were sampled — the per-query cost
  amortizes across the batch exactly like its query workloads (G5).
- per-round state goes through reliable parquet truncation + BlockScope
  release (same lineage discipline as PageRank/CC/LPA).

Correctness pin: the bidirectional-bait fixture — the cheap path rr→ll is
the 3-hop top route (cost 9), not the 2-hop bottom one (cost 10)
(/root/reference/resources/bidirectional_bait/graph.fmi:16-31, asserted in
/root/reference/tests/bidirectional_bait/routing/fastest.rs) — tested in
tests/test_sssp.py, plus a DuckDB chained-relaxation oracle in the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import CheckpointManager, EphemeralTruncator, SuperstepMetrics
from ..plans.superstep import BlockScope, iterative_conf
from .build import Graph


# sources=None ("exact" centrality) collects every vertex id to the driver
# and runs |V| simultaneous frontiers — O(|V|²) frontier state. That is a
# deliberate small-graph convenience, so it refuses to run past this cap
# rather than detonate on a production graph (pass an explicit landmark
# sample instead — see harmonic_centrality's docstring).
EXACT_SOURCE_CAP = 4096


def _exact_sources(graph: Graph, cap: int, op: str) -> list[int]:
    n = graph.vertices.count()
    if n > cap:
        raise ValueError(
            f"{op}(sources=None) is the EXACT mode: it materializes all "
            f"{n} vertex ids on the driver and runs {n} simultaneous BSP "
            f"frontiers (O(V^2) state), which exceeds the safety cap of "
            f"{cap}. Pass an explicit landmark sample, e.g. "
            f"sources=[r['vid'] for r in sampling.sample_rows(graph.vertices, "
            f"k).collect()], or raise max_exact_sources if you really "
            f"mean it."
        )
    return [r["vid"] for r in graph.vertices.select("vid").collect()]


def run(
    graph: Graph,
    sources: list[int],
    weighted: bool = True,
    max_iter: int = 100,
    checkpoint: CheckpointManager | None = None,
    resume: bool = False,
    track_paths: bool = False,
    truncate_every: int = 4,
    local_cap: int | None = None,
) -> DataFrame:
    """→ (source long, vid long, dist double[, pred long]): shortest-path
    cost from each source to every REACHABLE vertex (unreachable pairs are
    absent, like the reference's generator dropping path-less pairs).

    ``track_paths`` adds a predecessor column (pred = -1 on the source row;
    ties broken by min pred, deterministically) — the shortest-path TREE,
    from which ``shortest_paths`` reconstructs node sequences (the
    reference's path flatten, G3).

    ``truncate_every``: rounds between reliable parquet truncations when no
    checkpoint manager is supplied (same stride discipline as PageRank:
    within a stride the per-round frontier count already materializes a
    lazy ``localCheckpoint`` of both loop frames, cutting lineage at the
    RDD level; the parquet roundtrip — two writes + reads per boundary —
    only pays once per stride instead of every round)."""
    # Single-task fast path (operators/localgraph): below the caps, one
    # executor-side multi-source Dijkstra replaces ~diameter BSP rounds of
    # fixed job cost with IDENTICAL output (min-float dist, min-pred
    # ties). Guards: no checkpoint/resume contract to honor, nonnegative
    # weights (Dijkstra's requirement; the BSP loop is Bellman-Ford and
    # keeps covering negative metrics), and |sources|·|E| work bound.
    if checkpoint is None and not resume:
        from ..plans.checkpoint import EphemeralTruncator as _ET
        from . import localgraph

        spark = graph.edges.sparkSession
        v_cap = localgraph.LOCAL_VERTEX_CAP if local_cap is None else local_cap
        if v_cap > 0 and graph.vertices.limit(v_cap + 1).count() <= v_cap:
            w_col = F.col("weight") if weighted else F.lit(1.0)
            e = graph.edges.select("src", "dst", w_col.alias("w"))
            probe = e.agg(
                F.count("*").alias("n"), F.min("w").alias("mn")
            ).collect()[0]
            work = int(probe["n"]) * max(1, len(sources))
            if (
                int(probe["n"]) <= localgraph.LOCAL_EDGE_CAP
                and work <= localgraph.LOCAL_WORK_CAP
                and (probe["mn"] is None or float(probe["mn"]) >= 0.0)
            ):
                return _ET(spark, "sssp-local").truncate(
                    localgraph.local_sssp(e, sources, with_pred=track_paths)
                )
    with iterative_conf(graph.edges.sparkSession):
        return _run_loop(
            graph, sources, weighted, max_iter, checkpoint, resume,
            track_paths, max(truncate_every, 1),
        )


def _run_loop(graph, sources, weighted, max_iter, checkpoint, resume,
              track_paths, truncate_every):
    spark = graph.edges.sparkSession
    w_col = F.col("weight") if weighted else F.lit(1.0)
    edges = graph.edges.select(
        F.col("src").alias("vid"), F.col("dst").alias("to"), w_col.alias("w")
    )

    scope = BlockScope(spark)
    trunc_state = EphemeralTruncator(spark, "sssp-state")
    trunc_front = EphemeralTruncator(spark, "sssp-frontier")

    # adaptive loop width + batched probes (the scc._scc discipline): the
    # per-round joins are bounded by |E|·|sources| wavefront work; width 1
    # ⇒ fixture-sized, so convergence probes move to stride boundaries —
    # exact, because a relaxation round over an EMPTY frontier is empty
    # again (the wasted post-fixpoint rounds are no-op jobs). Checkpointed
    # runs keep per-round probes (metrics want the per-step frontier size).
    from ..plans.superstep import sized_shuffle

    n_e = graph.edges.limit(8_000_000).count() * max(1, len(sources))
    with sized_shuffle(spark, n_e) as p_state:
        probe_every = (
            max(truncate_every, 1)
            if p_state == 1 and checkpoint is None
            else 1
        )
        return _relax_rounds(
            spark, graph, edges, sources, max_iter, checkpoint, resume,
            track_paths, truncate_every, scope, trunc_state, trunc_front,
            probe_every,
        )


def _relax_rounds(spark, graph, edges, sources, max_iter, checkpoint, resume,
                  track_paths, truncate_every, scope, trunc_state, trunc_front,
                  probe_every):

    state = spark.createDataFrame(
        [(int(s), int(s), 0.0, -1) for s in sources],
        "source long, vid long, dist double, pred long",
    )
    frontier = state
    start = 0
    if checkpoint is not None and resume:
        latest = checkpoint.latest()
        if latest is not None:
            state = checkpoint.read(latest)
            frontier = state  # conservative re-frontier: one extra no-op round
            start = latest + 1

    # min over (dist, pred) structs: dist decides, pred is the deterministic
    # tie-break; every (dist, pred) pair comes from one actual relaxation,
    # so the winning pred is always a valid shortest-path-tree parent
    def _min_merge(df):
        return (
            df.groupBy("source", "vid")
            .agg(F.min(F.struct("dist", "pred")).alias("m"))
            .select("source", "vid", F.col("m.dist").alias("dist"),
                    F.col("m.pred").alias("pred"))
        )

    import time

    boundary = True  # loop may not execute at all
    for it in range(start, max_iter):
        t0 = time.time()
        relaxed = _min_merge(
            frontier.join(edges, "vid").select(
                "source",
                F.col("to").alias("vid"),
                (F.col("dist") + F.col("w")).alias("dist"),
                F.col("vid").alias("pred"),
            )
        )
        merged = _min_merge(state.unionByName(relaxed))
        new_frontier = (
            merged.join(
                state.select("source", "vid", F.col("dist").alias("old")),
                ["source", "vid"],
                "left",
            )
            .where(F.col("old").isNull() | (F.col("dist") < F.col("old")))
            .select("source", "vid", "dist", "pred")
        )
        # Stride boundary (or user-requested checkpointing): the frames go
        # through RELIABLE truncation. Both loop frames are written BEFORE
        # either's previous step is reaped: new_frontier's plan scans the
        # previous state step and merged's plan scans the previous frontier
        # step, so an eager delete inside the first truncate would yank
        # files from under the second. Mid-stride rounds only cut lineage
        # with a lazy localCheckpoint — materialized by this round's
        # frontier count (new_frontier's plan contains merged), so plan
        # size stays O(1) while the parquet roundtrip amortizes over the
        # stride; executor storage is released at the boundary, after the
        # state is safely on disk.
        boundary = checkpoint is not None or (it - start + 1) % truncate_every == 0
        if boundary:
            new_frontier = trunc_front.truncate(new_frontier, reap=False)
        else:
            new_frontier = new_frontier.localCheckpoint(eager=False)
        if checkpoint is not None:
            merged = checkpoint.write(
                it,
                merged,
                SuperstepMetrics(
                    step=it, delta=-1.0, rows=-1, wall_ms=(time.time() - t0) * 1000
                ),
            )
        elif boundary:
            merged = trunc_state.truncate(merged, reap=False)
        else:
            merged = merged.localCheckpoint(eager=False)
        trunc_front.reap()
        trunc_state.reap()
        n_front = (
            -1
            if (it - start + 1) % probe_every
            else new_frontier.limit(1).count()
        )
        if boundary:
            scope.release_new()
        if checkpoint is not None:
            checkpoint.amend_metrics(
                it,
                SuperstepMetrics(
                    step=it,
                    delta=float(n_front),
                    rows=-1,
                    wall_ms=(time.time() - t0) * 1000,
                ),
            )
        state, frontier = merged, new_frontier
        if n_front == 0:
            break
    if not boundary:
        # loop ended mid-stride (frontier emptied): the state is still only
        # localCheckpoint-backed — give the caller a reliably truncated
        # frame and drop the stride's executor blocks
        state = trunc_state.truncate(state)
        scope.release_new()
    if not track_paths:
        return state.select("source", "vid", "dist")
    return state


def shortest_paths(
    graph: Graph,
    pairs: DataFrame,
    weighted: bool = True,
    max_hops: int = 200,
) -> DataFrame:
    """(src, dst) pairs → (src, dst, cost, nodes array<long>): the full node
    sequence of one shortest path per pair (min-pred tie-break), path-less
    pairs dropped — the reference's path flatten (G3,
    /root/reference/src/routing/paths.rs flatten) batched over the
    shortest-path tree from ONE multi-source BSP run.

    Reconstruction walks predecessors backwards: per hop, one equi-join of
    the still-active pairs against the tree — row count stays at #pairs, so
    the loop costs O(path length) joins, not O(|V|)."""
    spark = graph.edges.sparkSession
    sources = [r["src"] for r in pairs.select("src").distinct().collect()]
    tree = run(graph, sources, weighted=weighted, track_paths=True)
    trunc = EphemeralTruncator(spark, "sssp-paths")

    tree_j = tree.select(
        F.col("source").alias("src"), F.col("vid").alias("cur"),
        "dist", "pred",
    )
    walk = (
        pairs.join(
            tree_j.select("src", F.col("cur").alias("dst"), F.col("dist").alias("cost")),
            ["src", "dst"], "inner",
        )
        .select(
            "src", "dst", "cost",
            F.col("dst").alias("cur"),
            F.array(F.col("dst")).alias("nodes"),
        )
    )
    for _ in range(max_hops):
        walk = trunc.truncate(
            walk.join(tree_j.select("src", "cur", "pred"), ["src", "cur"], "left")
            .select(
                "src", "dst", "cost",
                F.when(F.col("cur") == F.col("src"), F.col("cur"))
                .otherwise(F.col("pred")).alias("cur"),
                F.when(
                    F.col("cur") == F.col("src"), F.col("nodes")
                ).otherwise(F.concat(F.array(F.col("pred")), F.col("nodes"))).alias("nodes"),
            )
        )
        if walk.where(F.col("cur") != F.col("src")).limit(1).count() == 0:
            break
    return walk.select("src", "dst", "cost", "nodes")


def harmonic_centrality(
    graph: Graph,
    sources: list[int] | None = None,
    weighted: bool = False,
    max_iter: int = 100,
    max_exact_sources: int = EXACT_SOURCE_CAP,
) -> DataFrame:
    """→ (vid, harmonic): inbound harmonic centrality
    Σ_{s ∈ sources, s ≠ v, v reachable from s} 1 / d(s, v) — the standard
    distance-based importance measure (Boldi & Vigna, "Axioms for
    Centrality"), built directly on the multi-source BSP relax loop.

    ``sources=None`` computes the EXACT centrality (every vertex is a
    source) — only sane on small graphs. At scale pass a deterministic
    landmark sample (e.g. ``sampling.sample_rows`` over the vertex table):
    the estimator's cost is one BSP run with |landmarks| simultaneous
    frontiers, linear in the sample size, and the relative ranking
    converges with a few hundred landmarks on power-law graphs. Vertices
    reached by no source are absent (their centrality is 0)."""
    if sources is None:
        sources = _exact_sources(graph, max_exact_sources, "harmonic_centrality")
    d = run(graph, sources, weighted=weighted, max_iter=max_iter)
    return (
        d.where(F.col("source") != F.col("vid"))
        .groupBy("vid")
        .agg(F.round(F.sum(F.lit(1.0) / F.col("dist")), 6).alias("harmonic"))
    )


def closeness_centrality(
    graph: Graph,
    sources: list[int] | None = None,
    weighted: bool = False,
    max_iter: int = 100,
    max_exact_sources: int = EXACT_SOURCE_CAP,
) -> DataFrame:
    """→ (vid, n_reach, closeness): inbound closeness in the
    disconnected-graph-safe Lin/Wasserman–Faust form,

        c(v) = r(v) / Σ_{s ∈ sources, s ≠ v, d(s,v) < ∞} d(s, v)

    with r(v) = |{s ≠ v : d(s,v) < ∞}| — the raw reach count is returned
    alongside so callers can apply the (r/(n-1))² connectedness weight of
    the classic estimator themselves. Same landmark discipline and the
    same single multi-source BSP run as ``harmonic_centrality`` (the two
    differ only in the final aggregate); vertices no source reaches are
    absent (centrality 0)."""
    if sources is None:
        sources = _exact_sources(graph, max_exact_sources, "closeness_centrality")
    d = run(graph, sources, weighted=weighted, max_iter=max_iter)
    return (
        d.where((F.col("source") != F.col("vid")) & (F.col("dist") > 0))
        .groupBy("vid")
        .agg(
            F.count("*").alias("n_reach"),
            F.round(F.count("*") / F.sum("dist"), 6).alias("closeness"),
        )
    )


def route_costs(graph: Graph, pairs: DataFrame, weighted: bool = True) -> DataFrame:
    """(src, dst) pairs → (src, dst, cost) keeping only pairs with a real
    path — the reference generator's contract (random_or_all.rs:32-158),
    batched: ONE multi-source BSP run over the distinct sources instead of
    a Dijkstra per pair."""
    sources = [r["src"] for r in pairs.select("src").distinct().collect()]
    dists = run(graph, sources, weighted=weighted)
    return (
        pairs.join(
            dists.select(
                F.col("source").alias("src"), F.col("vid").alias("dst"),
                F.col("dist").alias("cost"),
            ),
            ["src", "dst"],
            "inner",
        )
    )


def reversed_view(graph: Graph) -> Graph:
    """Graph with every edge's direction flipped, re-rested on hash(new src)
    so the relax loop's state⨝edges join stays exchange-free on the edge
    side. out_deg/out_wsum are recomputed for the flipped orientation (the
    reference stores the backward graph as an explicit permutation,
    building.rs:813-884; Spark re-materializes the layout instead)."""
    from dataclasses import replace

    rev = graph.edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
    )
    deg = rev.groupBy("src").agg(
        F.count("*").alias("out_deg"), F.sum("weight").alias("out_wsum")
    )
    edges = (
        rev.join(deg, "src")
        .repartition(graph.num_blocks, "src")
        .sortWithinPartitions("src", "dst")
    )
    return replace(graph, edges=edges, metric_names=None)


def landmark_distances(
    graph: Graph, landmarks: list[int], weighted: bool = True, max_iter: int = 100
) -> tuple[DataFrame, DataFrame]:
    """The k-landmark distance sketch: (d_from, d_to) where
    d_from = (lm, vid, dist) with dist = d(lm → vid)  (forward BSP run) and
    d_to   = (lm, vid, dist) with dist = d(vid → lm)  (the same run on the
    reversed view — correct on digraphs, where d(u→l) ≠ d(l→u)).

    This is the sketch a 2-hop / landmark distance oracle stores: O(k·|V|)
    rows instead of O(|V|²) pairwise distances; both runs are ONE
    multi-source BSP each, so sketch construction costs 2 relax loops
    regardless of k."""
    fwd = run(graph, landmarks, weighted=weighted, max_iter=max_iter).select(
        F.col("source").alias("lm"), "vid", "dist"
    )
    bwd = run(reversed_view(graph), landmarks, weighted=weighted, max_iter=max_iter
              ).select(F.col("source").alias("lm"), "vid", "dist")
    return fwd, bwd


def landmark_estimates(
    graph: Graph,
    landmarks: list[int],
    pairs: DataFrame,
    weighted: bool = True,
    max_iter: int = 100,
) -> DataFrame:
    """Landmark distance-oracle estimate for (src, dst) query pairs:

        est(u, v) = min over landmarks l of  d(u → l) + d(l → v)

    an UPPER bound on the true distance (triangle inequality), exact
    whenever some shortest u→v path passes a landmark — with
    landmarks = all vertices it degenerates to the exact distance
    (pinned in tests/test_sssp.py). Pairs where no landmark is both
    reachable from u and reaches v are absent (no finite estimate).

    Scale design: answering Q pairs costs a k-way join against the
    O(k·|V|) sketch — no BSP run at query time. That is the trade
    landmark oracles make on web-scale graphs (one preprocessing pass,
    then millisecond-class queries); est quality grows with k and with
    hub-centrality of the chosen landmarks, so pick landmarks by top
    PageRank/degree, not uniformly."""
    fwd, bwd = landmark_distances(graph, landmarks, weighted, max_iter)
    to_lm = bwd.select("lm", F.col("vid").alias("src"), F.col("dist").alias("d_src_lm"))
    from_lm = fwd.select("lm", F.col("vid").alias("dst"), F.col("dist").alias("d_lm_dst"))
    return (
        pairs.join(to_lm, "src")
        .join(from_lm, ["lm", "dst"])
        .groupBy("src", "dst")
        .agg(F.round(F.min(F.col("d_src_lm") + F.col("d_lm_dst")), 6).alias("est_dist"))
    )
