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

#: rounds between reliable parquet truncations inside the inner fixpoints
#: (mid-stride rounds cut lineage with a lazy localCheckpoint, same
#: window-of-loss tradeoff as SSSP/PageRank)
_STRIDE = 4


def run(
    graph: Graph,
    max_outer: int = 50,
    max_inner: int = 200,
    local_cap: int | None = None,
) -> DataFrame:
    """→ (vid long, scc long), scc = min vid of the strongly connected
    component. Raises RuntimeError if not converged in `max_outer` outer
    rounds (exactness over silent truncation). ``local_cap`` overrides
    the single-task fast-path vertex threshold (0 forces the BSP loop —
    see operators/localgraph)."""
    spark = graph.edges.sparkSession
    edges = (
        graph.edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    )
    with iterative_conf(spark):
        return _scc(
            edges, graph.vertices.select("vid"), spark, max_outer, max_inner,
            local_cap=local_cap,
        )


def run_edges(
    edges: DataFrame,
    max_outer: int = 50,
    max_inner: int = 200,
    local_cap: int | None = None,
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
        out = _scc(e, verts, spark, max_outer, max_inner, local_cap=local_cap)
    return out.select(F.col("vid").alias("id"), "scc")


def condensation(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Condensed DAG: distinct (scc_src, scc_dst) pairs with scc_src ≠
    scc_dst — on a code graph, the build-order DAG over import cycles.
    `labels` is run_edges' (id, scc) output. Two broadcast-eligible joins
    when the label table is small; at scale both join keys are the edge
    endpoints, so the edge table's existing layout serves one side."""
    lab = labels.select("id", "scc")
    return (
        edges.select("src", "dst")
        .join(lab.select(F.col("id").alias("src"), F.col("scc").alias("scc_src")), "src")
        .join(lab.select(F.col("id").alias("dst"), F.col("scc").alias("scc_dst")), "dst")
        .where(F.col("scc_src") != F.col("scc_dst"))
        .select("scc_src", "scc_dst")
        .distinct()
    )


def toposort_layers(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 200,
    truncate_every: int = _STRIDE,
    local_cap: int | None = None,
) -> DataFrame:
    """Topological LAYERING of a DAG → (id long, layer long): layer(v) =
    length of the longest path from any root (in-degree-0 vertex) to v.
    Vertices of equal layer are mutually independent, so `layer` is a
    parallel build/processing schedule — run `condensation` output through
    this to get the build order of an import graph with cycles collapsed.

    BSP longest-path relaxation with a delta frontier (the max-analogue of
    sssp.run's min loop): layer'(v) = max(layer(v), max_{u→v} layer(u)+1).
    On a DAG this converges in ≤ depth rounds; per-round join size tracks
    the propagation wavefront, not |V|. A cycle would relax forever —
    RuntimeError after `max_iter` rounds (exactness over silent wrap), so
    the operator doubles as a cycle detector.

    `vertices`: optional (id) frame pinning the vertex universe (e.g. every
    SCC label, including components whose edges were all intra-SCC);
    default = ids appearing in the edges."""
    spark = edges.sparkSession
    e = edges.select(
        F.col(edges.columns[0]).alias("src"), F.col(edges.columns[1]).alias("dst")
    ).where(F.col("src") != F.col("dst"))
    verts = (
        vertices.select(F.col(vertices.columns[0]).alias("id"))
        if vertices is not None
        else e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
    ).distinct()

    trunc_state = EphemeralTruncator(spark, "topo-state")
    trunc_front = EphemeralTruncator(spark, "topo-frontier")
    trunc_in = EphemeralTruncator(spark, "topo-edges")
    scope = BlockScope(spark)

    # the DAG is typically a live condensation plan (two joins + distinct
    # over the SCC labels) that every relaxation round would re-run:
    # reliably truncate it once so rounds read parquet
    e = trunc_in.truncate(e)
    n_e = e.limit(8_000_000).count()

    # batched convergence probes on tiny DAGs (same rationale as _scc:
    # per-ACTION fixed cost dominates): an empty frontier stays empty,
    # so probing only at stride boundaries is exact
    n_v = verts.limit(250_000).count()
    probe_every = max(truncate_every, 1) if n_v < 250_000 else 1

    # single-task fast path (operators/localgraph): below the caps, one
    # executor-side Kahn/longest-path task replaces ~depth BSP rounds of
    # fixed job cost. Cycle contract preserved: stuck vertices come back
    # layer = -1 and we raise the same RuntimeError the BSP path does.
    from . import localgraph

    # n_v saturates at its probe limit (250k), so require strictly-below
    # to avoid reading "exactly at the limit" as "small"
    v_cap = localgraph.LOCAL_VERTEX_CAP if local_cap is None else local_cap
    if (
        v_cap > 0 and n_v <= v_cap and n_v < 250_000
        and n_e <= localgraph.LOCAL_EDGE_CAP
    ):
        out = trunc_state.truncate(localgraph.local_toposort(e, verts))
        if out.where(F.col("layer") < 0).limit(1).count() > 0:
            raise RuntimeError(
                "toposort_layers: input has a cycle (vertices stuck behind "
                "it cannot be layered)"
            )
        scope.release_new()
        return out

    from ..plans.superstep import sized_shuffle

    with iterative_conf(spark), sized_shuffle(spark, max(n_e, n_v)):
        state = verts.select("id", F.lit(0).cast("long").alias("layer"))
        frontier = state
        converged = False
        for it in range(max_iter):
            relaxed = (
                frontier.join(e, frontier["id"] == e["src"])
                .select(F.col("dst").alias("id"), (F.col("layer") + 1).alias("layer"))
                .groupBy("id")
                .agg(F.max("layer").alias("layer"))
            )
            merged = (
                state.unionByName(relaxed)
                .groupBy("id")
                .agg(F.max("layer").alias("layer"))
            )
            new_frontier = (
                merged.join(
                    state.select("id", F.col("layer").alias("old")), "id"
                )
                .where(F.col("layer") > F.col("old"))
                .select("id", "layer")
            )
            boundary = (it + 1) % max(truncate_every, 1) == 0
            if boundary:
                new_frontier = trunc_front.truncate(new_frontier, reap=False)
                merged = trunc_state.truncate(merged, reap=False)
            else:
                new_frontier = new_frontier.localCheckpoint(eager=False)
                merged = merged.localCheckpoint(eager=False)
            if (it + 1) % probe_every == 0:
                trunc_front.reap()
                trunc_state.reap()
                n_front = new_frontier.limit(1).count()
                if boundary:
                    scope.release_new()
                state, frontier = merged, new_frontier
                if n_front == 0:
                    converged = True
                    break
            else:
                state, frontier = merged, new_frontier
        if not converged:
            raise RuntimeError(
                f"toposort_layers: still relaxing after {max_iter} rounds — "
                "input has a cycle (or raise max_iter for a deeper DAG)"
            )
        state = trunc_state.truncate(state)
        scope.release_new()
    return state


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
    local_cap: int | None = None,
) -> DataFrame:
    from ..plans.checkpoint import EphemeralTruncator as _ET
    from . import localgraph

    # Single-task fast path: below the caps the whole graph fits one
    # partition and the BSP loop's ~100 fixed-cost jobs dominate wall
    # clock; one executor-side Tarjan task produces identical labels.
    # Probe order keeps big graphs cheap: the vertex probe (already
    # needed for the adaptive shuffle width below) gates the edge probe.
    v_cap = localgraph.LOCAL_VERTEX_CAP if local_cap is None else local_cap
    if v_cap > 0 and vertices.limit(v_cap + 1).count() <= v_cap:
        if edges.limit(localgraph.LOCAL_EDGE_CAP + 1).count() <= localgraph.LOCAL_EDGE_CAP:
            # reliable truncate: downstream consumers (condensation,
            # bowtie set algebra) read parquet instead of re-running the
            # map task per action — the BSP path's t_d contract
            return _ET(spark, "scc-local").truncate(
                localgraph.local_scc(edges, vertices)
            )
    scope = BlockScope(spark)
    # Adaptive task granularity: per-round state is vertex-sized, so on a
    # small active graph a 32-partition shuffle per join/agg is pure fixed
    # overhead (~45 truncations x several 32-task stages dominated the
    # wall clock at driver-query scale); target ~250k rows/partition,
    # capped by the session's configured parallelism for big graphs. The
    # loop-scoped shuffle-partition override is the manual analogue of AQE
    # partition coalescing, which iterative_conf disables for plan
    # stability; restored on exit.
    conf_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_v = vertices.limit(50_000_000).count()
    p_state = max(1, min(conf_p, (n_v + 249_999) // 250_000))
    # Probe batching: on a TINY active graph (one state partition) the
    # wall clock is per-ACTION fixed cost (~0.3 s/job on this box), so
    # mid-stride convergence probes are skipped and the rounds fuse into
    # the stride boundary's job. Min/mark propagation converges exactly
    # when ONE round changes nothing, so a boundary-only probe is still
    # an exact fixpoint test; the ≤ stride−1 post-fixpoint rounds it
    # wastes are no-ops on rows that fit one partition. The stride itself
    # stays tight: WIDENING it was measured 2× slower (the un-materialized
    # lazy-checkpoint chain makes every boundary job re-analyze/replay the
    # whole window). On big graphs a wasted round is a real |V|-row
    # shuffle, so keep the per-round probe there.
    tiny = p_state == 1
    stride = _STRIDE
    probe_every = stride if tiny else 1
    spark.conf.set("spark.sql.shuffle.partitions", str(p_state))
    try:
        return _scc_loop(
            edges, vertices, spark, max_outer, max_inner, scope, p_state,
            probe_every, stride,
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(conf_p))


def _scc_loop(
    edges, vertices, spark, max_outer, max_inner, scope, p_state,
    probe_every=1, stride=_STRIDE,
):
    def slim(df):
        return df.coalesce(p_state)

    t_e = EphemeralTruncator(spark, "scc-edges")
    t_v = EphemeralTruncator(spark, "scc-verts")
    t_c = EphemeralTruncator(spark, "scc-colors")
    t_m = EphemeralTruncator(spark, "scc-marked")
    t_f = EphemeralTruncator(spark, "scc-frontier")
    t_i = EphemeralTruncator(spark, "scc-intra")
    t_d = EphemeralTruncator(spark, "scc-done")

    active_e = t_e.truncate(slim(edges))
    active_v = t_v.truncate(slim(vertices.select("vid")))
    done = spark.createDataFrame([], "vid long, scc long")

    for _outer in range(max_outer):
        if active_v.limit(1).count() == 0:
            scope.release_new()
            return done

        # -- 1. trim to FIXPOINT: peel in-deg-0 / out-deg-0 (or isolated)
        # layers until none trims. Running trim one layer per OUTER round
        # would pay a whole color+mark fixpoint per DAG layer — the
        # dominant round count on DAG-heavy graphs. Per layer: ONE stats
        # aggregate (trimmed + survivor counts together — three separate
        # probe jobs cost more than the layer itself on small graphs) and
        # lazy lineage cuts mid-stride, reliable truncation at boundaries.
        dirty = False
        for _t in range(max_inner):
            outd = active_e.groupBy("src").agg(F.count("*").alias("od"))
            ind = active_e.groupBy("dst").agg(F.count("*").alias("idg"))
            # one lazy cut on `both`: the first action over it (the stats
            # probe, or the boundary truncation when probes are batched)
            # materializes it, and the derived frames (done/active_v/
            # active_e) then read the cached blocks instead of re-running
            # the degree joins up to four times per layer
            both = active_v.join(
                outd.withColumnRenamed("src", "vid"), "vid", "left"
            ).join(ind.withColumnRenamed("dst", "vid"), "vid", "left").localCheckpoint(
                eager=False
            )
            is_trim = F.col("od").isNull() | F.col("idg").isNull()
            # a layer that trims nothing IS the fixpoint, so a batched
            # probe (every `probe_every` layers) is still exact — the
            # skipped layers fuse into the probe's one job
            if (_t + 1) % probe_every == 0:
                stats = both.agg(
                    F.count("*").alias("n"),
                    F.sum(is_trim.cast("long")).alias("nt"),
                ).collect()[0]
                n, nt = int(stats["n"]), int(stats["nt"] or 0)
                if nt == 0:
                    break
            else:
                n, nt = -1, -1  # no probe this layer: peel blind
            done = done.unionByName(
                both.where(is_trim).select("vid", F.col("vid").alias("scc"))
            )
            active_v = both.where(~is_trim).select("vid")
            active_e = _edges_between(active_e, active_v)
            if (_t + 1) % stride == 0:
                done = t_d.truncate(slim(done))
                active_v = t_v.truncate(slim(active_v))
                active_e = t_e.truncate(slim(active_e))
                dirty = False
            else:
                done = done.localCheckpoint(eager=False)
                active_v = active_v.localCheckpoint(eager=False)
                active_e = active_e.localCheckpoint(eager=False)
                dirty = True
            if n > 0 and n - nt == 0:
                done = t_d.truncate(slim(done))
                scope.release_new()
                return done
        else:
            raise RuntimeError(f"SCC trim did not converge in {max_inner} layers")
        if dirty:
            # fixpoint hit mid-stride: the frames feeding color/mark (and
            # possibly the next outer round) are only block-backed
            done = t_d.truncate(slim(done))
            active_v = t_v.truncate(slim(active_v))
            active_e = t_e.truncate(slim(active_e))
        if active_e.limit(1).count() == 0:
            # no edges left: every remaining active vertex is a singleton
            done = t_d.truncate(
                slim(done.unionByName(active_v.select("vid", F.col("vid").alias("scc"))))
            )
            scope.release_new()
            return done

        # -- 2. forward-min coloring to fixpoint. Stride discipline (same as
        # SSSP): mid-stride rounds cut lineage with a lazy localCheckpoint —
        # materialized by this round's `changed` probe — and only stride
        # boundaries pay the reliable parquet roundtrip; reap is deferred
        # because the probe still reads the previous step.
        colors = t_c.truncate(slim(active_v.select("vid", F.col("vid").alias("color"))))
        for _i in range(max_inner):
            msgs = active_e.join(
                colors.select(F.col("vid").alias("src"), "color"), "src"
            ).select(F.col("dst").alias("vid"), "color")
            new_colors = (
                colors.unionByName(msgs).groupBy("vid").agg(F.min("color").alias("color"))
            )
            boundary = (_i + 1) % stride == 0
            if boundary:
                new_colors = t_c.truncate(slim(new_colors), reap=False)
            else:
                new_colors = new_colors.localCheckpoint(eager=False)
            # min-propagation is at fixpoint iff the LAST round changed
            # nothing, so a batched probe (tiny graphs) stays exact; the
            # skipped rounds fuse into the probe's single job
            if (_i + 1) % probe_every == 0:
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
                colors = new_colors
        else:
            raise RuntimeError(f"SCC coloring did not converge in {max_inner} rounds")
        if not boundary:
            # fixpoint hit mid-stride: the frame feeding the whole mark
            # phase is only block-backed — make it reliable
            colors = t_c.truncate(slim(colors))

        # -- 3. backward mark within color classes, starting at the roots
        intra = t_i.truncate(slim(
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
        ))
        marked = t_m.truncate(
            slim(colors.where(F.col("vid") == F.col("color")).select("vid", "color"))
        )
        frontier = marked
        for _i in range(max_inner):
            preds = (
                intra.join(frontier.select(F.col("vid").alias("dst"), "color"), "dst")
                .select(F.col("src").alias("vid"), "color")
                .distinct()
            )
            new_frontier = preds.join(marked.select("vid"), "vid", "left_anti")
            boundary = (_i + 1) % stride == 0
            # cut the frontier FIRST, then build new_marked on top of the
            # cut frame — otherwise the boundary's t_m write re-runs the
            # whole join/distinct/anti-join frontier expansion a second time
            if boundary:
                new_frontier = t_f.truncate(slim(new_frontier), reap=False)
            else:
                new_frontier = new_frontier.localCheckpoint(eager=False)
            new_marked = marked.unionByName(new_frontier)
            if boundary:
                new_marked = t_m.truncate(slim(new_marked), reap=False)
            else:
                new_marked = new_marked.localCheckpoint(eager=False)
            # preds of an empty frontier stay empty, so a batched probe
            # still detects the fixpoint exactly
            if (_i + 1) % probe_every == 0:
                empty = new_frontier.limit(1).count() == 0
                t_f.reap()
                t_m.reap()
                frontier, marked = new_frontier, new_marked
                if empty:
                    break
            else:
                frontier, marked = new_frontier, new_marked
        else:
            raise RuntimeError(f"SCC marking did not converge in {max_inner} rounds")
        if not boundary:
            # mark fixpoint hit mid-stride: feeds assignment + next round
            marked = t_m.truncate(slim(marked))

        # -- 4. assign SCC = color for marked vertices, remove, repeat
        done = t_d.truncate(
            slim(done.unionByName(marked.select("vid", F.col("color").alias("scc"))))
        )
        active_v = t_v.truncate(slim(active_v.join(marked.select("vid"), "vid", "left_anti")))
        active_e = t_e.truncate(slim(_edges_between(active_e, active_v)))
        scope.release_new()

    raise RuntimeError(f"SCC did not converge in {max_outer} outer rounds")
