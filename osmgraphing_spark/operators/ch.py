"""Contraction-hierarchy (CH) query execution — the reference's flagship
routing accelerator, batched Spark-first.

The reference consumes pre-contracted graphs (``graph.ch.fmi``: per-node
contraction levels + shortcut edges whose costs equal the two replaced
edges' sum) and answers point queries with a bidirectional CH-Dijkstra
(/root/reference/src/routing/dijkstra.rs — upward-only edge relaxation from
both ends, answer = min over meeting vertices). Construction itself is
delegated to an external tool by the reference too (README: CHConstructor),
so parity here is the QUERY side.

The priority-queue shape is wrong for BSP; the Spark-native equivalent
exploits the property that makes CH fast in the first place: the upward
graph (edges whose head level ≥ tail level) is a DAG through the level
hierarchy, so delta-frontier relaxation converges in ≤ #levels rounds, and

    dist(s, t) = min over v of  d_up(s → v) + d_up(t → v in reverse graph)

Batched execution — the reference's G5 multi-query amortization taken to
its limit: ONE upward BSP from all query sources, ONE from all query
targets (on the reversed graph, same upward filter after reversal), then
one join on the meeting vertex. Per query batch that is two bounded loops
+ one shuffle, regardless of how many pairs are asked.

Correctness pin (tests/test_ch.py): on the reference's own
``small/graph.ch.fmi`` fixture (8 nodes, 25 edges incl. 2 shortcuts,
levels 1-4), CH answers equal plain BSP Dijkstra on the same map AND on
the original uncontracted ``small/graph.fmi`` for every reachable pair —
the same cross-check the reference's routing tests run
(tests/small/routing/fastest.rs: chdijkstra_on_chmap vs dijkstra_on_map).

Scale contract (100 TB): the upward filter is one broadcast-able join on
the level table; the per-round frontier tracks the BFS wavefront of the
upward DAG (≤ #levels rounds, ~log-ish on real hierarchies); searches for
ALL queries in a batch share every round's shuffle. No per-query work
exists outside the two shared loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import EphemeralTruncator
from ..plans.superstep import BlockScope, iterative_conf


def upward_edges(
    edges: DataFrame, levels: DataFrame, reverse: bool = False
) -> DataFrame:
    """Edges (src, dst, w) filtered to the upward graph: level(dst) ≥
    level(src) (ties kept — correctness is unaffected because every
    relaxed cost is a real path cost; strictness only prunes harder).
    ``reverse=True`` flips the edges FIRST (the backward search's graph),
    then applies the same upward filter."""
    e = edges.select("src", "dst", "w")
    if reverse:
        e = e.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    lv = levels.select("vid", "level")
    # the level table is 16 B/vertex — always slim relative to the edge
    # table, so hint the broadcast explicitly (plan-pinned in
    # test_plan_quality) instead of relying on source statistics
    return (
        e.join(
            F.broadcast(
                lv.select(F.col("vid").alias("src"), F.col("level").alias("_ls"))
            ),
            "src",
        )
        .join(
            F.broadcast(
                lv.select(F.col("vid").alias("dst"), F.col("level").alias("_ld"))
            ),
            "dst",
        )
        .where(F.col("_ld") >= F.col("_ls"))
        .select("src", "dst", "w")
    )


def _seed_state(spark, sources, with_pred: bool) -> DataFrame:
    """Sources (python list OR single-column DataFrame) → initial BSP
    state. The DataFrame path never materializes the batch on the driver
    — a million-pair query workload seeds distributedly."""
    if isinstance(sources, DataFrame):
        c = sources.columns[0]
        base = sources.select(
            F.col(c).cast("long").alias("source")
        ).distinct().select(
            "source", F.col("source").alias("vid"), F.lit(0.0).alias("dist")
        )
        return (
            base.withColumn("pred", F.lit(-1).cast("long"))
            if with_pred
            else base
        )
    rows = [
        ((int(v), int(v), 0.0, -1) if with_pred else (int(v), int(v), 0.0))
        for v in sources
    ]
    schema = (
        "source long, vid long, dist double, pred long"
        if with_pred
        else "source long, vid long, dist double"
    )
    return spark.createDataFrame(rows, schema)


def _sweep_depth(levels: DataFrame, floor: int) -> int:
    """Hop bound for an upward sweep, derived from the level table:
    same-round vertices are never adjacent when contracted
    (contract_graph's independent-set invariant), so every upward hop
    strictly increases the contraction level and a sweep settles in at
    most (max level + 2) rounds. Returns max(floor, that bound) so an
    explicitly larger caller-supplied max_iter still wins."""
    row = levels.agg(F.max("level").alias("m")).collect()[0]
    depth = int(row["m"]) + 2 if row["m"] is not None else floor
    return max(floor, depth)


def _upward_sssp(
    spark, up_edges: DataFrame, sources, max_iter: int
) -> DataFrame:
    """Delta-frontier min-relaxation over an upward DAG, all sources
    simultaneously → (source, vid, dist). Same loop discipline as
    operators/sssp (min-merge, lazy truncation, batched convergence on an
    empty frontier) minus path tracking. Raises if the frontier is still
    non-empty after ``max_iter`` rounds — a deep hierarchy must fail
    loudly, not return silently overestimated costs (callers derive
    max_iter from the level table via ``_sweep_depth``)."""
    trunc = EphemeralTruncator(spark, "ch-up")
    scope = BlockScope(spark)
    state = _seed_state(spark, sources, with_pred=False)
    frontier = state
    with iterative_conf(spark):
        for it in range(max_iter):
            relaxed = (
                frontier.join(
                    up_edges.withColumnRenamed("src", "vid"), "vid"
                )
                .select(
                    "source",
                    F.col("dst").alias("vid"),
                    (F.col("dist") + F.col("w")).alias("dist"),
                )
            )
            merged = (
                state.unionByName(relaxed)
                .groupBy("source", "vid")
                .agg(F.min("dist").alias("dist"))
            )
            new_frontier = (
                merged.join(
                    state.select(
                        "source", "vid", F.col("dist").alias("_old")
                    ),
                    ["source", "vid"],
                    "left",
                )
                .where(
                    F.col("_old").isNull() | (F.col("dist") < F.col("_old"))
                )
                .select("source", "vid", "dist")
            )
            new_frontier = trunc.truncate(new_frontier, reap=False)
            state = trunc.truncate(merged, reap=False)
            frontier = new_frontier
            if frontier.limit(1).count() == 0:
                break
        else:
            # the per-round check above just saw a NON-empty frontier, so
            # exhausting the loop means unsettled state: raise instead of
            # returning silently overestimated/missing costs
            raise RuntimeError(
                f"CH upward sweep still had an active frontier after "
                f"{max_iter} rounds — the hierarchy is deeper than "
                f"max_iter; pass the level table so the bound can be "
                f"derived (_sweep_depth), or raise max_iter."
            )
        scope.release_new()
        return state


def ch_route_costs(
    edges: DataFrame,
    levels: DataFrame,
    pairs: DataFrame,
    max_iter: int = 64,
) -> DataFrame:
    """Batched CH point queries: ``pairs`` (src, dst) → (src, dst, cost)
    keeping only pairs with a real path (the reference generator's
    contract, random_or_all.rs:32-158). ``edges`` = (src, dst, w) of the
    CONTRACTED graph (original + shortcut edges); ``levels`` = (vid,
    level) contraction levels. ``max_iter`` is a floor: the real bound is
    derived from the level table (one scalar aggregate), so a deep
    hierarchy converges instead of tripping the sweep's unsettled-state
    guard."""
    spark = edges.sparkSession
    max_iter = _sweep_depth(levels, max_iter)
    fwd = _upward_sssp(
        spark, upward_edges(edges, levels), pairs.select("src"), max_iter
    )
    bwd = _upward_sssp(
        spark,
        upward_edges(edges, levels, reverse=True),
        pairs.select("dst"),
        max_iter,
    )
    cand = (
        fwd.select(F.col("source").alias("src"), "vid", F.col("dist").alias("_df"))
        .join(
            bwd.select(
                F.col("source").alias("dst"), "vid", F.col("dist").alias("_db")
            ),
            "vid",
        )
        .select("src", "dst", (F.col("_df") + F.col("_db")).alias("cost"))
        .groupBy("src", "dst")
        .agg(F.min("cost").alias("cost"))
    )
    return pairs.select("src", "dst").distinct().join(cand, ["src", "dst"])


# ch_distances' one-to-all mode launches a backward frontier from EVERY
# vertex — O(V·V) state, the same footgun class as the exact-centrality
# default (operators/sssp.EXACT_SOURCE_CAP): refuse past this cap rather
# than detonate on a production graph.
ONE_TO_ALL_CAP = 4096


def ch_distances(
    edges: DataFrame,
    levels: DataFrame,
    sources: list[int],
    max_iter: int = 64,
    max_vertices: int = ONE_TO_ALL_CAP,
) -> DataFrame:
    """One-to-all distances via CH: forward upward sweep from ``sources``
    + backward upward sweep seeded from EVERY graph vertex. The backward
    seeds cannot be narrowed to the forward-settled set — a target t is
    generally reached up-then-DOWN, so t itself is usually NOT
    forward-settled and must still launch its own backward frontier for
    the meet-join to find it. That makes this mode O(V·V) frontier state
    by construction, so it REFUSES past ``max_vertices`` (pass explicit
    pairs to ``ch_route_costs`` instead, whose cost is independent of
    pair count)."""
    spark = edges.sparkSession
    max_iter = _sweep_depth(levels, max_iter)
    fwd = _upward_sssp(spark, upward_edges(edges, levels), sources, max_iter)
    vdf = (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )
    n = vdf.count()
    if n > max_vertices:
        raise ValueError(
            f"ch_distances one-to-all mode materializes all {n} vertex ids "
            f"on the driver and runs {n} simultaneous backward frontiers "
            f"(O(V^2) state), exceeding the safety cap of {max_vertices}. "
            f"Use ch_route_costs with an explicit pair table, or raise "
            f"max_vertices if you really mean it."
        )
    verts = [r["vid"] for r in vdf.collect()]
    bwd = _upward_sssp(
        spark, upward_edges(edges, levels, reverse=True), verts, max_iter
    )
    return (
        fwd.select(F.col("source"), "vid", F.col("dist").alias("_df"))
        .join(
            bwd.select(
                F.col("source").alias("target"), "vid", F.col("dist").alias("_db")
            ),
            "vid",
        )
        .select("source", F.col("target").alias("vid"), (F.col("_df") + F.col("_db")).alias("dist"))
        .groupBy("source", "vid")
        .agg(F.min("dist").alias("dist"))
    )


def contract_graph(
    edges: DataFrame,
    max_rounds: int = 200,
    seed: int = 42,
    max_wedge_degree: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Build a contraction hierarchy → (ch_edges (src, dst, w, via),
    levels (vid, level)): original edges + witness-free shortcuts (via =
    the contracted middle vertex, NULL for originals — the provenance
    ``ch_shortest_paths`` expands back into full routes), levels = the
    round each vertex was contracted in.

    The reference DELEGATES construction to an external single-machine
    tool (README: CHConstructor); this is the Spark-native equivalent, a
    parallel independent-set contraction in the PHAST/OSRM family:

    - each round selects the set S of vertices whose priority (active
      degree, hash tiebreak — both deterministic under ``seed``) is a
      strict local minimum among their active neighbors. S is independent
      by construction, so contracting its members simultaneously equals
      contracting them sequentially — no member touches another's edges.
    - contracting v inserts ALL (u→v→w) shortcuts (cost = sum). Skipping
      the witness search is the classic simplicity/query-time trade and
      CORRECTNESS-NEUTRAL: every shortcut carries a real path cost, and
      the all-pairs insertion is exactly the step of the textbook
      distance-preservation induction, so d(active graph) is preserved
      round to round and every shortest path has an up-down
      representation (query correctness needs nothing else).
    - degree-first priority contracts hubs LAST (a hub is never a local
      minimum while any lower-degree neighbor lives), which bounds the
      deg² shortcut fan-in the same way the wedge-join caps do elsewhere.
    - same-round vertices are never adjacent when contracted, so the
      query's ``level(head) >= level(tail)`` tie handling is safe.

    Per round: one degree aggregate, one local-min join, one v-keyed
    wedge self-join for shortcuts, one min-dedup — all map-side-combined
    DataFrame ops; rounds shrink the active graph geometrically on
    sparse graphs (MIS-style), so ~O(log V) supersteps."""
    spark = edges.sparkSession
    trunc_a = EphemeralTruncator(spark, "ch-active")
    trunc_l = EphemeralTruncator(spark, "ch-levels")
    trunc_s = EphemeralTruncator(spark, "ch-shortcuts")
    scope = BlockScope(spark)

    # every edge carries `via`: NULL for originals, the contracted middle
    # vertex for shortcuts — the provenance ch_shortest_paths expands.
    # Dedup keeps min(struct(w, via)); Spark's nulls-first struct ordering
    # makes a cost-tied original beat a shortcut (fewer expansions).
    def _min_edge(df):
        return (
            df.groupBy("src", "dst")
            .agg(F.min(F.struct("w", "via")).alias("m"))
            .select(
                "src", "dst",
                F.col("m.w").alias("w"), F.col("m.via").alias("via"),
            )
        )

    base = edges.select(
        "src", "dst", "w", F.lit(None).cast("long").alias("via")
    ).where(F.col("src") != F.col("dst"))
    # the deduped base goes on the PERSISTENT truncator (trunc_s,
    # reap=False): the final union still reads it after the rolling
    # active-frame truncator has reaped all its own steps
    active = trunc_s.truncate(_min_edge(base), reap=False)
    all_edges = [active]
    levels = spark.createDataFrame([], "vid long, level long")
    rnd = 0  # loop may not run at all (edgeless input)

    with iterative_conf(spark):
        for rnd in range(1, max_rounds + 1):
            und = active.select("src", "dst").unionByName(
                active.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                )
            ).distinct()
            deg = und.groupBy("src").agg(F.count("*").alias("d"))
            if deg.limit(1).count() == 0:
                break
            # priority = struct(degree, salted hash, vid): EXACT
            # lexicographic comparison (a packed double would overflow the
            # 53-bit mantissa and manufacture ties, which can deadlock the
            # local-min selection); vid makes the order strictly total
            pri = deg.select(
                F.col("src").alias("vid"),
                F.struct(
                    F.col("d").alias("_d"),
                    F.pmod(
                        F.xxhash64(F.col("src"), F.lit(seed)), F.lit(2**61)
                    ).alias("_h"),
                    F.col("src").alias("_v"),
                ).alias("p"),
            )
            nbr_min = (
                und.join(pri.withColumnRenamed("vid", "dst"), "dst")
                .groupBy("src")
                .agg(F.min("p").alias("np"))
            )
            s_set = (
                pri.join(nbr_min.withColumnRenamed("src", "vid"), "vid")
                .where(F.col("p") < F.col("np"))
                .select("vid", F.col("p._d").alias("_d"))
            )
            if max_wedge_degree is not None:
                # hard skew guard on top of degree-FIRST priority: a hub
                # surrounded by even heavier neighbors can still be a
                # local minimum, and contracting it fans deg² shortcuts in
                # one round. Defer such nodes — with a progress fallback:
                # if EVERY selected node exceeds the cap (a hub clique is
                # all that remains), contract the unfiltered minima anyway
                # rather than stall.
                capped = s_set.where(F.col("_d") <= max_wedge_degree)
                if capped.limit(1).count() > 0:
                    s_set = capped
            s_set = s_set.select("vid")
            levels = trunc_l.truncate(
                levels.unionByName(
                    s_set.select("vid", F.lit(rnd).cast("long").alias("level"))
                )
            )
            ins = active.join(
                s_set.withColumnRenamed("vid", "dst"), "dst"
            ).select(F.col("src").alias("u"), F.col("dst").alias("v"), F.col("w").alias("w1"))
            outs = active.join(
                s_set.withColumnRenamed("vid", "src"), "src"
            ).select(F.col("src").alias("v"), F.col("dst").alias("wv"), F.col("w").alias("w2"))
            # materialize this round's shortcuts to their own parquet step
            # (reap=False): the final union reads every round's file, and
            # the active-frame truncations below delete the active parquet
            # these lazy wedge joins would otherwise still be scanning
            shortcuts = trunc_s.truncate(
                _min_edge(
                    ins.join(outs, "v")
                    .where(F.col("u") != F.col("wv"))
                    .select(
                        F.col("u").alias("src"), F.col("wv").alias("dst"),
                        (F.col("w1") + F.col("w2")).alias("w"),
                        F.col("v").alias("via"),
                    )
                ),
                reap=False,
            )
            survivors = (
                active.join(s_set.withColumnRenamed("vid", "src"), "src", "left_anti")
                .join(s_set.withColumnRenamed("vid", "dst"), "dst", "left_anti")
            )
            active = trunc_a.truncate(
                _min_edge(
                    survivors.select("src", "dst", "w", "via")
                    .unionByName(shortcuts)
                )
            )
            all_edges.append(shortcuts)
        else:
            raise RuntimeError(f"CH contraction did not finish in {max_rounds} rounds")
        scope.release_new()

    ch_edges = all_edges[0]
    for sc in all_edges[1:]:
        ch_edges = ch_edges.unionByName(sc)
    ch_edges = trunc_a.truncate(_min_edge(ch_edges))
    # vertices still uncontracted when the edges ran out OUTLIVED every
    # neighbor — in contraction order they come last, so they take the
    # HIGHEST level (a low level here would break the up-down property of
    # paths ending at them); truly isolated vertices ride along harmlessly
    vs = (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )
    top = rnd + 1
    missing = vs.join(levels, "vid", "left_anti").select(
        "vid", F.lit(top).cast("long").alias("level")
    )
    return ch_edges, levels.unionByName(missing)


def _upward_sssp_pred(
    spark, up_edges: DataFrame, sources, max_iter: int
) -> DataFrame:
    """`_upward_sssp` with predecessor tracking → (source, vid, dist,
    pred); pred = -1 on the source row, min-(dist, pred) tie-break (every
    (dist, pred) pair comes from a real relaxation, so the winning pred is
    a valid tree parent — the sssp.run discipline)."""
    trunc = EphemeralTruncator(spark, "ch-up-p")
    scope = BlockScope(spark)
    state = _seed_state(spark, sources, with_pred=True)

    def _merge(df):
        return (
            df.groupBy("source", "vid")
            .agg(F.min(F.struct("dist", "pred")).alias("m"))
            .select(
                "source", "vid",
                F.col("m.dist").alias("dist"), F.col("m.pred").alias("pred"),
            )
        )

    frontier = state
    with iterative_conf(spark):
        for _ in range(max_iter):
            relaxed = frontier.join(
                up_edges.withColumnRenamed("src", "vid"), "vid"
            ).select(
                "source",
                F.col("dst").alias("vid"),
                (F.col("dist") + F.col("w")).alias("dist"),
                F.col("vid").alias("pred"),
            )
            merged = _merge(state.unionByName(relaxed))
            new_frontier = (
                merged.join(
                    state.select("source", "vid", F.col("dist").alias("_old")),
                    ["source", "vid"],
                    "left",
                )
                .where(F.col("_old").isNull() | (F.col("dist") < F.col("_old")))
                .select("source", "vid", "dist", "pred")
            )
            new_frontier = trunc.truncate(new_frontier, reap=False)
            state = trunc.truncate(merged, reap=False)
            frontier = new_frontier
            if frontier.limit(1).count() == 0:
                break
        else:
            # the per-round check above just saw a NON-empty frontier, so
            # exhausting the loop means unsettled state: raise instead of
            # returning silently overestimated/missing costs
            raise RuntimeError(
                f"CH upward sweep still had an active frontier after "
                f"{max_iter} rounds — the hierarchy is deeper than "
                f"max_iter; pass the level table so the bound can be "
                f"derived (_sweep_depth), or raise max_iter."
            )
        scope.release_new()
        return state


def _walk_tree(trunc, pairs_with_meet, tree, append: bool, max_hops: int):
    """Pred-chain walk (the sssp.shortest_paths pattern): per hop one
    equi-join of the still-active rows against the tree. ``append=False``
    prepends (forward tree: chain m→…→s read as s→…→m); ``append=True``
    appends (backward tree on the reversed graph: chain m→…→t IS the
    original-direction suffix)."""
    walk = pairs_with_meet  # (qsrc, qdst, root, cur, nodes)
    for _ in range(max_hops):
        j = walk.join(
            tree.select(
                F.col("source").alias("root"), F.col("vid").alias("cur"), "pred"
            ),
            ["root", "cur"],
            "left",
        )
        done = F.col("cur") == F.col("root")
        grown = F.when(done, F.col("nodes")).otherwise(
            F.concat(F.col("nodes"), F.array(F.col("pred")))
            if append
            else F.concat(F.array(F.col("pred")), F.col("nodes"))
        )
        walk = trunc.truncate(
            j.select(
                "qsrc", "qdst", "root",
                F.when(done, F.col("cur")).otherwise(F.col("pred")).alias("cur"),
                grown.alias("nodes"),
            ),
            reap=False,
        )
        if walk.where(F.col("cur") != F.col("root")).limit(1).count() == 0:
            break
    else:
        raise RuntimeError(
            f"CH pred-chain walk still had unfinished rows after "
            f"{max_hops} hops — tree deeper than max_hops; derive the "
            f"bound from the level table (_sweep_depth) or raise it."
        )
    return walk


def ch_shortest_paths(
    edges: DataFrame,
    levels: DataFrame,
    pairs: DataFrame,
    max_iter: int = 64,
    max_expand: int = 64,
) -> DataFrame:
    """Batched CH routes: (src, dst) pairs → (src, dst, cost, nodes
    array<long>) — full node sequences in the ORIGINAL graph, path-less
    pairs dropped (the reference's G3 path flatten, on the CH engine).

    Three phases, all batched across every query pair:
    1. the two upward sweeps of ``ch_route_costs`` but predecessor-tracked,
       + an argmin join picking each pair's meeting vertex;
    2. two pred-chain walks reconstruct the up-down CH-edge path
       (s →up→ m ←up← t);
    3. shortcut expansion: each adjacent (a, b) in a path joins the CH
       edge table's ``via``; a non-NULL via splits the hop into
       (a, via, b) at the midpoint position — repeated until no hop is a
       shortcut (≤ contraction depth rounds). Positions are dyadic
       doubles, nesting ≤ one split per round, far inside double
       precision.

    ``max_iter`` is a floor — the sweep/walk bound is derived from the
    level table (``_sweep_depth``) so deep hierarchies converge."""
    spark = edges.sparkSession
    max_iter = _sweep_depth(levels, max_iter)
    fwd = _upward_sssp_pred(
        spark, upward_edges(edges, levels), pairs.select("src"), max_iter
    )
    bwd = _upward_sssp_pred(
        spark,
        upward_edges(edges, levels, reverse=True),
        pairs.select("dst"),
        max_iter,
    )
    trunc = EphemeralTruncator(spark, "ch-paths")

    meet = (
        fwd.select(F.col("source").alias("qsrc"), "vid", F.col("dist").alias("_df"))
        .join(
            bwd.select(
                F.col("source").alias("qdst"), "vid", F.col("dist").alias("_db")
            ),
            "vid",
        )
        .join(
            pairs.select(
                F.col("src").alias("qsrc"), F.col("dst").alias("qdst")
            ).distinct(),
            ["qsrc", "qdst"],
        )
        .groupBy("qsrc", "qdst")
        .agg(
            F.min(
                F.struct((F.col("_df") + F.col("_db")).alias("cost"), "vid")
            ).alias("m")
        )
        .select(
            "qsrc", "qdst",
            F.col("m.cost").alias("cost"), F.col("m.vid").alias("meet"),
        )
    )
    meet = trunc.truncate(meet, reap=False)

    up = _walk_tree(
        trunc,
        meet.select(
            "qsrc", "qdst", F.col("qsrc").alias("root"),
            F.col("meet").alias("cur"), F.array("meet").alias("nodes"),
        ),
        fwd,
        append=False,
        max_hops=max_iter,
    ).select("qsrc", "qdst", F.col("nodes").alias("up_nodes"))
    down = _walk_tree(
        trunc,
        meet.select(
            "qsrc", "qdst", F.col("qdst").alias("root"),
            F.col("meet").alias("cur"), F.array("meet").alias("nodes"),
        ),
        bwd,
        append=True,
        max_hops=max_iter,
    ).select("qsrc", "qdst", F.col("nodes").alias("down_nodes"))

    path = (
        meet.join(up, ["qsrc", "qdst"]).join(down, ["qsrc", "qdst"])
        .select(
            "qsrc", "qdst", "cost",
            F.concat(
                F.col("up_nodes"), F.slice(F.col("down_nodes"), 2, 1 << 20)
            ).alias("nodes"),
        )
    )
    # → positional rows for expansion: pos = dyadic double
    rows = path.select(
        "qsrc", "qdst", "cost", F.posexplode("nodes").alias("pos0", "vid")
    ).select(
        "qsrc", "qdst", "cost",
        F.col("pos0").cast("double").alias("pos"), "vid",
    )
    rows = trunc.truncate(rows, reap=False)
    via_map = edges.where(F.col("via").isNotNull()).select(
        F.col("src").alias("a"), F.col("dst").alias("b"), "w", "via"
    ) if "via" in edges.columns else None
    if via_map is not None:
        from pyspark.sql import Window

        for _ in range(max_expand):
            wspec = Window.partitionBy("qsrc", "qdst").orderBy("pos")
            hops = rows.select(
                "qsrc", "qdst", "cost", "pos", "vid",
                F.lead("pos").over(wspec).alias("npos"),
                F.lead("vid").over(wspec).alias("nvid"),
            ).where(F.col("npos").isNotNull())
            # a hop that matches a SHORTCUT row must only expand when the
            # shortcut is the cheapest (a, b) edge — which it is exactly
            # when contract_graph's min-dedup kept it; the edge table has
            # one row per (a, b), so the join is decisive
            splits = (
                hops.join(
                    via_map,
                    (F.col("vid") == F.col("a")) & (F.col("nvid") == F.col("b")),
                )
                .select(
                    "qsrc", "qdst", "cost",
                    ((F.col("pos") + F.col("npos")) / 2).alias("pos"),
                    F.col("via").alias("vid"),
                )
            )
            splits = trunc.truncate(splits, reap=False)
            if splits.limit(1).count() == 0:
                break
            rows = trunc.truncate(
                rows.unionByName(splits), reap=False
            )
    return (
        rows.groupBy("qsrc", "qdst", "cost")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "vid"))
            ).alias("_sv")
        )
        .select(
            F.col("qsrc").alias("src"), F.col("qdst").alias("dst"), "cost",
            F.transform(F.col("_sv"), lambda x: x["vid"]).alias("nodes"),
        )
    )
