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


def _ch_query_local(
    edges: DataFrame, levels: DataFrame, pairs: DataFrame, want_paths: bool
) -> DataFrame:
    """Broadcast-CH batched queries: when the CONTRACTED graph fits the
    localgraph edge cap (the defining property of a CH — even a
    continent's hierarchy is executor-memory-sized), broadcast its upward
    adjacency once and distribute the PAIRS table; each task answers its
    pairs with the textbook bidirectional upward Dijkstra (the reference's
    own per-query CHDijkstra, src/routing/dijkstra/mod.rs), caching the
    per-source/per-target sweeps within the task. Batch cost scales with
    the pair count and parallelism, carries ZERO per-round job overhead,
    and the big side (pairs) never collects anywhere. Tie-breaks mirror
    the BSP sweeps exactly: meeting vertex = argmin (cost, vid), pred =
    min (dist, pred), shortcut expansion through the min-deduped via.

    The broadcast is a struct-of-arrays CSR (vid table + up/down
    indptr/indices/weights + a sorted ``src*V+dst -> via`` key array),
    ~24 bytes/edge shared once per executor — not per-vertex Python
    dicts — so at the 1M-edge cap the hierarchy costs ~25 MB instead of
    ~50+ MB and ships/unpickles as flat buffers. Sweeps run in dense
    index space (vids sorted ascending, so index order == vid order and
    every vid tie-break is preserved verbatim); per-sweep state stays
    dict-based because an upward search settles only a few hundred
    vertices and the per-source cache must stay search-space-sized."""
    import heapq

    import numpy as np
    import pandas as pd

    spark = edges.sparkSession
    has_via = "via" in edges.columns
    cols = ["src", "dst", "w"] + (["via"] if has_via else [])
    epd = edges.select(*cols).toPandas()
    lpd = levels.select("vid", "level").toPandas()
    src = epd["src"].to_numpy(np.int64)
    dst = epd["dst"].to_numpy(np.int64)
    w = epd["w"].to_numpy(np.float64)
    lvid = lpd["vid"].to_numpy(np.int64)
    llev = lpd["level"].to_numpy(np.int64)
    vids = np.unique(np.concatenate([src, dst, lvid]))
    V = int(len(vids))
    lev = np.zeros(V, np.int64)  # vids absent from `levels` default to 0
    lev[np.searchsorted(vids, lvid)] = llev
    si = np.searchsorted(vids, src)
    di = np.searchsorted(vids, dst)
    la, lb = lev[si], lev[di]

    def _csr(a, b, ww):
        # neighbor lists ordered by (nbr, weight) like the dict tier's
        # adj[k].sort(); order only affects heap insertion, not results
        order = np.lexsort((ww, b, a))
        a, b, ww = a[order], b[order], ww[order]
        indptr = np.zeros(V + 1, np.int64)
        np.cumsum(np.bincount(a, minlength=V), out=indptr[1:])
        return indptr, b, ww

    um = lb >= la
    dm = la >= lb
    up_ptr, up_nbr, up_w = _csr(si[um], di[um], w[um])
    dn_ptr, dn_nbr, dn_w = _csr(di[dm], si[dm], w[dm])
    if has_via:
        vser = pd.to_numeric(epd["via"], errors="coerce")
        vnn = vser.notna().to_numpy()
        vkey = si[vnn] * np.int64(V) + di[vnn]
        vval = np.searchsorted(vids, vser.to_numpy(np.float64)[vnn].astype(np.int64))
        vorder = np.argsort(vkey)
        via_keys, via_vals = vkey[vorder], vval[vorder]
    else:
        via_keys = np.empty(0, np.int64)
        via_vals = np.empty(0, np.int64)
    bc = spark.sparkContext.broadcast(
        (vids, up_ptr, up_nbr, up_w, dn_ptr, dn_nbr, dn_w, via_keys, via_vals)
    )
    INF = float("inf")

    def run(batches):
        vida, uptr, unbr, uw, dptr, dnbr, dw, vkeys, vvals = bc.value
        nv = len(vida)
        fcache: dict = {}
        bcache: dict = {}

        def to_idx(v):
            i = int(np.searchsorted(vida, v))
            return i if i < nv and vida[i] == v else None

        def sweep(start, indptr, nbr, wt):
            dist = {start: 0.0}
            pred = {start: -1}
            pq = [(0.0, start)]
            while pq:
                d0, x = heapq.heappop(pq)
                if d0 > dist.get(x, INF):
                    continue
                lo, hi = int(indptr[x]), int(indptr[x + 1])
                for y, ew in zip(nbr[lo:hi].tolist(), wt[lo:hi].tolist()):
                    nd = d0 + ew
                    dy = dist.get(y, INF)
                    if nd < dy or (nd == dy and x < pred[y]):
                        dist[y] = nd
                        pred[y] = x
                        heapq.heappush(pq, (nd, y))
            return dist, pred

        def via_of(x, y):
            k = x * nv + y
            i = int(np.searchsorted(vkeys, k))
            return int(vvals[i]) if i < len(vkeys) and vkeys[i] == k else None

        def expand(nodes):
            res = [nodes[0]]
            for a, b in zip(nodes, nodes[1:]):
                seg = [(a, b)]
                while seg:
                    x, y = seg.pop()
                    v = via_of(x, y)
                    if v is None:
                        res.append(y)
                    else:
                        seg.append((v, y))
                        seg.append((x, v))
            return res

        for pdf in batches:
            out_s, out_d, out_c, out_n = [], [], [], []
            for s0, t0 in zip(
                pdf["src"].astype("int64").tolist(),
                pdf["dst"].astype("int64").tolist(),
            ):
                s, t = to_idx(s0), to_idx(t0)
                if s is None or t is None:
                    # vid outside the hierarchy: isolated, reachable only
                    # from itself (the dict tier's implicit behavior)
                    if s0 == t0:
                        out_s.append(s0)
                        out_d.append(t0)
                        out_c.append(0.0)
                        if want_paths:
                            out_n.append([s0])
                    continue
                if s not in fcache:
                    fcache[s] = sweep(s, uptr, unbr, uw)
                if t not in bcache:
                    bcache[t] = sweep(t, dptr, dnbr, dw)
                fd, fp = fcache[s]
                bd, bp = bcache[t]
                small, big = (fd, bd) if len(fd) <= len(bd) else (bd, fd)
                best = (INF, -1)
                for v, dv in small.items():
                    ov = big.get(v)
                    if ov is not None and (dv + ov, v) < best:
                        best = (dv + ov, v)
                cost, meet = best
                if meet < 0:
                    continue
                out_s.append(s0)
                out_d.append(t0)
                out_c.append(cost)
                if want_paths:
                    chain = [meet]
                    cur = meet
                    while cur != s:
                        cur = fp[cur]
                        chain.append(cur)
                    chain.reverse()
                    cur = meet
                    while cur != t:
                        cur = bp[cur]
                        chain.append(cur)
                    out_n.append(vida[expand(chain)].tolist())
            if not out_s:
                continue
            cols = {"src": out_s, "dst": out_d, "cost": out_c}
            if want_paths:
                cols["nodes"] = out_n
            yield pd.DataFrame(cols)

    schema = "src long, dst long, cost double" + (
        ", nodes array<long>" if want_paths else ""
    )
    return pairs.select("src", "dst").distinct().mapInPandas(run, schema)


def ch_route_costs(
    edges: DataFrame,
    levels: DataFrame,
    pairs: DataFrame,
    max_iter: int = 64,
    local_cap: int | None = None,
) -> DataFrame:
    """Batched CH point queries: ``pairs`` (src, dst) → (src, dst, cost)
    keeping only pairs with a real path (the reference generator's
    contract, random_or_all.rs:32-158). ``edges`` = (src, dst, w) of the
    CONTRACTED graph (original + shortcut edges); ``levels`` = (vid,
    level) contraction levels. ``max_iter`` is a floor: the real bound is
    derived from the level table (one scalar aggregate), so a deep
    hierarchy converges instead of tripping the sweep's unsettled-state
    guard. Below the localgraph edge cap the batch runs on the
    broadcast-CH path instead (_ch_query_local; ``local_cap`` overrides,
    0 forces the BSP sweeps)."""
    spark = edges.sparkSession
    from .localgraph import LOCAL_EDGE_CAP

    e_cap = LOCAL_EDGE_CAP if local_cap is None else local_cap
    if e_cap > 0 and edges.limit(e_cap + 1).count() <= e_cap:
        return _ch_query_local(edges, levels, pairs, want_paths=False)
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


#: witness-search budget per contracted-vertex in-neighbor: Dijkstra pops
#: before giving up and inserting the shortcut anyway. Truncation is
#: correctness-NEUTRAL (an unnecessary shortcut still carries a real path
#: cost; only a MISSING one would be wrong), so the cap trades CH-edge
#: count against construction time — the classic bounded-witness trade.
WITNESS_POPS = 256


def _edge_key(w: float, via: int | None) -> tuple:
    """Min-dedup order for parallel CH edges: cheapest wins; at equal cost
    an ORIGINAL edge (via=None) beats a shortcut — fewer expansions. The
    python mirror of _min_edge's nulls-first struct ordering."""
    return (w, via is not None, -1 if via is None else via)


def _needed_shortcuts(ins, outs, nbr, pops_budget: int = WITNESS_POPS):
    """Bounded witness search around ONE contracted vertex v (already
    excluded from ``nbr``): the recipe of the reference's external
    constructor's one-to-many searches (/root/reference/src/
    multi_ch_constructor/mod.rs:11-88).

    ins = [(u, cu)] in-neighbors, outs = [(t, ct)] out-neighbors,
    nbr(x) → iterable of (y, wy) over the witness subgraph (v excluded;
    the caller decides how wide that subgraph is — the single-task tier
    passes the full active graph, the BSP rounds pass the 1-hop induced
    neighborhood of v, which only UNDERESTIMATES witnesses: a missed one
    inserts a redundant shortcut, never a wrong distance).

    → [(u, t, cu + ct)] for pairs with NO witness path of cost ≤ cu + ct
    found within ``pops_budget`` settles per source."""
    import heapq

    INF = float("inf")
    ins = sorted(ins)
    outs = sorted(outs)
    need = []
    for u, cu in ins:
        targets = {t for t, _ in outs if t != u}
        if not targets:
            continue
        budget = cu + max(ct for t, ct in outs if t != u)
        dist = {u: 0.0}
        pq = [(0.0, u)]
        pops = 0
        found = {}
        while pq and pops < pops_budget and targets:
            d, x = heapq.heappop(pq)
            if d > dist.get(x, INF) or d > budget:
                continue
            pops += 1
            if x in targets:
                found[x] = d
                targets.discard(x)
            for y, cy in nbr(x):
                nd = d + cy
                if nd <= budget and nd < dist.get(y, INF):
                    dist[y] = nd
                    heapq.heappush(pq, (nd, y))
        for t, ct in outs:
            if t == u:
                continue
            via_cost = cu + ct
            wd = found.get(t, dist.get(t, INF))
            if wd > via_cost:  # no witness (or search truncated)
                need.append((u, t, via_cost))
    return need


def _contract_sequential(vids, edge_rows):
    """Single-machine CH construction: lazy edge-difference ordering +
    bounded witness search — the recipe of the reference's external
    multi-ch-constructor (/root/reference/src/multi_ch_constructor/
    mod.rs:11-88, which osmgraphing shells out to), in pure python over a
    tiny graph. → ({(src, dst): (w, via)}, {vid: level}).

    - priority(v) = 3·#needed-shortcuts + #contracted-neighbors +
      dependency-depth — the Geisberger-style weighted term mix,
      recomputed lazily on pop (push back if it rose above the new top).
      Weights were swept on the reference's isle_of_man fixture (kmph
      weights): 112,511 CH edges / max level 35, vs 132,748 / 114 for
      plain edge-difference, 116,998 / 68 for the witness-free BSP
      rounds, and 110,619 for the reference's external (multi-metric)
      constructor;
    - a shortcut u→v→w is SKIPPED when a bounded Dijkstra from u avoiding
      v finds a witness path with cost ≤ the shortcut within WITNESS_POPS
      settles — truncation inserts the shortcut (safe direction);
    - level(v) = dependency depth: 1 + max level over already-contracted
      vertices that were adjacent to v when contracted. Along any CH edge
      the earlier-contracted endpoint then has a STRICTLY smaller level
      (the edge was active at its contraction), so level order refines
      contraction order exactly as the BSP rounds do and the upward-sweep
      hop bound stays #levels, not |V|."""
    import heapq

    INF = float("inf")
    fwd: dict = {v: {} for v in vids}
    bwd: dict = {v: {} for v in vids}
    ch: dict = {}

    def add_edge(a, b, w, via):
        k = _edge_key(w, via)
        if (a, b) not in ch or k < _edge_key(*ch[(a, b)]):
            ch[(a, b)] = (w, via)
        if b not in fwd[a] or k < _edge_key(*fwd[a][b]):
            fwd[a][b] = (w, via)
            bwd[b][a] = (w, via)

    for row in edge_rows:
        # 3-tuples = original edges; 4-tuples carry prior shortcut
        # provenance (the BSP → single-task handoff contracts an active
        # graph whose edges may already be shortcuts)
        a, b, w = row[0], row[1], row[2]
        via0 = row[3] if len(row) > 3 else None
        if a != b:
            add_edge(a, b, w, via0)

    active = set(vids)

    def simulate(v):
        """→ needed shortcuts [(u, w, cost)] under the witness search
        (shared bounded-Dijkstra core, full active graph as the witness
        subgraph)."""
        ins = [
            (u, c) for u, (c, _) in bwd[v].items() if u in active and u != v
        ]
        outs = [
            (t, c) for t, (c, _) in fwd[v].items() if t in active and t != v
        ]

        def nbr(x):
            return (
                (y, cy)
                for y, (cy, _) in fwd[x].items()
                if y != v and y in active
            )

        return _needed_shortcuts(ins, outs, nbr)

    heap = [(0, v) for v in sorted(vids)]
    heapq.heapify(heap)
    pend = {v: 1 for v in vids}
    dn = {v: 0 for v in vids}  # contracted-neighbor counts
    levels: dict = {}
    while heap:
        _, v = heapq.heappop(heap)
        if v not in active:
            continue
        need = simulate(v)
        key = 3 * len(need) + dn[v] + pend[v] - 1
        if heap and (key, v) > heap[0]:
            heapq.heappush(heap, (key, v))
            continue
        lv = pend[v]
        levels[v] = lv
        active.discard(v)
        for nb in set(bwd[v]) | set(fwd[v]):
            if nb in active:
                dn[nb] += 1
                if pend[nb] <= lv:
                    pend[nb] = lv + 1
        for u, t, cost in need:
            add_edge(u, t, cost, v)
    return ch, levels


def _contract_local(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """contract_graph's single-task fast path (the localgraph pattern):
    one mapInPandas task runs _contract_sequential executor-side and emits
    edge rows and level rows through one combined frame (dst NULL marks a
    level row), truncated once so both outputs read parquet."""
    import pandas as pd

    spark = edges.sparkSession
    has_via = "via" in edges.columns
    rows = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long"),
        F.col("w").cast("double"),
        *([F.col("via").cast("double")] if has_via else []),
    )

    def run(batches):
        srcs, dsts, ws, vias = [], [], [], []
        for pdf in batches:
            srcs.append(pdf["src"])
            dsts.append(pdf["dst"])
            ws.append(pdf["w"])
            if has_via:
                vias.append(pdf["via"])
        if not srcs:
            return
        s = pd.concat(srcs).astype("int64").tolist()
        d = pd.concat(dsts).astype("int64").tolist()
        w = pd.concat(ws).astype("float64").tolist()
        if has_via:
            vv = [
                None if pd.isna(x) else int(x)
                for x in pd.concat(vias).tolist()
            ]
            edge_iter = zip(s, d, w, vv)
        else:
            edge_iter = zip(s, d, w)
        vids = sorted(set(s) | set(d))
        ch, levels = _contract_sequential(vids, edge_iter)
        ks = sorted(ch)
        out = pd.DataFrame(
            {
                "src": [a for a, _ in ks] + sorted(levels),
                "dst": [b for _, b in ks] + [None] * len(levels),
                "w": [ch[k][0] for k in ks] + [None] * len(levels),
                "via": [ch[k][1] for k in ks] + [None] * len(levels),
                "level": [None] * len(ks) + [levels[v] for v in sorted(levels)],
            }
        )
        yield out

    combined = EphemeralTruncator(spark, "ch-local").truncate(
        rows.coalesce(1).mapInPandas(
            run, "src long, dst long, w double, via long, level long"
        )
    )
    ch_edges = combined.where(F.col("dst").isNotNull()).select(
        "src", "dst", "w", "via"
    )
    lv = combined.where(F.col("dst").isNull()).select(
        F.col("src").alias("vid"), "level"
    )
    return ch_edges, lv


def _witnessed_round_shortcuts(
    active: DataFrame,
    und: DataFrame,
    s_set: DataFrame,
    ins: DataFrame,
    outs: DataFrame,
) -> DataFrame:
    """One BSP round's shortcut candidates, witness-pruned — → (src, dst,
    w, via) needing insertion.

    For every v in the independent set S, gather v's star (ins/outs, from
    the caller's joins) plus the active edges among v's neighbors (the
    1-hop induced neighborhood: und(v, x) pairs joined onto both endpoints
    of the active edge table), then ONE ``applyInPandas`` group per v runs
    the same bounded witness Dijkstra as the single-task tier
    (``_needed_shortcuts``). Independence guarantees no neighbor is in S,
    so every witness edge survives the round and the distance-preservation
    induction is exact; restricting witnesses to N(v) only errs toward
    inserting a redundant (real-cost) shortcut.

    Shuffle cost per round: Σ_v (deg(v) + |E(N(v))|) rows into the groupBy
    — bounded-degree graphs keep this linear in the active edge count, and
    the hub-last edge-difference priority plus ``max_wedge_degree`` guard
    bound the worst group."""
    import pandas as pd

    nv = und.join(s_set.withColumnRenamed("vid", "src"), "src").select(
        F.col("src").alias("v"), F.col("dst").alias("x")
    )
    wge = (
        active.select("src", "dst", "w")
        .join(nv.select("v", F.col("x").alias("src")), "src")
        .join(nv.select("v", F.col("x").alias("dst")), ["v", "dst"])
        .select("v", "src", "dst", "w")
    )
    g_in = ins.select(
        "v", F.col("u").alias("a"), F.lit(-1).cast("long").alias("b"),
        F.col("w1").alias("w"), F.lit(0).alias("kind"),
    )
    g_out = outs.select(
        "v", F.lit(-1).cast("long").alias("a"), F.col("wv").alias("b"),
        F.col("w2").alias("w"), F.lit(1).alias("kind"),
    )
    g_wit = wge.select(
        "v", F.col("src").alias("a"), F.col("dst").alias("b"), "w",
        F.lit(2).alias("kind"),
    )
    grp = g_in.unionByName(g_out).unionByName(g_wit)

    def gen(key, pdf: pd.DataFrame):
        v = int(key[0])
        k = pdf["kind"].to_numpy()
        a = pdf["a"].to_numpy()
        b = pdf["b"].to_numpy()
        w = pdf["w"].to_numpy()
        ins_l = list(zip((int(x) for x in a[k == 0]), (float(x) for x in w[k == 0])))
        outs_l = list(zip((int(x) for x in b[k == 1]), (float(x) for x in w[k == 1])))
        adj: dict = {}
        for x, y, wy in zip(a[k == 2], b[k == 2], w[k == 2]):
            adj.setdefault(int(x), []).append((int(y), float(wy)))
        need = _needed_shortcuts(ins_l, outs_l, lambda x: adj.get(x, ()))
        if not need:
            return pd.DataFrame(
                {"src": pd.Series(dtype="int64"), "dst": pd.Series(dtype="int64"),
                 "w": pd.Series(dtype="float64"), "via": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(
            {
                "src": [u for u, _, _ in need],
                "dst": [t for _, t, _ in need],
                "w": [c for _, _, c in need],
                "via": v,
            }
        )

    return grp.groupBy("v").applyInPandas(
        gen, "src long, dst long, w double, via long"
    )


def contract_graph(
    edges: DataFrame,
    max_rounds: int = 200,
    seed: int = 42,
    max_wedge_degree: int | None = None,
    local_cap: int | None = None,
    witness: bool = True,
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
    - contracting v inserts the (u→v→w) shortcuts that SURVIVE a bounded
      witness search (``witness=True``, the default): each round gathers
      v's in/out star plus the active edges among its neighbors (the
      1-hop induced neighborhood — no member of the independent set can
      appear in it, so every witness edge survives the round) and one
      ``applyInPandas`` task per contracted vertex runs the same bounded
      Dijkstra as the single-task tier (``_needed_shortcuts``). The
      restricted witness subgraph only UNDERESTIMATES witnesses, which is
      the safe direction: a missed witness inserts a redundant shortcut
      carrying a real path cost, never a wrong distance — the textbook
      distance-preservation induction holds exactly as in the
      witness-free variant (``witness=False``, which inserts ALL wedge
      shortcuts via the pure-SQL join).
    - when the active graph shrinks below the localgraph edge cap
      mid-rounds, construction HANDS OFF to the single-task witnessed
      contractor (level-offset by the current round): the late dense core
      — where witness-free fill explodes and per-round Spark fixed costs
      dominate — contracts with full-graph witness searches in one task,
      while the scale-out rounds only ever handle the graph too big for
      one task. Provenance (``via``) of surviving shortcuts rides through
      the handoff.
    - edge-difference-first priority (in·out − in − out, the witness-free
      fill-in estimate; degree tie-break) contracts low-fill vertices
      first and hubs LAST (a hub is never a local minimum while any
      lower-fill neighbor lives), which bounds the deg² shortcut fan-in
      the same way the wedge-join caps do elsewhere.
    - same-round vertices are never adjacent when contracted, so the
      query's ``level(head) >= level(tail)`` tie handling is safe.

    Per round: one degree aggregate, one local-min join, one v-keyed
    wedge self-join for shortcuts, one min-dedup — all map-side-combined
    DataFrame ops; rounds shrink the active graph geometrically on
    sparse graphs (MIS-style), so ~O(log V) supersteps.

    Below the localgraph edge cap the construction runs instead as ONE
    executor task with lazy edge-difference ordering AND a real bounded
    witness search (_contract_sequential) — the same single-machine
    architecture the reference itself uses for this step (it shells out
    to the external multi-ch-constructor; README 'CHConstructor'), and
    strictly fewer shortcuts than the witness-free BSP rounds.
    ``local_cap`` overrides the threshold (0 forces the BSP path)."""
    spark = edges.sparkSession
    from .localgraph import LOCAL_EDGE_CAP

    e_cap = LOCAL_EDGE_CAP if local_cap is None else local_cap
    if e_cap > 0 and edges.limit(e_cap + 1).count() <= e_cap:
        return _contract_local(edges)
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

    handoff_levels = None
    with iterative_conf(spark):
        for rnd in range(1, max_rounds + 1):
            # handoff probe: one bounded count — empty graph ends the
            # loop; a graph small enough for one task finishes in the
            # witnessed single-task tier at a level offset of rnd-1
            n_act = active.limit(max(e_cap, 0) + 1).count()
            if n_act == 0:
                break
            if 0 < n_act <= e_cap:
                local_edges, local_lv = _contract_local(active)
                handoff_levels = local_lv.select(
                    "vid", (F.col("level") + F.lit(rnd - 1)).alias("level")
                )
                all_edges.append(local_edges)
                break
            und = active.select("src", "dst").unionByName(
                active.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                )
            ).distinct()
            # priority = struct(edge difference, degree, salted hash, vid):
            # EXACT lexicographic comparison (a packed double would
            # overflow the 53-bit mantissa and manufacture ties, which can
            # deadlock the local-min selection); vid makes the order
            # strictly total. Edge difference (in·out − in − out = the
            # witness-free shortcut fill minus removed edges) is the
            # literature-standard ordering — it contracts low-fill
            # vertices first and hubs (huge in·out) last, cutting both the
            # shortcut count and the round count vs degree-only; degree
            # stays as the first tie-break and still feeds the wedge guard.
            outd = active.groupBy("src").agg(F.count("*").alias("od"))
            ind = active.groupBy("dst").agg(F.count("*").alias("idg"))
            dd = (
                und.select(F.col("src").alias("vid"))
                .distinct()
                .join(outd.withColumnRenamed("src", "vid"), "vid", "left")
                .join(ind.withColumnRenamed("dst", "vid"), "vid", "left")
                .select(
                    "vid",
                    F.coalesce("od", F.lit(0)).alias("od"),
                    F.coalesce("idg", F.lit(0)).alias("idg"),
                )
            )
            pri = dd.select(
                "vid",
                F.struct(
                    (
                        F.col("od") * F.col("idg") - F.col("od") - F.col("idg")
                    ).alias("_ed"),
                    (F.col("od") + F.col("idg")).alias("_d"),
                    F.pmod(
                        F.xxhash64(F.col("vid"), F.lit(seed)), F.lit(2**61)
                    ).alias("_h"),
                    F.col("vid").alias("_v"),
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
            if witness:
                raw_shortcuts = _witnessed_round_shortcuts(
                    active, und, s_set, ins, outs
                )
            else:
                raw_shortcuts = (
                    ins.join(outs, "v")
                    .where(F.col("u") != F.col("wv"))
                    .select(
                        F.col("u").alias("src"), F.col("wv").alias("dst"),
                        (F.col("w1") + F.col("w2")).alias("w"),
                        F.col("v").alias("via"),
                    )
                )
            # materialize this round's shortcuts to their own parquet step
            # (reap=False): the final union reads every round's file, and
            # the active-frame truncations below delete the active parquet
            # these lazy wedge joins would otherwise still be scanning
            shortcuts = trunc_s.truncate(_min_edge(raw_shortcuts), reap=False)
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
    if handoff_levels is not None:
        levels = trunc_l.truncate(levels.unionByName(handoff_levels))
    # vertices still uncontracted when the edges ran out OUTLIVED every
    # neighbor — in contraction order they come last, so they take the
    # HIGHEST level (a low level here would break the up-down property of
    # paths ending at them); truly isolated vertices ride along harmlessly
    vs = (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )
    if handoff_levels is not None:
        # the handoff's local levels extend past rnd — the uncontracted
        # top must clear them too
        top = int(
            levels.agg(F.coalesce(F.max("level"), F.lit(0))).collect()[0][0]
        ) + 1
    else:
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
    local_cap: int | None = None,
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
    level table (``_sweep_depth``) so deep hierarchies converge. Below
    the localgraph edge cap the batch runs on the broadcast-CH path
    instead (_ch_query_local; ``local_cap`` overrides, 0 forces the BSP
    sweeps)."""
    spark = edges.sparkSession
    from .localgraph import LOCAL_EDGE_CAP

    e_cap = LOCAL_EDGE_CAP if local_cap is None else local_cap
    if e_cap > 0 and edges.limit(e_cap + 1).count() <= e_cap:
        return _ch_query_local(edges, levels, pairs, want_paths=True)
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
