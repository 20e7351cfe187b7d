"""Single-task fast paths for TINY graphs.

The BSP fixpoints (scc trim/color/mark, toposort relaxation, the bowtie
composition of SCC + 4 BFS + WCC) pay a fixed per-ACTION job cost (~0.3 s
on the bench box) regardless of data size: a 25-vertex SCC run is ~100
actions of pure scheduling overhead (BENCH_r03: scc_nations 33.6 s).

When the graph fits one shuffle partition (≤ LOCAL_VERTEX_CAP vertices
and ≤ LOCAL_EDGE_CAP edges — a few MB of longs), these helpers compute
the same answers in ONE Spark task: the edge list is coalesced to a
single partition and a mapInPandas task runs the textbook sequential
algorithm EXECUTOR-side (never on the driver — the binary rows stay in
the worker, and on a real cluster the task schedules like any other).
Labels match the BSP operators exactly (scc/component = min member vid,
layer = longest root path, identical bowtie set algebra), so the
DuckDB-oracle gates are unchanged; tests run both paths against each
other on random digraphs.

At scale nothing changes: callers take this path only below the caps,
which are sized so the one task's footprint stays a few MB; everything
above runs the distributed BSP loops.
"""

from __future__ import annotations

from collections import Counter, defaultdict, deque
from typing import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: one-partition rule of thumb (matches scc._scc's 250k rows/partition);
#: the edge cap bounds the single task's python adjacency footprint
LOCAL_VERTEX_CAP = 250_000
LOCAL_EDGE_CAP = 1_000_000


def _single_task(
    edges: DataFrame,
    vertices: DataFrame | None,
    fn: Callable[[set, list], pd.DataFrame],
    schema: str,
) -> DataFrame:
    """Run ``fn(vids, edge_pairs)`` in one executor task over the whole
    (tiny) graph: vertex-universe rows ride along as (vid, NULL)
    sentinels so the task sees isolated vertices too."""
    rows = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    )
    if vertices is not None:
        rows = rows.unionByName(
            vertices.select(
                F.col(vertices.columns[0]).cast("long").alias("src"),
                F.lit(None).cast("long").alias("dst"),
            )
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        srcs, dsts = [], []
        for pdf in batches:
            srcs.append(pdf["src"])
            dsts.append(pdf["dst"])
        if not srcs:
            return
        s, d = pd.concat(srcs), pd.concat(dsts)
        sentinel = d.isna()
        vids = set(s[sentinel].astype("int64").tolist())
        ea = s[~sentinel].astype("int64").tolist()
        eb = d[~sentinel].astype("int64").tolist()
        vids.update(ea)
        vids.update(eb)
        out = fn(vids, list(zip(ea, eb)))
        if len(out):
            yield out

    return rows.coalesce(1).mapInPandas(run, schema)


def _tarjan_min_labels(vids: Iterable[int], edges: list) -> dict:
    """Iterative Tarjan SCC; label = min vid of the component (the same
    deterministic labeling as the BSP scc operator)."""
    adj: dict = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, []).append(b)
    index: dict = {}
    low: dict = {}
    on: set = set()
    stack: list = []
    comp: dict = {}
    counter = 0
    for root in vids:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on.add(v)
            recurse = False
            nbrs = adj.get(v, ())
            while pi < len(nbrs):
                w = nbrs[pi]
                pi += 1
                work[-1] = (v, pi)
                if w not in index:
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on.discard(w)
                    members.append(w)
                    if w == v:
                        break
                m = min(members)
                for w in members:
                    comp[w] = m
            work.pop()
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
    return comp


def local_scc(edges: DataFrame, vertices: DataFrame | None) -> DataFrame:
    """→ (vid long, scc long), scc = min vid of the component."""

    def fn(vids: set, epairs: list) -> pd.DataFrame:
        comp = _tarjan_min_labels(sorted(vids), epairs)
        ks = sorted(comp)
        return pd.DataFrame({"vid": ks, "scc": [comp[v] for v in ks]})

    return _single_task(edges, vertices, fn, "vid long, scc long")


def local_toposort(edges: DataFrame, vertices: DataFrame | None) -> DataFrame:
    """→ (id long, layer long): longest path from any in-degree-0 root
    (Kahn order + max-relaxation). Vertices stuck on or behind a cycle
    come back with layer = -1 — the CALLER must raise on those (the BSP
    path's cycle detection contract)."""

    def fn(vids: set, epairs: list) -> pd.DataFrame:
        adj: dict = {}
        indeg = {v: 0 for v in vids}
        for a, b in epairs:
            if a != b:
                adj.setdefault(a, []).append(b)
                indeg[b] += 1
        layer = {v: 0 for v in vids}
        q = deque(sorted(v for v in vids if indeg[v] == 0))
        while q:
            v = q.popleft()
            for w in adj.get(v, ()):
                if layer[v] + 1 > layer[w]:
                    layer[w] = layer[v] + 1
                indeg[w] -= 1
                if indeg[w] == 0:
                    q.append(w)
        for v in vids:
            if indeg[v] > 0:  # on, or strictly behind, a cycle
                layer[v] = -1
        ks = sorted(layer)
        return pd.DataFrame({"id": ks, "layer": [layer[v] for v in ks]})

    return _single_task(edges, vertices, fn, "id long, layer long")


def local_bowtie(edges: DataFrame) -> DataFrame:
    """→ (vid long, region string): the Broder decomposition with exactly
    graphstats.bowtie's set algebra (CORE / IN / OUT / TUBE / TENDRIL /
    OTHER / DISC, core = largest SCC with min-label tie-break)."""

    def fn(vids: set, epairs: list) -> pd.DataFrame:
        comp = _tarjan_min_labels(sorted(vids), epairs)
        sizes = Counter(comp.values())
        core_label = min(sizes, key=lambda c: (-sizes[c], c))
        core = {v for v, c in comp.items() if c == core_label}
        fwd: dict = defaultdict(list)
        bwd: dict = defaultdict(list)
        und: dict = defaultdict(list)
        for a, b in epairs:
            if a != b:
                fwd[a].append(b)
                bwd[b].append(a)
                und[a].append(b)
                und[b].append(a)

        def reach(seeds: set, adjm: dict) -> set:
            seen = set(seeds)
            q = deque(seeds)
            while q:
                v = q.popleft()
                for w in adjm.get(v, ()):
                    if w not in seen:
                        seen.add(w)
                        q.append(w)
            return seen

        outs = reach(core, fwd) - core
        ins = reach(core, bwd) - core - outs
        classified = core | ins | outs
        t_fwd = reach(ins, fwd) - classified
        t_bwd = reach(outs, bwd) - classified
        tube = t_fwd & t_bwd
        tendril = (t_fwd | t_bwd) - tube
        same_wcc = reach(core, und)
        rows = []
        for v in sorted(vids):
            if v in core:
                r = "CORE"
            elif v in ins:
                r = "IN"
            elif v in outs:
                r = "OUT"
            elif v in tube:
                r = "TUBE"
            elif v in tendril:
                r = "TENDRIL"
            elif v in same_wcc:
                r = "OTHER"
            else:
                r = "DISC"
            rows.append((v, r))
        return pd.DataFrame(rows, columns=["vid", "region"])

    return _single_task(edges, None, fn, "vid long, region string")


#: multi-source sweeps do |sources| × |E| python work in the single task;
#: bound the PRODUCT, not just the edge count (4096 exact-mode pivots on
#: a 1M-edge graph is 4G python ops — that belongs to the BSP loops)
LOCAL_WORK_CAP = 8_000_000


def local_sssp(
    edges_w: DataFrame, sources, with_pred: bool = False
) -> DataFrame:
    """(src, dst, w) + pivot list → (source, vid, dist[, pred]) via ONE
    executor task of multi-source Dijkstra (nonnegative weights — the
    caller guards). Semantics mirror sssp.run exactly: unreachable pairs
    absent, pred = -1 on source rows, ties broken min-(dist, pred) — at
    equal dist every candidate parent u with dist(u)+w(u,v) == dist(v)
    competes and the smallest wins, the same winner as the BSP min-merge
    over all relaxation candidates."""
    import heapq

    srcs = list(dict.fromkeys(int(s) for s in sources))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frames = list(batches)
        if not frames:
            return
        pdf = pd.concat(frames)
        adj: dict = {}
        for a, b, w in zip(
            pdf["src"].astype("int64").tolist(),
            pdf["dst"].astype("int64").tolist(),
            pdf["w"].astype("float64").tolist(),
        ):
            adj.setdefault(a, []).append((b, w))
        INF = float("inf")
        out_s, out_v, out_d, out_p = [], [], [], []
        for s in srcs:
            dist = {s: 0.0}
            pred = {s: -1}
            pq = [(0.0, s)]
            while pq:
                d0, x = heapq.heappop(pq)
                if d0 > dist.get(x, INF):
                    continue
                for y, w in adj.get(x, ()):
                    nd = d0 + w
                    dy = dist.get(y, INF)
                    if nd < dy or (nd == dy and x < pred[y]):
                        dist[y] = nd
                        pred[y] = x
                        heapq.heappush(pq, (nd, y))
            for v in sorted(dist):
                out_s.append(s)
                out_v.append(v)
                out_d.append(dist[v])
                out_p.append(pred[v])
        yield pd.DataFrame(
            {"source": out_s, "vid": out_v, "dist": out_d, "pred": out_p}
        )

    out = (
        edges_w.select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            F.col("w").cast("double"),
        )
        .coalesce(1)
        .mapInPandas(run, "source long, vid long, dist double, pred long")
    )
    return out if with_pred else out.select("source", "vid", "dist")


def local_betweenness(edges: DataFrame, sources) -> DataFrame:
    """(src, dst) digraph + pivots → (vid, betweenness) raw scores via
    ONE executor task of textbook Brandes (forward BFS σ counting +
    descending-level δ accumulation). Mirrors operators/betweenness
    exactly: self-loops dropped, edges deduped, pivot endpoint terms
    (vid == source) excluded, only rows with score > 0 emitted."""
    srcs = sorted(dict.fromkeys(int(s) for s in sources))

    def fn(vids: set, epairs: list) -> pd.DataFrame:
        adj: dict = {}
        for a, b in sorted(set(epairs)):
            if a != b:
                adj.setdefault(a, []).append(b)
        score: dict = {}
        for s in srcs:
            preds: dict = {}
            sigma = {s: 1.0}
            dist = {s: 0}
            order = []
            q = deque([s])
            while q:
                v = q.popleft()
                order.append(v)
                for w in adj.get(v, ()):
                    if w not in dist:
                        dist[w] = dist[v] + 1
                        q.append(w)
                    if dist[w] == dist[v] + 1:
                        sigma[w] = sigma.get(w, 0.0) + sigma[v]
                        preds.setdefault(w, []).append(v)
            delta: dict = {}
            for w in reversed(order):
                for v in preds.get(w, ()):
                    delta[v] = delta.get(v, 0.0) + sigma[v] / sigma[w] * (
                        1.0 + delta.get(w, 0.0)
                    )
            for v, d in delta.items():
                if v != s:
                    score[v] = score.get(v, 0.0) + d
        ks = sorted(v for v, d in score.items() if d > 0)
        return pd.DataFrame(
            {"vid": ks, "betweenness": [score[v] for v in ks]}
        )

    return _single_task(edges, None, fn, "vid long, betweenness double")


def local_truss(edges: DataFrame, k: int, rounds: int | None) -> DataFrame:
    """→ (a, b, support): k-truss triangle-support peeling in ONE task,
    mirroring operators/truss exactly — canonical (a<b) simple view, per
    round drop edges with support < k−2, stop at the fixpoint or after
    ``rounds`` filter steps (peeling is idempotent at the fixpoint, so
    early convergence under a larger budget is identical), and the
    reported support is recomputed INSIDE the surviving subgraph."""

    def support(live: set) -> dict:
        adj: dict = defaultdict(set)
        for a, b in live:
            adj[a].add(b)
            adj[b].add(a)
        sup = {e: 0 for e in live}
        for a, b in live:
            for c in adj[a] & adj[b]:
                sup[(a, b)] += 1
        return sup

    def fn(vids: set, epairs: list) -> pd.DataFrame:
        live = {(min(a, b), max(a, b)) for a, b in epairs if a != b}
        r = 0
        while live and (rounds is None or r < rounds):
            sup = support(live)
            new = {e for e in live if sup[e] >= k - 2}
            r += 1
            if new == live:
                break
            live = new
        sup = support(live)
        ks = sorted(live)
        return pd.DataFrame(
            {
                "a": [a for a, _ in ks],
                "b": [b for _, b in ks],
                "support": [sup[e] for e in ks],
            }
        )

    return _single_task(edges, None, fn, "a long, b long, support long")


def local_msf(canon: DataFrame) -> DataFrame:
    """→ (u, v, w): the minimum spanning forest of a CANONICAL (u < v,
    min-w-deduped) undirected edge frame in ONE task — Kruskal under the
    same total order (w, u, v) that makes Borůvka's output unique, so
    both algorithms produce the identical forest."""
    import pandas as pd  # noqa: F811 (closure clarity)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frames = list(batches)
        if not frames:
            return
        pdf = pd.concat(frames)
        rows = sorted(
            zip(
                pdf["w"].astype("float64").tolist(),
                pdf["u"].astype("int64").tolist(),
                pdf["v"].astype("int64").tolist(),
            )
        )
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        out_u, out_v, out_w = [], [], []
        for w, u, v in rows:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
                out_u.append(u)
                out_v.append(v)
                out_w.append(w)
        yield pd.DataFrame({"u": out_u, "v": out_v, "w": out_w})

    return (
        canon.select(
            F.col("u").cast("long"), F.col("v").cast("long"),
            F.col("w").cast("double"),
        )
        .coalesce(1)
        .mapInPandas(run, "u long, v long, w double")
    )
