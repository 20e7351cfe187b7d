"""Pure-Python/numpy oracles — the role of the reference's hand-computed
golden tables (/root/reference/tests/small/routing/shortest.rs:95-180):
independent implementations the engine must agree with
(PageRank allclose 1e-6; CC/LPA/triangles exact)."""

from __future__ import annotations

import numpy as np


def pagerank(
    n: int,
    edges: list[tuple[int, int]],
    damping: float = 0.85,
    tol: float = 1e-12,
    max_iter: int = 10_000,
    weights: list[float] | None = None,
    weighted: bool = False,
) -> np.ndarray:
    """Power iteration, float64, dangling mass redistributed uniformly."""
    r = np.full(n, 1.0 / n)
    out_deg = np.zeros(n)
    out_wsum = np.zeros(n)
    w = np.asarray(weights if weights is not None else [1.0] * len(edges))
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    np.add.at(out_deg, src, 1.0)
    np.add.at(out_wsum, src, w)
    cfac = (w / out_wsum[src]) if weighted else (1.0 / out_deg[src])
    dangling = out_deg == 0
    for _ in range(max_iter):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, r[src] * cfac)
        dm = r[dangling].sum()
        r_new = (1 - damping) / n + damping * (contrib + dm / n)
        if np.max(np.abs(r_new - r)) < tol:
            return r_new
        r = r_new
    return r


def personalized_pagerank(
    n: int,
    edges: list[tuple[int, int]],
    p: "np.ndarray",
    damping: float = 0.85,
    tol: float = 1e-12,
    max_iter: int = 10_000,
) -> np.ndarray:
    """Power iteration with teleport distribution p (restart AND dangling
    mass both land on p)."""
    r = np.asarray(p, dtype=np.float64).copy()
    out_deg = np.zeros(n)
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    np.add.at(out_deg, src, 1.0)
    cfac = 1.0 / out_deg[src]
    dangling = out_deg == 0
    for _ in range(max_iter):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, r[src] * cfac)
        dm = r[dangling].sum()
        r_new = p * ((1 - damping) + damping * dm) + damping * contrib
        if np.max(np.abs(r_new - r)) < tol:
            return r_new
        r = r_new
    return r


def connected_components(n: int, edges: list[tuple[int, int]]) -> np.ndarray:
    """Union-find; label = min vertex id in component (undirected view)."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return np.array([find(i) for i in range(n)], dtype=np.int64)


def label_propagation(
    n: int, edges: list[tuple[int, int]], max_iter: int = 20
) -> np.ndarray:
    """Synchronous LPA over the undirected simple neighbor relation;
    most-frequent neighbor label, ties → smallest label. Matches the
    engine's semantics exactly (vertices with no neighbors keep their label)."""
    nbrs: list[set[int]] = [set() for _ in range(n)]
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    labels = np.arange(n, dtype=np.int64)
    for _ in range(max_iter):
        new = labels.copy()
        for v in range(n):
            if not nbrs[v]:
                continue
            counts: dict[int, int] = {}
            for u in nbrs[v]:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[v] = best
        if np.array_equal(new, labels):
            return new
        labels = new
    return labels


def triangles(n: int, edges: list[tuple[int, int]]) -> int:
    """Brute force on the undirected simple graph."""
    nbrs: list[set[int]] = [set() for _ in range(n)]
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    count = 0
    for a in range(n):
        for b in nbrs[a]:
            if b <= a:
                continue
            for c in nbrs[b]:
                if c <= b:
                    continue
                if c in nbrs[a]:
                    count += 1
    return count


def triangles_per_vertex(n: int, edges: list[tuple[int, int]]) -> np.ndarray:
    nbrs: list[set[int]] = [set() for _ in range(n)]
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    out = np.zeros(n, dtype=np.int64)
    for a in range(n):
        for b in nbrs[a]:
            if b <= a:
                continue
            for c in nbrs[b]:
                if c <= b:
                    continue
                if c in nbrs[a]:
                    out[a] += 1
                    out[b] += 1
                    out[c] += 1
    return out


def hits(
    n: int,
    edges: list[tuple[int, int]],
    max_iter: int = 20,
    tol: float = 1e-9,
) -> tuple[np.ndarray, np.ndarray]:
    """(hub, authority), L1-normalized each half-step — mirrors
    operators/hits.py exactly (auth from hubs first, then hubs from the
    NEW authorities)."""
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    hub = np.full(n, 1.0 / n)
    auth = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        new_auth = np.zeros(n)
        np.add.at(new_auth, dst, hub[src])
        new_auth /= new_auth.sum()
        new_hub = np.zeros(n)
        np.add.at(new_hub, src, new_auth[dst])
        new_hub /= new_hub.sum()
        d = np.max(np.abs(new_hub - hub)) + np.max(np.abs(new_auth - auth))
        hub, auth = new_hub, new_auth
        if d < tol:
            break
    return hub, auth


def salsa(
    n: int,
    edges: list[tuple[int, int]],
    max_iter: int = 20,
    tol: float = 1e-9,
) -> tuple[np.ndarray, np.ndarray]:
    """(hub, authority), degree-normalized walk steps, L1-normalized each
    half-step — mirrors operators/salsa.py exactly (auth from hub/outdeg
    first, then hubs from the NEW authorities / indeg)."""
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    od = np.zeros(n)
    np.add.at(od, src, 1.0)
    idg = np.zeros(n)
    np.add.at(idg, dst, 1.0)
    hub = np.full(n, 1.0 / n)
    auth = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        new_auth = np.zeros(n)
        np.add.at(new_auth, dst, hub[src] / od[src])
        new_auth /= new_auth.sum()
        new_hub = np.zeros(n)
        np.add.at(new_hub, src, new_auth[dst] / idg[dst])
        new_hub /= new_hub.sum()
        d = np.max(np.abs(new_hub - hub)) + np.max(np.abs(new_auth - auth))
        hub, auth = new_hub, new_auth
        if d < tol:
            break
    return hub, auth
