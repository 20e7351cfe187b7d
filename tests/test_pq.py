"""Product quantization: exact-integer training, encoding, ADC search —
pinned against a pure-Python mirror of the integer algebra."""

from __future__ import annotations

import random

import pytest

from osmgraphing_spark.operators import pq
from osmgraphing_spark.operators.similarity import Q_SCALE


def _vectors(seed, n, dim):
    """Vectors on exact multiples of 1/Q_SCALE so quantization is
    rounding-mode-independent."""
    rng = random.Random(seed)
    return [
        (i, [rng.randrange(-Q_SCALE, Q_SCALE + 1) / Q_SCALE for _ in range(dim)])
        for i in range(n)
    ]


def _q(vec):
    return [round(x * Q_SCALE) for x in vec]


def _assign_py(sub, book):
    """(cell, dist) of int subvector against [(cell, comps)] by exact
    squared L2, lowest cell id on ties (book is id-sorted)."""
    best = None
    for cid, c in book:
        d = sum((a - b) * (a - b) for a, b in zip(sub, c))
        if best is None or d < best[1]:
            best = (cid, d)
    return best


def _train_py(rows, dim, m, k, iters, seed):
    dsub = dim // m
    books = pq.init_codebooks(dim, m, k, seed)
    for _ in range(iters):
        acc = {}  # (s, cell) -> [n, sums]
        for _, vec in rows:
            qv = _q(vec)
            for s in range(m):
                sub = qv[s * dsub : (s + 1) * dsub]
                cid, _d = _assign_py(sub, books[s])
                n, sums = acc.setdefault((s, cid), [0, [0] * dsub])
                acc[(s, cid)][0] = n + 1
                for i, x in enumerate(sub):
                    sums[i] += x
        new = [[] for _ in range(m)]
        for (s, cid), (n, sums) in acc.items():
            new[s].append((cid, [(2 * sx + n) // (2 * n) for sx in sums]))
        books = [sorted(b) for b in new]
    return books


def _encode_py(rows, books, dim):
    m = len(books)
    dsub = dim // m
    out = {}
    for vid, vec in rows:
        qv = _q(vec)
        for s in range(m):
            cid, d = _assign_py(qv[s * dsub : (s + 1) * dsub], books[s])
            out[(vid, s)] = (cid, d)
    return out


DIM, M, K, ITERS = 8, 2, 3, 2


@pytest.fixture(scope="module")
def vecs(spark):
    rows = _vectors(7, 40, DIM)
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_train_matches_python_mirror(spark, vecs):
    rows, df = vecs
    got = pq.train_pq(df, dim=DIM, m=M, k=K, iters=ITERS)
    want = _train_py(rows, DIM, M, K, ITERS, seed=pq.SEED)
    assert got == want
    # training must move the codebooks off the data-independent init
    assert got != pq.init_codebooks(DIM, M, K)


def test_encode_matches_python_mirror(spark, vecs):
    rows, df = vecs
    books = pq.train_pq(df, dim=DIM, m=M, k=K, iters=ITERS)
    got = {
        (r["vec_id"], r["sub"]): (r["cell"], r["dist"])
        for r in pq.pq_encode(df, books).collect()
    }
    assert got == _encode_py(rows, books, DIM)
    # every vector gets exactly m code rows
    assert len(got) == len(rows) * M


def test_adc_topk_matches_brute(spark, vecs):
    rows, df = vecs
    books = pq.train_pq(df, dim=DIM, m=M, k=K, iters=ITERS)
    queries = [(vid, v) for vid, v in rows if vid < 5]
    qdf = spark.createDataFrame(queries, "vec_id long, embedding array<double>")
    got = [
        (r["query_id"], r["neighbor_id"], r["adc_dist"], r["rk"])
        for r in pq.pq_topk(df, qdf, books, k=4)
        .orderBy("query_id", "rk")
        .collect()
    ]
    codes = _encode_py(rows, books, DIM)
    cents = {
        (s, cid): c for s, book in enumerate(books) for cid, c in book
    }
    dsub = DIM // M
    want = []
    for qid, qvec in queries:
        qq = _q(qvec)
        scored = []
        for vid, _ in rows:
            d = 0
            for s in range(M):
                cid, _ = codes[(vid, s)]
                c = cents[(s, cid)]
                sub = qq[s * dsub : (s + 1) * dsub]
                d += sum((a - b) * (a - b) for a, b in zip(sub, c))
            scored.append((d, vid))
        scored.sort()
        want.extend(
            (qid, vid, d, rk + 1) for rk, (d, vid) in enumerate(scored[:4])
        )
    assert got == want


def test_dim_not_divisible_raises(spark, vecs):
    _, df = vecs
    with pytest.raises(ValueError):
        pq.init_codebooks(10, 3, 2)
