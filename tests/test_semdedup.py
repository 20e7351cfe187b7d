"""SemDeDup: within-cluster cosine pairs + greedy keep-one, pinned
against a numpy mirror built on the (already pinned) integer k-means."""

from __future__ import annotations

import math
import random

import pytest

from osmgraphing_spark.operators import semdedup
from osmgraphing_spark.operators.kmeans import lloyd_kmeans
from osmgraphing_spark.operators.similarity import Q_SCALE

DIM, K, ITERS, TAU = 8, 3, 2, 0.8


def _vectors(seed, n, dim=DIM):
    rng = random.Random(seed)
    rows = [
        (i, [rng.randrange(-Q_SCALE, Q_SCALE + 1) / Q_SCALE for _ in range(dim)])
        for i in range(n)
    ]
    # plant exact dups and one near-dup
    rows.append((900, list(rows[0][1])))
    near = list(rows[1][1])
    near[0] += 1.0 / Q_SCALE
    rows.append((901, near))
    return rows


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = _vectors(11, 30)
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _expected_pairs(spark, rows, df, max_cell=None):
    assigned, _ = lloyd_kmeans(df, dim=DIM, k=K, iters=ITERS)
    cell_of = {r["vec_id"]: r["cell"] for r in assigned.collect()}
    sizes = {}
    for c in cell_of.values():
        sizes[c] = sizes.get(c, 0) + 1
    vec = dict(rows)
    out = {}
    ids = sorted(vec)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if cell_of[a] != cell_of[b]:
                continue
            if max_cell is not None and sizes[cell_of[a]] > max_cell:
                continue
            s = round(_cos(vec[a], vec[b]), 6)
            if s >= TAU:
                out[(a, b)] = (cell_of[a], s)
    return out


def test_semantic_pairs_match_mirror(spark, corpus):
    rows, df = corpus
    got = {
        (r["id_a"], r["id_b"]): (r["cell"], r["score"])
        for r in semdedup.semantic_pairs(df, dim=DIM, k=K, iters=ITERS, threshold=TAU).collect()
    }
    want = _expected_pairs(spark, rows, df)
    assert got == want
    assert (0, 900) in got and got[(0, 900)][1] == 1.0  # planted exact dup
    assert (1, 901) in got  # planted near-dup lands in the same cell


def test_survivors_drop_higher_ids(spark, corpus):
    rows, df = corpus
    pairs = _expected_pairs(spark, rows, df)
    losers = {b for _, b in pairs}
    got = {
        r["vec_id"]
        for r in semdedup.semantic_survivors(
            df, dim=DIM, k=K, iters=ITERS, threshold=TAU
        ).collect()
    }
    assert got == {i for i, _ in rows} - losers
    assert 900 not in got and 0 in got


def test_max_cell_gates_pairs(spark, corpus):
    rows, df = corpus
    got = {
        (r["id_a"], r["id_b"]): (r["cell"], r["score"])
        for r in semdedup.semantic_pairs(
            df, dim=DIM, k=K, iters=ITERS, threshold=TAU, max_cell=5
        ).collect()
    }
    assert got == _expected_pairs(spark, rows, df, max_cell=5)
