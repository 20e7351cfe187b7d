"""Snapshot diff operators vs set-arithmetic mirrors."""

from __future__ import annotations

import random

import pytest

from osmgraphing_spark.operators import snapshot


@pytest.fixture(scope="module")
def snaps(spark):
    rng = random.Random(71)
    old = sorted({(rng.randrange(15), rng.randrange(15)) for _ in range(40)})
    new = [e for e in old if rng.random() > 0.25]
    new += [(rng.randrange(15), 15 + rng.randrange(5)) for _ in range(8)]
    new = sorted(set(new))
    odf = spark.createDataFrame(old, "src long, dst long")
    ndf = spark.createDataFrame(new, "src long, dst long")
    return set(old), set(new), odf, ndf


def test_edge_diff(spark, snaps):
    old, new, odf, ndf = snaps
    got = {(r["src"], r["dst"], r["change"])
           for r in snapshot.edge_diff(odf, ndf).collect()}
    want = {(s, d, "added") for s, d in new - old} | {
        (s, d, "removed") for s, d in old - new
    }
    assert got == want


def test_degree_deltas(spark, snaps):
    old, new, odf, ndf = snaps
    got = {r["vid"]: (r["out_old"], r["out_new"], r["delta"])
           for r in snapshot.degree_deltas(odf, ndf).collect()}
    srcs = {s for s, _ in old} | {s for s, _ in new}
    want = {}
    for v in srcs:
        oo = sum(1 for s, _ in old if s == v)
        nn = sum(1 for s, _ in new if s == v)
        if oo != nn:
            want[v] = (oo, nn, nn - oo)
    assert got == want


def test_diff_summary(spark, snaps):
    old, new, odf, ndf = snaps
    row = snapshot.diff_summary(odf, ndf).collect()[0]
    common = len(old & new)
    assert row["n_old"] == len(old) and row["n_new"] == len(new)
    assert row["n_added"] == len(new - old)
    assert row["n_removed"] == len(old - new)
    assert row["jaccard"] == round(common / len(old | new), 6)
