"""HyperLogLog cardinality sketch vs a pure-python register mirror."""

from __future__ import annotations

import hashlib
import math

import pytest

from osmgraphing_spark.operators import cardinality as card


def _mirror_regs(values, log2m, salt="hll:"):
    m = 1 << log2m
    regs = {}
    for v in values:
        if v is None:
            continue
        hx = hashlib.md5((salt + str(v)).encode()).hexdigest()
        bucket = int(hx[:3], 16) % m
        w60 = int(hx[3:18], 16)
        reg = 61 - w60.bit_length() if w60 > 0 else 61
        regs[bucket] = max(regs.get(bucket, 0), reg)
    return regs


def _mirror_estimate(regs, log2m):
    m = 1 << log2m
    s = sum(2.0 ** -r for r in regs.values())
    zeros = m - len(regs)
    raw = card._alpha_mm(m) / (zeros + s)
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return raw


def test_sketch_registers_match_mirror(spark):
    vals = [f"tok{i % 700}" for i in range(3000)]
    df = spark.createDataFrame([(v,) for v in vals], "x string")
    got = {
        r["bucket"]: r["reg"] for r in card.hll_sketch(df, "x", log2m=6).collect()
    }
    assert got == _mirror_regs(vals, 6)


def test_estimate_within_three_sigma(spark):
    n, log2m = 5000, 9
    df = spark.createDataFrame([(f"u{i}",) for i in range(n)], "x string")
    est = card.approx_distinct(df, "x", log2m=log2m).collect()[0]
    sigma = 1.04 / math.sqrt(1 << log2m)
    assert abs(est["approx_distinct"] - n) <= 3 * sigma * n
    # and the in-plan estimate equals the mirror's formula exactly
    want = _mirror_estimate(_mirror_regs([f"u{i}" for i in range(n)], log2m), log2m)
    assert est["approx_distinct"] == pytest.approx(want, abs=1e-6)


def test_merge_equals_sketch_of_union(spark):
    a = spark.createDataFrame([(f"k{i}",) for i in range(0, 800)], "x string")
    b = spark.createDataFrame([(f"k{i}",) for i in range(500, 1300)], "x string")
    sa = card.hll_sketch(a, "x", log2m=7)
    sb = card.hll_sketch(b, "x", log2m=7)
    merged = {
        (r["bucket"], r["reg"]) for r in card.hll_merge(sa, sb).collect()
    }
    union = {
        (r["bucket"], r["reg"])
        for r in card.hll_sketch(a.unionByName(b), "x", log2m=7).collect()
    }
    assert merged == union


def test_grouped_sketch_and_nulls(spark):
    rows = [("g1", f"a{i}") for i in range(100)] + [
        ("g2", f"b{i % 10}") for i in range(50)
    ] + [("g1", None)]
    df = spark.createDataFrame(rows, "g string, x string")
    sk = card.hll_sketch(df, "x", log2m=6, by=["g"])
    est = {
        r["g"]: r for r in card.hll_estimate(sk, 6, by=["g"]).collect()
    }
    m1 = _mirror_regs([f"a{i}" for i in range(100)], 6)
    m2 = _mirror_regs([f"b{i % 10}" for i in range(10)], 6)
    assert est["g1"]["nnz"] == len(m1)
    assert est["g2"]["nnz"] == len(m2)
    assert est["g2"]["approx_distinct"] == pytest.approx(
        _mirror_estimate(m2, 6), abs=1e-6
    )
    # g2 has 10 distinct values: linear counting must land close
    assert abs(est["g2"]["approx_distinct"] - 10) <= 3
