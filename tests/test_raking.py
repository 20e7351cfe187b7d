"""IPF raking vs a pure-python mirror + margin-convergence properties."""

from __future__ import annotations

import pytest


def _toy(spark):
    # skewed joint: lang en dominates, source web dominates
    rows = (
        [("en", "web")] * 60
        + [("en", "book")] * 10
        + [("fr", "web")] * 20
        + [("fr", "book")] * 5
        + [("de", "web")] * 5
    )
    return spark.createDataFrame(
        [(i, l, s) for i, (l, s) in enumerate(rows)],
        "doc_id long, lang string, source string",
    )


def _ipf_mirror(cells, rt, ct, rounds):
    mass = dict(cells)
    keys = sorted(mass)
    for _ in range(rounds):
        rs = {}
        for r, c in keys:
            rs[r] = rs.get(r, 0.0) + mass[(r, c)]
        mass = {k: mass[k] * rt[k[0]] / rs[k[0]] for k in keys}
        cs = {}
        for r, c in keys:
            cs[c] = cs.get(c, 0.0) + mass[(r, c)]
        mass = {k: mass[k] * ct[k[1]] / cs[k[1]] for k in keys}
    return mass


def test_rake_cells_matches_mirror(spark):
    from osmgraphing_spark.operators import raking

    df = _toy(spark)
    got = {
        (r["lang"], r["source"]): (r["n"], r["mass"], r["weight"])
        for r in raking.rake_cells(df, "lang", "source", rounds=3).collect()
    }
    cells = {("en", "web"): 60.0, ("en", "book"): 10.0, ("fr", "web"): 20.0,
             ("fr", "book"): 5.0, ("de", "web"): 5.0}
    rt = {k: 100.0 / 3 for k in ("en", "fr", "de")}
    ct = {k: 100.0 / 2 for k in ("web", "book")}
    exp = _ipf_mirror(cells, rt, ct, 3)
    assert set(got) == set(exp)
    for k, m in exp.items():
        n, mass, w = got[k]
        assert abs(mass - m) < 1e-9
        assert abs(w - m / cells[k]) < 1e-9


def test_rake_margins_converge(spark):
    from osmgraphing_spark.operators import raking

    df = _toy(spark)
    res = raking.rake_cells(df, "lang", "source", rounds=25).collect()
    by_lang: dict = {}
    by_src: dict = {}
    for r in res:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0.0) + r["mass"]
        by_src[r["source"]] = by_src.get(r["source"], 0.0) + r["mass"]
    # IPF limit: every language 100/3, every source 100/2 (column scaling
    # runs last, so the source margin is exact; the lang margin converges)
    for v in by_src.values():
        assert abs(v - 50.0) < 1e-9
    for v in by_lang.values():
        assert abs(v - 100.0 / 3) < 1e-3


def test_rake_weights_broadcast_join(spark):
    from osmgraphing_spark.operators import raking

    df = _toy(spark)
    out = raking.rake_weights(df, "lang", "source", rounds=3)
    assert out.count() == 100
    # every doc in the same cell carries the same weight; weights positive
    per_cell = (
        out.groupBy("lang", "source")
        .agg(
            {"weight": "min"},
        )
        .collect()
    )
    assert all(r["min(weight)"] > 0 for r in per_cell)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_rake_explicit_targets_and_zero(spark):
    from osmgraphing_spark.operators import raking

    df = _toy(spark)
    res = {
        (r["lang"], r["source"]): r["mass"]
        for r in raking.rake_cells(
            df,
            "lang",
            "source",
            row_targets={"en": 10.0, "fr": 10.0},  # de absent -> 0
            col_targets={"web": 10.0, "book": 10.0},
            rounds=10,
        ).collect()
    }
    assert res[("de", "web")] == 0.0
    assert sum(res.values()) == pytest.approx(20.0, abs=1e-6)
