"""Filter-funnel mechanics (operators/funnel) vs a python mirror:
first-failing-rule attribution, chain accounting identities, and the
kept() corpus; the default text rules are value-pinned end-to-end by the
driver's doc_filter_funnel SQL oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from osmgraphing_spark.operators import funnel


def _mirror(rows, rules):
    """rows: dict id -> value; rules: (name, predicate) python callables."""
    verdicts = {}
    for i, x in rows.items():
        verdicts[i] = funnel.KEPT
        for name, keep in rules:
            if not keep(x):
                verdicts[i] = name
                break
    return verdicts


def test_first_failing_rule_attribution(spark):
    rows = {i: i for i in range(40)}
    df = spark.createDataFrame(list(rows.items()), "doc_id long, x long")
    spark_rules = [
        ("ge10", F.col("x") >= 10),
        ("even", F.col("x") % 2 == 0),
        ("lt36", F.col("x") < 36),
    ]
    py_rules = [
        ("ge10", lambda x: x >= 10),
        ("even", lambda x: x % 2 == 0),
        ("lt36", lambda x: x < 36),
    ]
    got = {
        r["doc_id"]: r["verdict"]
        for r in funnel.verdicts(df, spark_rules, id_col="doc_id").collect()
    }
    want = _mirror(rows, py_rules)
    assert got == want
    # a doc failing BOTH ge10 and even is attributed to ge10 (first)
    assert got[7] == "ge10"

    kept_ids = {r["doc_id"] for r in funnel.kept(df, spark_rules).collect()}
    assert kept_ids == {i for i, v in want.items() if v == funnel.KEPT}


def test_summary_accounting_identities(spark):
    rows = {i: i for i in range(40)}
    df = spark.createDataFrame(list(rows.items()), "doc_id long, x long")
    rules = [
        ("ge10", F.col("x") >= 10),
        ("even", F.col("x") % 2 == 0),
        ("lt36", F.col("x") < 36),
    ]
    s = {
        r["rule"]: r for r in funnel.summary(df, rules, id_col="doc_id").collect()
    }
    # chain: 40 in; ge10 drops 0..9 (10); even drops odd >=10 (15);
    # lt36 drops even >= 36 (36, 38)
    assert (s["ge10"]["n_in"], s["ge10"]["n_dropped"]) == (40, 10)
    assert (s["even"]["n_in"], s["even"]["n_dropped"]) == (30, 15)
    assert (s["lt36"]["n_in"], s["lt36"]["n_dropped"]) == (15, 2)
    assert s["even"]["drop_frac"] == 0.5
    # identity: last n_in - last dropped = kept count
    kept_n = funnel.kept(df, rules).count()
    assert s["lt36"]["n_in"] - s["lt36"]["n_dropped"] == kept_n == 13
    assert [s[k]["rule_order"] for k in ("ge10", "even", "lt36")] == [0, 1, 2]


def test_rule_nobody_reaches_or_fails(spark):
    df = spark.createDataFrame([(i, i) for i in range(6)], "doc_id long, x long")
    rules = [
        ("all_fail", F.col("x") < 0),
        ("unreached", F.col("x") >= 0),
    ]
    s = {r["rule"]: r for r in funnel.summary(df, rules, id_col="doc_id").collect()}
    assert (s["all_fail"]["n_in"], s["all_fail"]["n_dropped"]) == (6, 6)
    assert (s["unreached"]["n_in"], s["unreached"]["n_dropped"]) == (0, 0)
    assert s["unreached"]["drop_frac"] == 0.0
    assert funnel.kept(df, rules).count() == 0


def test_default_rules_single_scan_plan(spark):
    """The default-rule verdict fuses into ONE scan of documents — no
    shuffle, no second scan (the whole funnel verdict is map-only)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        funnel.verdicts(docs, funnel.default_rules())
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 1, plan
    assert "Exchange" not in plan, plan


def test_source_stats_planted_duplicates(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "s1"),
            (2, "alpha beta gamma", "s1"),   # exact dup within s1
            (3, "delta epsilon", "s1"),
            (4, "alpha beta gamma", "s2"),   # same text, OTHER source: not a dup there
            (5, "zeta eta theta iota", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    s = {
        r["source"]: r for r in funnel.source_stats(docs).collect()
    }
    assert (s["s1"]["n_docs"], s["s2"]["n_docs"]) == (3, 2)
    assert s["s1"]["dup_frac"] == round(2 / 3, 6)   # the two copies count
    assert s["s2"]["dup_frac"] == 0.0               # cross-source copy doesn't
    assert s["s1"]["avg_tokens"] == round((3 + 3 + 2) / 3, 6)
    assert s["s2"]["avg_tokens"] == round((3 + 4) / 2, 6)


def test_conversion_funnel_ordering(spark):
    """First-touch ordered semantics: a user who clicks BEFORE their first
    view does not convert at step 2 unless a later click follows; ties
    (same timestamp) do NOT advance the funnel (strict >)."""
    from osmgraphing_spark.operators.funnel import conversion_funnel

    rows = [
        # u1: view@1, click@2, purchase@3 -> full conversion
        (1, "2024-01-01 00:00:01", 1, "view"),
        (2, "2024-01-01 00:00:02", 1, "click"),
        (3, "2024-01-01 00:00:03", 1, "purchase"),
        # u2: click@1 BEFORE view@2, no later click -> stops at step 1
        (4, "2024-01-01 00:00:01", 2, "click"),
        (5, "2024-01-01 00:00:02", 2, "view"),
        (6, "2024-01-01 00:00:03", 2, "purchase"),
        # u3: view@1, click@1 (tie -> not after) -> stops at step 1
        (7, "2024-01-01 00:00:01", 3, "view"),
        (8, "2024-01-01 00:00:01", 3, "click"),
        # u4: view@1, click@2, no purchase -> stops at step 2
        (9, "2024-01-01 00:00:01", 4, "view"),
        (10, "2024-01-01 00:00:02", 4, "click"),
        # u5: never views -> not in funnel at all
        (11, "2024-01-01 00:00:01", 5, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["step"]: (r["event_type"], r["users"], r["conversion"])
        for r in conversion_funnel(ev, ["view", "click", "purchase"]).collect()
    }
    assert got[1] == ("view", 4, 1.0)
    assert got[2] == ("click", 2, 0.5)
    assert got[3] == ("purchase", 1, 0.25)


def test_conversion_funnel_validates(spark):
    from osmgraphing_spark.operators.funnel import conversion_funnel

    ev = spark.createDataFrame([], "user_id long, ts timestamp, event_type string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        conversion_funnel(ev, [])
    got = {r["step"]: r["users"] for r in conversion_funnel(ev, ["view"]).collect()}
    assert got == {1: 0}
