"""Quality-filter funnel — ordered keep-rules with per-rule drop accounting.

The cleaning-pipeline composition layer over `functions/text`: real
training-data pipelines (C4, Gopher, RefinedWeb — public literature)
chain document filters and report a FUNNEL — how many documents each
rule dropped, in order — because the drop accounting is what gets
audited, tuned, and compared across corpus snapshots. The reference's
analogue is the config-declared filter chain applied during parsing
(vehicle-profile predicate + tag classifier dropping ways,
/root/reference/src/network/graph/building.rs:123-217); here the chain
is declared as (name, keep-condition) pairs and the accounting is
first-class.

Scale design: the per-document verdict is ONE pure-column `when` chain —
every rule built from `functions/text` expressions fuses into the corpus
scan (whole-stage codegen, map-only, zero shuffle); the only shuffle in
the summary is a groupBy over the |rules|+1 verdict values (algebraic
count, map-side combine), and the cumulative reach arithmetic runs over
that |rules|-row aggregate, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as X

KEPT = "kept"


def default_rules(
    text_col: str = "text",
    min_tokens: int = 20,
    max_dup_fraction: float = 0.65,
    min_stopword_ratio: float = 0.01,
) -> list[tuple[str, Column]]:
    """The Gopher-ish starter chain: length floor → repetition cap →
    stopword (language/naturalness) floor. Order matters: cheap,
    high-precision rules first so downstream rules see fewer rows in the
    accounting (the drop is attributed to the FIRST failing rule)."""
    c = F.col(text_col)
    return [
        ("min_tokens", X.token_count(c) >= min_tokens),
        ("max_repetition", X.dup_token_fraction(c) <= max_dup_fraction),
        ("min_stopwords", X.stopword_ratio(c) >= min_stopword_ratio),
    ]


def verdicts(
    docs: DataFrame,
    rules: list[tuple[str, Column]],
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, verdict): ``KEPT`` or the name of the FIRST rule whose
    keep-condition fails — one fused column expression per document."""
    expr = None
    for name, keep in rules:
        expr = (
            F.when(~keep, F.lit(name))
            if expr is None
            else expr.when(~keep, F.lit(name))
        )
    expr = F.lit(KEPT) if expr is None else expr.otherwise(F.lit(KEPT))
    return docs.select(F.col(id_col).alias("doc_id"), expr.alias("verdict"))


def summary(
    docs: DataFrame,
    rules: list[tuple[str, Column]],
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (rule_order, rule, n_in, n_dropped, drop_frac) per rule, in
    chain order: n_in = documents reaching the rule (total minus all
    earlier drops), drop_frac = n_dropped / n_in (0.0 when nothing
    reaches the rule). One corpus scan + one tiny verdict groupBy."""
    spark = docs.sparkSession
    counts = verdicts(docs, rules, id_col).groupBy("verdict").agg(
        F.count("*").alias("n")
    )
    order = spark.createDataFrame(
        [(i, name) for i, (name, _) in enumerate(rules)],
        "rule_order int, rule string",
    )
    per_rule = order.join(
        counts.withColumnRenamed("verdict", "rule"), "rule", "left"
    ).select(
        "rule_order", "rule", F.coalesce("n", F.lit(0)).alias("n_dropped")
    )
    total = counts.agg(F.sum("n").alias("total"))
    w = Window.orderBy("rule_order").rowsBetween(Window.unboundedPreceding, -1)
    return (
        per_rule.crossJoin(total)  # |rules| × 1 — driver-sized, not corpus
        .withColumn(
            "n_in",
            F.col("total") - F.coalesce(F.sum("n_dropped").over(w), F.lit(0)),
        )
        .select(
            "rule_order",
            "rule",
            "n_in",
            "n_dropped",
            F.when(F.col("n_in") == 0, F.lit(0.0))
            .otherwise(F.round(F.col("n_dropped") / F.col("n_in"), 6))
            .alias("drop_frac"),
        )
    )


def source_stats(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """→ (source, n_docs, dup_frac, avg_tokens, avg_quality): the
    per-source reputation table real pipelines gate ingestion on (the
    CCNet/RefinedWeb practice: drop or down-weight whole sources whose
    duplication or quality profile is bad, BEFORE paying per-document
    cost on their volume). dup_frac = fraction of the source's documents
    whose exact content digest occurs more than once within that source.

    Scale: one corpus scan computing (digest, tokens, quality) fused into
    the read; a groupBy (source, digest) with algebraic sums; then a
    groupBy (source) over group-sized rows. Hot sources are exactly the
    skew case the two-stage aggregation handles — the second stage sees
    one row per distinct content, not per document."""
    c = F.col(text_col)
    per_doc = docs.select(
        F.col(source_col).alias("source"),
        F.md5(c).alias("digest"),
        X.token_count(c).alias("ntok"),
        X.quality_score(c).alias("quality"),
    )
    per_content = per_doc.groupBy("source", "digest").agg(
        F.count("*").alias("c"),
        F.sum("ntok").alias("toksum"),
        F.sum("quality").alias("qsum"),
    )
    return per_content.groupBy("source").agg(
        F.sum("c").alias("n_docs"),
        F.round(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
            / F.sum("c"),
            6,
        ).alias("dup_frac"),
        F.round(F.sum("toksum") / F.sum("c"), 6).alias("avg_tokens"),
        F.round(F.sum("qsum") / F.sum("c"), 6).alias("avg_quality"),
    )


def kept(
    docs: DataFrame,
    rules: list[tuple[str, Column]],
) -> DataFrame:
    """The surviving documents (every keep-condition true) — the funnel's
    output corpus, same fused single-scan plan as `verdicts`."""
    cond = F.lit(True)
    for _, keep in rules:
        cond = cond & keep
    return docs.where(cond)


def conversion_funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel over an event log → one row per step
    (step int, event_type, users long, conversion double): users who
    performed every step so far IN ORDER (each step strictly after the
    previous one's first qualifying occurrence — the standard
    first-touch funnel semantics of product analytics), with conversion
    = users / step-1 users.

    Scale design: ONE pass over the event log filtered to the step set —
    a single groupBy(user) collects per-step time arrays (map-side
    combined; array size bounded by that user's events on funnel steps
    only), then the sequential step times t₁ = min(a₁), tₖ =
    min(x ∈ aₖ : x > tₖ₋₁) are pure column expressions (array_min over a
    correlated higher-order filter; a missed step nulls every later
    one), and all k user counts come from a single 1-row aggregate. No
    per-step joins, no k² rescans of the event table."""
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.where(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t"),
        F.col(type_col).alias("s"),
    )
    per_user = ev.groupBy("u").agg(
        *[
            F.collect_list(F.when(F.col("s") == name, F.col("t"))).alias(f"_a{i}")
            for i, name in enumerate(steps)
        ]
    )
    prev = None
    for i in range(len(steps)):
        a = F.col(f"_a{i}")
        t = (
            F.array_min(a)
            if prev is None
            else F.array_min(F.filter(a, lambda x: x > prev))  # noqa: B023 — F.filter evaluates the lambda eagerly, this iteration's prev is captured
        )
        per_user = per_user.withColumn(f"_t{i}", t)
        prev = F.col(f"_t{i}")
    one = per_user.agg(
        *[F.count(f"_t{i}").alias(f"_c{i}") for i in range(len(steps))]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(name).alias("event_type"),
                F.col(f"_c{i}").alias("users"),
                F.round(
                    F.when(
                        F.col("_c0") > 0,
                        F.col(f"_c{i}").cast("double") / F.col("_c0"),
                    ).otherwise(F.lit(0.0)),
                    6,
                ).alias("conversion"),
            )
            for i, name in enumerate(steps)
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")
