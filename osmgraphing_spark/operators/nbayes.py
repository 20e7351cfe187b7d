"""Multinomial Naive Bayes — in-engine trainable document classifier
(McCallum & Nigam, AAAI-98 workshop; the standard fast text classifier
for pipeline labeling jobs: source/domain/language tagging at corpus
scale).

Training is pure counting — class priors and add-k-smoothed token
likelihoods over a shared vocabulary:

    score(d, c) = ln p(c) + Σ_tok tf(tok, d) · ln p(tok | c)
    p(tok | c)  = (count(tok, c) + k) / (total_c + k·V)

so the ENTIRE train-then-classify pipeline is deterministic and
replayable in the DuckDB oracle (ln sums under the engine's usual
round-to-6 contract; argmax ties break to the lexicographically
smallest class). Tokens unseen in training are DROPPED at scoring time
(the shared-vocabulary convention — every class pays the same smoothed
mass for them, so they cannot change the argmax anyway; dropping keeps
the score join an inner join).

Scale contract (100 TB): the model is vocabulary × classes — Zipf ≪
corpus — and broadcasts; classification is one scan of the corpus
tokens, a broadcast join, and a per-(doc, class) algebraic sum
(map-side combined), then an argmax window over |docs| partitions.
Training is two map-side-combined aggregations. Nothing quadratic,
no UDF, no driver collect.

Reference parity: beyond-reference training-data operator; the
aggregate-feeds-per-row shape once more (building.rs:1410-1455), with
the aggregate now a class-conditional LM table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .termstats import _tokens


def train_nb(
    docs: DataFrame,
    label_col: str,
    k: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """→ (priors, likelihoods): priors = (label, log_prior);
    likelihoods = (label, tok, log_lik) for every (class, vocab token)
    pair — the dense smoothed table, so scoring never needs a
    missing-token fallback term."""
    labeled = docs.select(F.col(id_col).alias("id"), F.col(label_col).alias("_y"), text_col)
    nd = labeled.count()
    priors = (
        labeled.groupBy("_y")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("_y").alias("label"),
            F.log(F.col("n") / F.lit(float(nd))).alias("log_prior"),
        )
    )
    toks = _tokens(labeled, "id", text_col).join(
        labeled.select("id", "_y"), "id"
    )
    counts = toks.groupBy("_y", "tok").agg(F.count("*").alias("cnt"))
    totals = counts.groupBy("_y").agg(F.sum("cnt").alias("tot"))
    vocab = counts.select("tok").distinct()
    v = vocab.count()
    kk = F.lit(float(k))
    dense = (
        vocab.crossJoin(totals)
        .join(counts, ["_y", "tok"], "left")
        .select(
            F.col("_y").alias("label"),
            "tok",
            F.log(
                (F.coalesce(F.col("cnt"), F.lit(0)).cast("double") + kk)
                / (F.col("tot").cast("double") + kk * F.lit(float(v)))
            ).alias("log_lik"),
        )
    )
    return priors, dense


def classify_nb(
    docs: DataFrame,
    priors: DataFrame,
    likelihoods: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id_col, label, score): the argmax class per document (score =
    rounded log posterior; ties → smallest label). Documents with NO
    in-vocabulary token are classified by prior alone."""
    tf = (
        _tokens(docs, id_col, text_col)
        .groupBy("id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    contrib = (
        tf.join(F.broadcast(likelihoods), "tok")
        .groupBy("id", "label")
        .agg(F.sum(F.col("tf") * F.col("log_lik")).alias("ll"))
    )
    base = docs.select(F.col(id_col).alias("id")).crossJoin(
        F.broadcast(priors)
    )
    scored = (
        base.join(contrib, ["id", "label"], "left")
        .select(
            "id",
            "label",
            F.round(
                F.col("log_prior") + F.coalesce(F.col("ll"), F.lit(0.0)), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("label").asc())
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(F.col("id").alias(id_col), "label", "score")
    )
