"""Corpus-level term statistics: unigram LM quality scoring and TF-IDF
keyword extraction.

Two classic training-data quality passes the per-doc column expressions in
``functions/text`` cannot provide, because both need GLOBAL term counts:

- ``unigram_logprob`` — CCNet-style fluency proxy: score each document by
  the mean negative log-probability of its tokens under the corpus's own
  unigram distribution. High = rare-token gibberish, low = stopword soup;
  both tails get filtered in production pipelines.
- ``tfidf_top_terms`` — per-document top-k keywords by tf·idf with a
  deterministic tie-break, the standard document-fingerprinting /
  topic-tagging primitive.

The reference's analogous pattern is mean-normalization: an aggregate over
the whole edge set feeds back into a per-row rescale
(/root/reference/src/network/graph/building.rs:1410-1455). Here the
aggregate is the term-frequency table and the per-row op is a join.

Scale notes:

- The vocabulary is Zipf-bounded (≈1e8 terms at web scale, ≪ corpus), so
  the frequency table broadcasts; the exploded corpus then never shuffles
  for the probability lookup — only the per-doc mean aggregation moves
  (doc_id + two doubles, map-side combined). ``broadcast_vocab=False``
  falls back to a shuffle join for degenerate vocabularies.
- Scalar corpus totals (token count, doc count) stay DataFrames and enter
  via a broadcast 1-row cross join — no ``collect()`` in the plan, so the
  whole pipeline is one lazy DAG the optimizer can see.
- TF-IDF's per-doc top-k window partitions by doc id: partitions are
  bounded by document length, so there is no hot-key risk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tok): whitespace tokens, lowercased — same tokenizer as
    dedup.shingles / simhash64 so the SQL oracle reuses one definition."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    )


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """→ (id, n_tokens, avg_nll): mean −ln p(tok) per document, where
    p(tok) = corpus count / corpus total (the corpus is its own LM)."""
    toks = _tokens(docs, id_col, text_col)
    freq = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("total"))
    if broadcast_vocab:
        freq = F.broadcast(freq)
    return (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .withColumn("nll", -F.log(F.col("cnt").cast("double") / F.col("total")))
        .groupBy("id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("nll"), 6).alias("avg_nll"),
        )
    )


def bigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.5,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """→ (id, n_bigrams, avg_nll): mean −ln p(w₂|w₁) per document under an
    add-k smoothed corpus bigram LM,

        p(w₂|w₁) = (c(w₁w₂) + k) / (c(w₁·) + k·V)

    (c = corpus counts, V = unigram vocabulary size) — the bigram upgrade
    of ``unigram_logprob``: fluent word ORDER now matters, so shuffled or
    templated text scores as gibberish even when its unigram mix is
    normal. Only documents with ≥ 1 bigram appear.

    Scale: same shape as unigram_logprob — the bigram frequency and
    context tables are vocabulary-bounded and broadcast; the exploded
    corpus never shuffles for the lookups, only the per-doc mean moves.
    V and the bigram stream reuse one tokenizer definition
    (heavyhitters.terms_of), so the SQL oracle shares it too."""
    from .heavyhitters import terms_of

    bg = terms_of(docs, 2, id_col, text_col)
    freq = bg.groupBy("term").agg(F.count("*").alias("cnt"))
    ctx = (
        freq.withColumn("w1", F.split("term", " ")[0])
        .groupBy("w1")
        .agg(F.sum("cnt").alias("ctx_cnt"))
    )
    vocab = (
        terms_of(docs, 1, id_col, text_col)
        .agg(F.count_distinct("term").alias("v"))
    )
    if broadcast_vocab:
        freq, ctx = F.broadcast(freq), F.broadcast(ctx)
    return (
        bg.join(freq, "term")
        .withColumn("w1", F.split("term", " ")[0])
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "nll",
            -F.log(
                (F.col("cnt") + F.lit(k))
                / (F.col("ctx_cnt") + F.lit(k) * F.col("v"))
            ),
        )
        .groupBy("id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("nll"), 6).alias("avg_nll"),
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id, term, tf, tfidf, rank): each document's top-k terms by
    tf · ln((1+N)/(1+df)), ties broken by term ascending (deterministic —
    exact-label reproducibility is the same discipline the reference's
    1e-6 approx grid enforces for metrics)."""
    tf = (
        _tokens(docs, id_col, text_col)
        .groupBy("id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    df_tbl = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_tbl), "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log((F.lit(1) + F.col("n_docs")) / (F.lit(1) + F.col("df"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("id", F.col("tok").alias("term"), "tf", "tfidf", "rank")
    )
