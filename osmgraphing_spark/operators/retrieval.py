"""BM25 retrieval over the document corpus — the query-relevant data
curation primitive (Robertson & Zaragoza, "The Probabilistic Relevance
Framework: BM25 and Beyond", 2009).

score(q, d) = Σ_{t ∈ q}  idf(t) · tf(t,d)·(k1+1)
                         ─────────────────────────────────
                         tf(t,d) + k1·(1 − b + b·dl(d)/avgdl)

with idf(t) = ln((N − df(t) + 0.5)/(df(t) + 0.5) + 1)  (the Lucene
non-negative variant). Training pipelines use this to pull the
query-relevant slice of a crawl ("give me the 10⁶ docs most relevant to
these seed queries") — the lexical sibling of DSIR's LM ratio.

Scale contract (100 TB): one corpus pass builds the (doc, term, tf)
postings (groupBy map-side combines); df/N/avgdl are term- and
scalar-sized aggregates that enter via broadcast — no collect in the
plan. The query term table is tiny by construction and broadcasts onto
the postings, so the corpus shuffles once (the postings groupBy) no
matter how many queries score. Per-(query, doc) sums are algebraic;
top-k per query is one window over |Q| partitions. Repeated query terms
fold into a query-side weight (qtf) instead of duplicating the postings
join.

Reference parity: beyond-reference training-data operator; the
aggregate-feeds-per-row shape mirrors the reference's
mean-normalization (/root/reference/src/network/graph/building.rs:
1410-1455) with three global aggregates (df, N, avgdl).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .termstats import _tokens


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "text",
) -> DataFrame:
    """→ (query_id, doc_id, score): BM25 of every document that shares at
    least one term with the query (score is rounded to 6)."""
    toks = _tokens(docs, id_col, text_col)
    postings = toks.groupBy("id", "tok").agg(F.count("*").alias("tf"))
    # dl folds out of the postings (Σ tf per doc) — the raw token stream
    # is scanned and shuffled exactly once
    dl = postings.groupBy("id").agg(F.sum("tf").alias("dl"))
    dfreq = postings.groupBy("tok").agg(F.count("*").alias("df"))
    nd = docs.agg(F.count("*").alias("n_docs"))
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))
    qterms = (
        _tokens(queries, qid_col, qtext_col)
        .groupBy(F.col("id").alias("qid"), "tok")
        .agg(F.count("*").alias("qtf"))
    )
    k1l, bl = F.lit(float(k1)), F.lit(float(b))
    scored = (
        postings.join(F.broadcast(qterms), "tok")
        .join(F.broadcast(dfreq), "tok")
        .join(dl, "id")
        .crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(avgdl))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            ),
        )
        .withColumn(
            "part",
            F.col("qtf")
            * F.col("idf")
            * (F.col("tf") * (k1l + 1.0))
            / (
                F.col("tf")
                + k1l * (1.0 - bl + bl * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return (
        scored.groupBy(F.col("qid").alias(qid_col), F.col("id").alias(id_col))
        .agg(F.round(F.sum("part"), 6).alias("score"))
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int = 60,
    topn: int = 10,
    qid_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rk",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    of two per-query rankings → (query_id, doc_id, rrf, rk):

        rrf(d) = Σ_lists 1 / (k + rank_list(d))

    — the standard hybrid-retrieval combiner (lexical BM25 ⊕ embedding
    cosine): rank-based, so the two lists' incomparable score scales
    never need calibration. A document in only one list contributes only
    that term. Ties → lowest doc id.

    Scale contract: inputs are already top-k-per-query tables (tiny);
    fusion is one full-outer join on (query, doc), a row-local sum, and
    a |Q|-partition window. Zero corpus work."""
    a = ranked_a.select(
        F.col(qid_col).alias("q"), F.col(id_col).alias("d"),
        (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col))).alias("ra"),
    )
    b = ranked_b.select(
        F.col(qid_col).alias("q"), F.col(id_col).alias("d"),
        (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col))).alias("rb"),
    )
    fused = (
        a.join(b, ["q", "d"], "full_outer")
        .select(
            "q", "d",
            F.round(
                F.coalesce(F.col("ra"), F.lit(0.0))
                + F.coalesce(F.col("rb"), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    w = Window.partitionBy("q").orderBy(F.col("rrf").desc(), F.col("d").asc())
    return (
        fused.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= topn)
        .select(
            F.col("q").alias(qid_col), F.col("d").alias(id_col), "rrf", "rk"
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "text",
) -> DataFrame:
    """→ (query_id, doc_id, score, rk): the k highest-BM25 documents per
    query; ties break to the lowest doc id."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    s = bm25_scores(
        docs, queries, k1=k1, b=b,
        id_col=id_col, text_col=text_col, qid_col=qid_col, qtext_col=qtext_col,
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        s.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(qid_col, id_col, "score", "rk")
    )
