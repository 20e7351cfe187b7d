"""Repetition-based quality statistics over a document table.

Gopher/C4-style repetition filters for training-data curation — the
fraction of a document covered by its most frequent n-gram, and the
duplicate-token fraction.  These extend the reference's per-row metric
derivations (/root/reference/src/network/graph/building.rs:1130-1318)
with the aggregation tier a text corpus needs: per-(doc, ngram) counts
followed by a per-doc argmax.

Scale shape (100 TB corpus):
- ``top_ngram_stats`` is explode → two keyed aggregations.  The first is
  keyed by (doc_id, ngram): a pathologically long document spreads over
  as many keys as it has distinct n-grams, so no single reducer sees the
  whole doc.  The second is keyed by doc_id with an *algebraic* min-struct
  aggregate (count DESC, ngram ASC encoded as one orderable struct), so it
  map-side combines to one row per partition per doc — the same trick the
  LPA superstep uses to avoid a window sort.
- ``dup_token_fraction`` (in functions/text.py) is a pure column
  expression: no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ngram_array(text: Column, n: int) -> Column:
    """Lower-cased whitespace-token n-grams as an array<string>; documents
    with fewer than ``n`` tokens yield an empty array (never a reversed
    ``sequence``, which Spark would happily produce for start > stop)."""
    from ..functions.text import sliding_ngrams

    toks = F.split(F.lower(F.trim(text)), r"\s+")
    return sliding_ngrams(toks, n)


def top_ngram_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Per-document most-frequent n-gram and the fraction of the document's
    n-gram instances it accounts for.

    Returns (id_col, top_ngram, top_ngram_cnt, n_ngrams, top_ngram_frac);
    documents with fewer than ``n`` tokens are absent from the result.
    Ties break deterministically: highest count, then lexicographically
    smallest n-gram.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    grams = df.select(
        F.col(id_col),
        F.explode(_ngram_array(F.col(text_col), n)).alias("ngram"),
    )
    counts = grams.groupBy(id_col, "ngram").agg(F.count("*").alias("cnt"))
    # argmax as one algebraic aggregate: min over struct(-cnt, ngram)
    # orders by cnt DESC then ngram ASC, and map-side combines.
    best = counts.groupBy(id_col).agg(
        F.min(
            F.struct((-F.col("cnt")).alias("neg_cnt"), F.col("ngram").alias("g"))
        ).alias("top"),
        F.sum("cnt").alias("n_ngrams"),
    )
    return best.select(
        id_col,
        F.col("top.g").alias("top_ngram"),
        (-F.col("top.neg_cnt")).alias("top_ngram_cnt"),
        F.col("n_ngrams"),
        F.round(
            (-F.col("top.neg_cnt")).cast("double") / F.col("n_ngrams"),
            6,
        ).alias("top_ngram_frac"),
    )
