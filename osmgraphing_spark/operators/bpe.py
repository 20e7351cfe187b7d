"""Byte-pair-encoding tokenizer training — the classic LLM-pipeline op.

Beyond-reference extension (training-data tier, same family as
termstats/heavyhitters): learn a BPE merge table from the corpus itself
(Sennrich et al. 2016 — word-level BPE: symbols start as characters,
each round merges the globally most frequent adjacent symbol pair), then
tokenize documents with it. This upgrades the survey's "token counting
(BPE-ish regex)" item to a real trained subword tokenizer.

Scale design — the whole point of word-level BPE at 100 TB:
- ONE corpus pass builds the word histogram (explode + groupBy word,
  map-side combine); every training round after that runs on the
  histogram frame, which is VOCABULARY-bounded (≪ corpus, millions of
  rows at web scale, thousands here), never on the corpus.
- per round: one adjacent-pair explode + algebraic groupBy(pair) +
  top-1 (the winning pair is a scalar collected like a convergence
  metric, exactly the k-means-centroid pattern), then one pure
  higher-order-function column rewrite (F.aggregate fold) applies the
  merge — no UDF, no Python row loop, whole-stage codegen throughout.
- tokenization = the k-merge fold applied to the DISTINCT-word map,
  broadcast-joined back to the exploded corpus: the expensive part is
  vocab-sized, the corpus-sized part is one broadcast join.
- determinism: ties on pair count break lexicographically on (lhs, rhs),
  so the merge table is identical across partitionings, retries and
  engines — the DuckDB oracle replays training round-for-round with a
  sentinel-string replace() whose leftmost-nonoverlapping semantics
  match the fold's.

Reference anchor: the reference's parser vocabulary/classifier tables
(/root/reference/src/configs/parsing/mod.rs:86-142) are static config;
this operator derives the vocabulary from data instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["word_histogram", "train_bpe", "bpe_token_counts"]

_WORD_RE = "^[a-z]+$"


def word_histogram(
    docs: DataFrame, text_col: str = "text", word_re: str = _WORD_RE
) -> DataFrame:
    """→ (word, freq): lowercase whitespace words (filtered to
    ``word_re`` so downstream sentinel representations stay injective)
    with corpus occurrence counts. One corpus pass; output is
    vocabulary-bounded."""
    return (
        docs.select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("word")
        )
        .where((F.col("word") != "") & F.col("word").rlike(word_re))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _merge_fold(col, lhs: str, rhs: str):
    """Apply ONE merge (lhs, rhs) → lhs||rhs to a symbol array, greedy
    leftmost-nonoverlapping (standard BPE application): fold elements,
    merging when the accumulator's last symbol is ``lhs`` and the current
    one is ``rhs``. Pure column expression — no UDF."""
    merged = lhs + rhs
    return F.aggregate(
        col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(lhs))
            & (x == F.lit(rhs)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _adjacent_pair_counts(hist: DataFrame) -> DataFrame:
    """→ (lhs, rhs, cnt): adjacent symbol-pair counts over the histogram,
    weighted by word frequency (every occurrence of a pair in a word
    counts, overlapping included — standard BPE get_stats)."""
    pairs = hist.select(
        "freq",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("syms"), F.lit(1), F.size("syms") - 1).alias(
                    "lhs"
                ),
                F.slice(F.col("syms"), F.lit(2), F.size("syms") - 1).alias(
                    "rhs"
                ),
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs")
    ).agg(F.sum("freq").alias("cnt"))


def train_bpe(
    docs: DataFrame,
    merges: int,
    text_col: str = "text",
    word_re: str = _WORD_RE,
) -> list[tuple[int, str, str, str, int]]:
    """Learn ``merges`` BPE merges from the corpus. → list of
    (rank, lhs, rhs, merged, pair_count), rank 1-based in merge order.

    The winning pair per round is a one-row collect (driver-held model
    state, like k-means centroids); everything corpus- or vocab-sized
    stays distributed. Stops early when no adjacent pair remains."""
    hist = word_histogram(docs, text_col, word_re).select(
        F.split(F.col("word"), "").alias("syms"), "freq"
    )
    hist = hist.localCheckpoint(eager=True)  # truncate; histogram is small
    out: list[tuple[int, str, str, str, int]] = []
    for r in range(1, merges + 1):
        top = (
            _adjacent_pair_counts(hist)
            .orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        lhs, rhs, cnt = top[0]["lhs"], top[0]["rhs"], int(top[0]["cnt"])
        out.append((r, lhs, rhs, lhs + rhs, cnt))
        nxt = hist.select(
            _merge_fold(F.col("syms"), lhs, rhs).alias("syms"), "freq"
        )
        hist = nxt.localCheckpoint(eager=True)
    return out


def merges_df(spark: SparkSession, merges) -> DataFrame:
    """Merge list → DataFrame (rank, lhs, rhs, merged, pair_count)."""
    return spark.createDataFrame(
        merges, "rank int, lhs string, rhs string, merged string, pair_count long"
    )


def bpe_token_counts(
    docs: DataFrame,
    merges,
    id_col: str = "doc_id",
    text_col: str = "text",
    word_re: str = _WORD_RE,
) -> DataFrame:
    """→ (id, n_words, n_tokens): per-document word and BPE token counts
    under a trained merge list (tokenizing only ``word_re`` words, the
    same filter training saw).

    Plan: the k-merge fold runs once per DISTINCT word (vocab-bounded),
    then broadcast-joins onto the exploded corpus — the corpus-sized side
    does one explode and one broadcast join, nothing quadratic."""
    words = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("word"),
    ).where((F.col("word") != "") & F.col("word").rlike(word_re))
    wmap = words.select("word").distinct().select(
        "word", F.split(F.col("word"), "").alias("syms")
    )
    col = F.col("syms")
    for _, lhs, rhs, _, _ in merges:
        col = _merge_fold(col, lhs, rhs)
    wmap = wmap.select("word", F.size(col).alias("n_tok"))
    return (
        words.join(F.broadcast(wmap), "word")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )
