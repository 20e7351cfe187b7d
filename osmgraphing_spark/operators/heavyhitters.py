"""Heavy hitters: exact top-k terms, count-min sketch, sketch-then-verify
frequent terms.

The training-data pipeline's "what dominates this corpus?" pass: hot
tokens/n-grams drive stopword lists, boilerplate detection, BPE merge
seeds, and contamination triage. Three tiers:

- ``top_terms`` — exact global counts + top-k. A groupBy on the term is
  algebraic (map-side combine), so this is THE answer whenever the key
  domain is vocabulary-bounded (unigrams: Zipf ≈ 1e8 keys at web scale).
- ``cms_sketch`` / ``cms_estimate`` — count-min sketch as a plain
  algebraic aggregation into depth × width counters. The key domain never
  shuffles — only (row, col) cells do — so this is the tier for UNBOUNDED
  key domains (n-grams: vocabulary grows with the corpus) or when the
  counter table must fit a broadcast. Hashing is the same portable
  Kirsch-Mitzenmacher md5 double-hash family as MinHash
  (``dedup._portable_hash_pair``), so a SQL engine reproduces every cell
  exactly — sketches are value-checkable, not just plausible.
- ``frequent_terms`` — the composition real pipelines run at 100 TB:
  sketch pass (map-only into ≤ depth·width cells) → candidate cut (CMS
  overestimates, so ``est ≥ min_count`` has NO false negatives) → exact
  verify pass counting ONLY candidate-matching terms (semi-join pushed
  below the count). Output equals the exact answer; the corpus-sized
  groupBy over the full key domain never happens.

Reference analogue: the same aggregate-feeds-filter shape as the
reference's mean-normalization (an O(corpus) statistic gates per-row
work, /root/reference/src/network/graph/building.rs:1410-1455).

Scale notes:
- sketch pass: ONE corpus scan, explode to depth rows per term, groupBy
  (r, c) — ≤ depth·width distinct keys, fully map-side combined; shuffle
  volume is O(partitions · depth · width), independent of corpus size.
- hot cells are by construction the heaviest keys, but there are only
  depth·width of them — skew is capped by the sketch geometry itself.
- verify pass: candidates broadcast (≤ width per row can clear the bar,
  in practice ≪), so the second scan is map-only + one tiny aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _portable_hash_pair
from .termstats import _tokens


def terms_of(
    docs: DataFrame,
    n: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id, term): whitespace-token n-grams per document (n=1: the same
    tokenizer as termstats/dedup so oracles share one definition; n≥2:
    space-joined adjacent tokens via pos-ordered lead — no UDF)."""
    if n == 1:
        return _tokens(docs, id_col, text_col).select("id", F.col("tok").alias("term"))
    # map-only n-gram construction on the per-doc token ARRAY — a window
    # lead() would shuffle the whole exploded token stream by doc id; this
    # never shuffles. Guard: Spark's sequence(1, 0) counts DOWN, so docs
    # shorter than n get an explicit empty array.
    grams = F.expr(
        f"CASE WHEN size(_toks) >= {n} THEN "
        f"transform(sequence(1, size(_toks) - {n - 1}), "
        f"i -> concat_ws(' ', slice(_toks, i, {n}))) "
        f"ELSE array() END"
    )
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("_toks"),
        )
        .select("id", F.explode(grams).alias("term"))
    )


def term_counts(
    docs: DataFrame,
    n: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (term, cnt): exact global n-gram counts (algebraic groupBy)."""
    return terms_of(docs, n, id_col, text_col).groupBy("term").agg(
        F.count("*").alias("cnt")
    )


def top_terms(
    docs: DataFrame,
    k: int = 20,
    n: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (term, cnt, rank): exact top-k terms by (cnt DESC, term ASC) —
    the deterministic tie-break makes the output value-checkable.
    orderBy().limit(k) compiles to TakeOrderedAndProject (per-partition
    top-k, then a k-row merge — never a single-partition sort of the
    vocabulary); the rank window runs over only those k rows."""
    top = (
        term_counts(docs, n, id_col, text_col)
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    return top.withColumn("rank", F.row_number().over(w))


def _cms_cells(terms: DataFrame, depth: int, width: int) -> DataFrame:
    """(term, r, c): each term's depth sketch cells, h_r = (u + r·v) mod
    width over the 56-bit md5 slices — u + r·v < 2^59, no overflow, no
    modular-prime dance, bit-identical in any engine with md5."""
    u, v = _portable_hash_pair(F.col("term"))
    rows = F.array(*[
        F.struct(
            F.lit(r).alias("r"),
            ((u + F.lit(r) * v) % width).cast("int").alias("c"),
        )
        for r in range(depth)
    ])
    return terms.select("term", F.explode(rows).alias("cell")).select(
        "term", "cell.r", "cell.c"
    )


def cms_sketch(
    docs: DataFrame,
    depth: int = 4,
    width: int = 1024,
    n: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (r, c, cnt): count-min sketch of the corpus's n-gram stream —
    ≤ depth·width rows regardless of corpus size. Merging two corpora's
    sketches = unionAll + re-groupBy (the aggregation is algebraic), the
    property that makes the sketch a streaming/partitioned-combine fit."""
    cells = _cms_cells(terms_of(docs, n, id_col, text_col), depth, width)
    return cells.groupBy("r", "c").agg(F.count("*").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, terms: DataFrame, depth: int = 4, width: int = 1024
) -> DataFrame:
    """→ (term, est): CMS point estimate — min over the term's depth cells.
    Guarantee: est ≥ true count always; est ≤ true + ε·total w.h.p.
    (ε = e/width). ``terms`` is a (term) DataFrame; the sketch side is
    ≤ depth·width rows so the join broadcasts it."""
    cells = _cms_cells(terms.select("term").distinct(), depth, width)
    return (
        cells.join(F.broadcast(sketch), ["r", "c"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy("term")
        .agg(F.min("cnt").alias("est"))
    )


def frequent_terms(
    docs: DataFrame,
    min_count: int,
    depth: int = 4,
    width: int = 4096,
    n: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (term, cnt): EXACT counts of every term with true count ≥
    ``min_count``, computed without ever grouping the full key domain:
    sketch pass → no-false-negative candidate cut (CMS only overestimates)
    → exact verify restricted to candidates. Equals ``term_counts(...)
    .where(cnt ≥ min_count)`` by construction — the driver oracle checks
    exactly that — at sketch-pass cost instead of full-vocabulary-shuffle
    cost."""
    stream = terms_of(docs, n, id_col, text_col)
    sketch = cms_sketch(docs, depth, width, n, id_col, text_col)
    # per-occurrence candidate cut: depth broadcast lookups of the tiny
    # sketch, NO distinct over the key domain — the vocabulary never
    # shuffles; only occurrences that clear the (overestimating) bar
    # reach the final groupBy
    u, v = _portable_hash_pair(F.col("term"))
    occ = stream.select(
        "term",
        *[
            ((u + F.lit(r) * v) % width).cast("int").alias(f"_c{r}")
            for r in range(depth)
        ],
    )
    ests = []
    for r in range(depth):
        srow = sketch.where(F.col("r") == r).select(
            F.col("c").alias(f"_c{r}"), F.col("cnt").alias(f"_e{r}")
        )
        occ = occ.join(F.broadcast(srow), f"_c{r}", "left")
        ests.append(F.coalesce(F.col(f"_e{r}"), F.lit(0)))
    return (
        occ.where(F.least(*ests) >= min_count)
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )
