"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The GPT-3/Pile recipe: a training doc is contaminated when it shares at
least ``min_hits`` distinct n-gram shingles with any benchmark document;
contaminated docs are dropped before training so eval numbers measure
generalization, not memorization. Same shingle machinery as
``operators/dedup`` (word n-grams via array functions, no UDF), same
role the reference's build-time dedup plays for edges
(/root/reference/src/network/graph/building.rs:503-573): remove rows
whose content collides with a privileged set before downstream compute.

Scale design (the part that matters at 100 TB):

- The benchmark side is SMALL (eval suites are thousands of docs, the
  corpus is billions) — its distinct shingle set is **broadcast**, so the
  corpus NEVER shuffles for the membership test: one scan, a map-side
  broadcast left join, then one partial-aggregated groupBy(doc) whose
  shuffle carries only (doc_id, two counters).
- Output is proportional to the contamination mass (only docs with
  ``n_hits >= min_hits`` are returned), not the corpus.
- ``decontaminate`` anti-joins on doc id only — corpus rows never move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles


def contamination_stats(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
) -> DataFrame:
    """→ (id, sz, n_hits, overlap_frac) for every doc sharing ≥ ``min_hits``
    distinct n-gram shingles with the benchmark set.

    sz = the doc's distinct-shingle count, n_hits = how many of those also
    occur anywhere in the benchmark, overlap_frac = n_hits / sz. Docs with
    fewer than ``n`` tokens have no shingles and never appear.
    """
    bench_grams = shingles(
        benchmark,
        n=n,
        id_col=bench_id_col or id_col,
        text_col=bench_text_col or text_col,
    ).select("shingle").distinct()
    doc_sh = shingles(docs, n=n, id_col=id_col, text_col=text_col)
    # broadcast LEFT join marks each shingle in one map-side pass; the only
    # shuffle is the per-doc counter aggregation (map-side combined)
    marked = doc_sh.join(
        F.broadcast(bench_grams.withColumn("hit", F.lit(1))), "shingle", "left"
    )
    return (
        marked.groupBy("id")
        .agg(
            F.count("*").alias("sz"),
            F.coalesce(F.sum("hit"), F.lit(0)).alias("n_hits"),
        )
        .where(F.col("n_hits") >= min_hits)
        .withColumn(
            "overlap_frac",
            F.round(F.col("n_hits").cast("double") / F.col("sz"), 6),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
) -> DataFrame:
    """Drop contaminated docs: corpus rows anti-join on doc id only."""
    bad = contamination_stats(
        docs, benchmark, n, min_hits, id_col, text_col, bench_id_col, bench_text_col
    ).select(F.col("id").alias(id_col))
    return docs.join(bad, id_col, "left_anti")
