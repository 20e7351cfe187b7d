"""SemDeDup — semantic deduplication of an embedding corpus
(Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", 2023 problem setting).

Whole-corpus cosine dedup is a V² join; SemDeDup's observation is that
semantic near-dups collapse into the same k-means cluster, so it
suffices to (1) cluster, (2) compare pairs WITHIN each cluster, (3) keep
one representative per near-dup group. Recall is by construction limited
to within-cluster pairs — k is the dial: more clusters ⇒ smaller cells ⇒
cheaper pair joins but more cross-cell misses.

Built on the exact-integer Lloyd of operators/kmeans, so cluster
assignment — and therefore the candidate set and every score — is
bit-reproducible in the DuckDB oracle.

Scale contract (100 TB): the clustering pass is linear (one corpus pass
per Lloyd iteration); the pair join is quadratic ONLY within a cell, so
k must scale with the corpus to hold expected cell size constant
(k ≈ N / target_cell). ``max_cell`` hard-caps pathological cells (the
hot-bucket analogue of dedup.jaccard_pairs' max_df). The survivor rule
is the deterministic greedy one: drop any vector that has a ≥-threshold
partner with a smaller id — one distinct + one anti-join, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import EphemeralTruncator
from ..session import SEED
from .kmeans import lloyd_kmeans
from .similarity import cosine


def semantic_pairs(
    vectors: DataFrame,
    dim: int,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = SEED,
    max_cell: int | None = None,
) -> DataFrame:
    """→ (id_a < id_b, cell, score): within-cluster pairs with cosine ≥
    ``threshold`` under the exact-integer k-means cells."""
    assigned, _ = lloyd_kmeans(
        vectors, dim=dim, k=k, iters=iters, id_col=id_col, vec_col=vec_col, seed=seed
    )
    cells = EphemeralTruncator(vectors.sparkSession, "semdedup-cells").truncate(
        assigned.select(F.col(id_col).alias("id"), "cell")
    )
    if max_cell is not None:
        ok = (
            cells.groupBy("cell")
            .agg(F.count("*").alias("n"))
            .where(F.col("n") <= max_cell)
            .select("cell")
        )
        cells = cells.join(ok, "cell")
    cand = (
        cells.select("cell", F.col("id").alias("id_a"))
        .join(cells.select("cell", F.col("id").alias("id_b")), "cell")
        .where(F.col("id_a") < F.col("id_b"))
    )
    va = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("a_vec"))
    vb = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("b_vec"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            "cell",
            F.round(cosine(F.col("a_vec"), F.col("b_vec")), 6).alias("score"),
        )
        .where(F.col("score") >= threshold)
    )


def semantic_survivors(
    vectors: DataFrame,
    dim: int,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = SEED,
    max_cell: int | None = None,
) -> DataFrame:
    """→ the deduplicated corpus: every vector that has NO ≥-threshold
    within-cluster partner with a smaller id survives (greedy min-id
    representative per near-dup group; deterministic, single pass over
    the pair set)."""
    pairs = semantic_pairs(
        vectors, dim, k=k, iters=iters, threshold=threshold,
        id_col=id_col, vec_col=vec_col, seed=seed, max_cell=max_cell,
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return vectors.join(losers, id_col, "left_anti")
