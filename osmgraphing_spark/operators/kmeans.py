"""Distributed Lloyd k-means over embedding columns — exact-integer variant.

Completes the IVF story (operators/similarity.int_centroids gives
data-INDEPENDENT cells; this learns data-DEPENDENT centroids with the same
portability contract): vectors are quantized to int64 (round(x·1024), the
similarity.Q_SCALE grid), centroids live on the same integer grid, and the
per-iteration mean is computed with pure integer arithmetic — so cell
assignment after any number of iterations is bit-reproducible in ANY engine
(the DuckDB oracle replays every iteration value-for-value). Classic
float-mean Lloyd is NOT cross-engine reproducible: sum order changes the
low bits, ties flip, assignments diverge.

Per iteration:
  assign:  cell(v) = argmin_j ||q(v) − c_j||²  (exact int64; ties → lowest
           cell id) — ONE vectorized matmul per Arrow batch against the
           broadcast k×dim centroid matrix; map-only over the vectors.
  update:  c_j ← round_half_up(mean of member vectors), component-wise, as
           floor((2·Σx + n) / (2n)) on Python ints (exact); empty cells are
           RETIRED (k may shrink — deterministic in both engines).

Scale: the only shuffle is the k-row groupBy for the update (dim algebraic
sums + a count, map-side combined); centroids are k×dim scalars on the
driver — the same tier as a convergence aggregate. 100 TB of vectors
stream through the assignment matmul; k and dim bound the reduce state,
not the corpus.

Reference parity: the reference has no clustering; this is a
beyond-reference training-data operator (embedding-space bucketing for
near-dup mining and IVF index training) in the family of
similarity.ivf_assign (cited there: deterministic seeded design mirroring
/root/reference/src/defaults.rs:1 SEED=42 discipline).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import SEED, _quantized, int_centroids


def _assign(
    df: DataFrame, centroids: list[list[int]], id_col: str, vec_col: str
) -> DataFrame:
    """→ (id, cell int, dist long): nearest centroid by exact squared-L2.
    ``vec_col`` must ALREADY be on the int64 quantized grid (the caller
    quantizes once up front); ties break to the lowest cell id. cells are
    1-based positions in ``centroids`` (retired cells keep their ids)."""
    C = np.asarray([c for _, c in centroids], dtype=np.int64)  # (k, dim)
    cell_ids = np.asarray([cid for cid, _ in centroids], dtype=np.int64)
    cc = (C * C).sum(axis=1)  # (k,)

    def nearest(batch_iter):
        for pdf in batch_iter:
            if not len(pdf):
                continue
            q = np.stack(pdf[vec_col].to_numpy()).astype(np.int64)  # (n, dim)
            # dist_j = q·q − 2 q·c_j + c_j·c_j ; q·q is constant per row so
            # argmin only needs the cross terms, but we emit the full dist
            # (it is the value-checkable artifact)
            cross = q @ C.T  # (n, k) exact int64
            d = (q * q).sum(axis=1, keepdims=True) - 2 * cross + cc[None, :]
            j = d.argmin(axis=1)  # first (lowest index) wins ties;
            # centroids are kept sorted by cell id, so this IS min-cell-id
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "cell": cell_ids[j].astype(np.int32),
                    "dist": d[np.arange(len(j)), j],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        nearest, schema="id long, cell int, dist long"
    )


def lloyd_kmeans(
    df: DataFrame,
    dim: int,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = SEED,
) -> tuple[DataFrame, list[tuple[int, list[int]]]]:
    """Run ``iters`` Lloyd iterations from the deterministic integer seeds
    (similarity.int_centroids) → (assignment, final_centroids) where
    assignment = (<id_col> long, cell int, dist long) under the FINAL
    centroids and final_centroids = [(cell_id, [int components]), ...]
    (cells that lost all members along the way are retired)."""
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    qdf = df.select(
        F.col(id_col), _quantized(F.col(vec_col)).alias("_q")
    )
    cents: list[tuple[int, list[int]]] = [
        (j + 1, c) for j, c in enumerate(int_centroids(dim, k, seed))
    ]
    sum_aggs = [
        F.sum(F.element_at("_q", i + 1)).alias(f"s{i}") for i in range(dim)
    ]
    for _ in range(iters):
        assigned = _assign(qdf, cents, id_col, "_q")
        stats = (
            qdf.join(assigned.withColumnRenamed("id", id_col), id_col)
            .groupBy("cell")
            .agg(F.count("*").alias("n"), *sum_aggs)
            .collect()
        )
        new = []
        for r in stats:
            n = int(r["n"])
            comp = [(2 * int(r[f"s{i}"]) + n) // (2 * n) for i in range(dim)]
            new.append((int(r["cell"]), comp))
        cents = sorted(new)  # retired cells simply vanish; keep id order
        if not cents:  # every cell emptied (can't happen with k>=1 & rows>0)
            break
    final = _assign(qdf, cents, id_col, "_q").withColumnRenamed("id", id_col)
    return final, cents


def cluster_sizes(assignment: DataFrame) -> DataFrame:
    """→ (cell int, n long, mean_dist double): per-cluster population and
    mean exact-integer squared distance (rounded at 1e-6) — the compactness
    diagnostic. One algebraic aggregation."""
    return (
        assignment.groupBy("cell")
        .agg(F.count("*").alias("n"), F.round(F.avg("dist"), 6).alias("mean_dist"))
    )
