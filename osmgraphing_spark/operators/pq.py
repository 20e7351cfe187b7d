"""Product quantization (PQ) over embedding columns — exact-integer, with
asymmetric-distance (ADC) top-k search.

Jégou et al., "Product Quantization for Nearest Neighbor Search" (TPAMI
2011) setting: split the ``dim`` vector into ``m`` contiguous subspaces,
learn a k-cell codebook per subspace, and store each vector as m small
cell ids. A 64-dim float vector (256 B) becomes m bytes; search computes
distances against CODES, never raw vectors — the standard way to fit a
100 TB embedding corpus into a searchable index.

Portability contract (same as operators/kmeans): vectors live on the
int64 ``round(x·1024)`` grid, codebooks are trained with exact-integer
Lloyd (round-half-up means, ties to the lowest cell id, empty cells
retired), so codes and ADC distances after any number of iterations are
bit-reproducible in DuckDB — the driver oracle replays the whole
pipeline value-for-value.

Scale contract (100 TB):
- ``train_pq`` runs ONE corpus pass per Lloyd iteration for ALL m
  subspaces together: the mapInPandas stage assigns every subvector and
  emits per-batch PARTIAL (sub, cell, n, component-sums) rows, so the
  shuffle after map-side work is ≤ batches·m·k tiny rows reduced to
  m·k·(dim/m) cells by a posexplode groupBy. Training cost does not grow
  with m.
- ``pq_encode`` is map-only (one int64 matmul per Arrow batch per
  subspace against the broadcast m×k×(dim/m) codebook tensor).
- ``pq_topk`` never touches raw database vectors: a (queries × m × k)
  lookup table of exact subspace distances is broadcast onto the long
  code table; the per-(query, vector) ADC sum is an algebraic aggregate
  (map-side combinable) and top-k is one window over |Q| partitions.

Reference parity: beyond-reference training-data operator (the ANN
compression tier next to similarity.ivf/lsh); deterministic seeding
follows /root/reference/src/defaults.rs:1 SEED=42 discipline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import SEED
from .similarity import _quantized, int_centroids

#: per-subspace seed stride for the data-independent init codebooks —
#: subspace s starts from int_centroids(dim/m, k, seed + s*PQ_SEED_STRIDE)
PQ_SEED_STRIDE = 1000


def init_codebooks(
    dim: int, m: int, k: int, seed: int = SEED
) -> list[list[tuple[int, list[int]]]]:
    """Deterministic initial codebooks: for each subspace a list of
    (cell_id 1-based, components) on the integer grid. The oracle builds
    its VALUES literals from this same function."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    return [
        [(j + 1, c) for j, c in enumerate(int_centroids(dsub, k, seed + s * PQ_SEED_STRIDE))]
        for s in range(m)
    ]


def _codebook_arrays(books: list[list[tuple[int, list[int]]]]):
    """→ per-sub (cell_ids int64[ k_s ], C int64[ k_s × dsub ]) numpy views."""
    out = []
    for book in books:
        ids = np.asarray([cid for cid, _ in book], dtype=np.int64)
        C = np.asarray([c for _, c in book], dtype=np.int64)
        out.append((ids, C))
    return out


def _assign_batch(q: np.ndarray, ids: np.ndarray, C: np.ndarray):
    """(n, dsub) int64 subvectors → (cells (n,), dists (n,)) by exact
    squared L2; first (lowest cell id — books stay id-sorted) wins ties."""
    cc = (C * C).sum(axis=1)
    d = (q * q).sum(axis=1, keepdims=True) - 2 * (q @ C.T) + cc[None, :]
    j = d.argmin(axis=1)
    return ids[j], d[np.arange(len(j)), j]


def train_pq(
    df: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = SEED,
) -> list[list[tuple[int, list[int]]]]:
    """→ trained codebooks (same shape as `init_codebooks`). One corpus
    pass per iteration; reduce state is m·k·(dim/m) integers."""
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    dsub = dim // m
    qdf = df.select(_quantized(F.col(vec_col)).alias("_q"))
    books = init_codebooks(dim, m, k, seed)
    for _ in range(iters):
        arrs = _codebook_arrays(books)

        def partials(batch_iter, arrs=arrs):
            for pdf in batch_iter:
                if not len(pdf):
                    continue
                full = np.stack(pdf["_q"].to_numpy()).astype(np.int64)
                rows = {"sub": [], "cell": [], "n": [], "s": []}
                for s, (ids, C) in enumerate(arrs):
                    sub = full[:, s * dsub : (s + 1) * dsub]
                    cells, _ = _assign_batch(sub, ids, C)
                    for cid in np.unique(cells):
                        mask = cells == cid
                        rows["sub"].append(s)
                        rows["cell"].append(int(cid))
                        rows["n"].append(int(mask.sum()))
                        rows["s"].append(sub[mask].sum(axis=0).tolist())
                yield pd.DataFrame(rows)

        part = qdf.mapInPandas(
            partials, schema="sub int, cell int, n long, s array<long>"
        )
        stats = (
            part.select("sub", "cell", "n", F.posexplode("s").alias("i", "x"))
            .groupBy("sub", "cell", "i")
            .agg(F.sum("x").alias("sx"), F.sum("n").alias("sn"))
            .groupBy("sub", "cell")
            .agg(
                F.max("sn").alias("n"),
                F.array_sort(
                    F.collect_list(F.struct(F.col("i"), F.col("sx")))
                ).alias("sums"),
            )
            .collect()
        )
        new: list[list[tuple[int, list[int]]]] = [[] for _ in range(m)]
        for r in stats:
            n = int(r["n"])
            comp = [(2 * int(s["sx"]) + n) // (2 * n) for s in r["sums"]]
            new[r["sub"]].append((int(r["cell"]), comp))
        books = [sorted(b) for b in new]
    return books


def pq_encode(
    df: DataFrame,
    books: list[list[tuple[int, list[int]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (id, sub, cell, dist): the PQ code of every vector in long
    format — m rows per vector, ``dist`` the exact int64 squared L2 to
    the assigned sub-centroid (the value-checkable artifact). Map-only."""
    m = len(books)
    dsub = len(books[0][0][1])
    arrs = _codebook_arrays(books)

    def encode(batch_iter):
        for pdf in batch_iter:
            if not len(pdf):
                continue
            full = np.stack(pdf["_q"].to_numpy()).astype(np.int64)
            ids = pdf["id"].to_numpy()
            frames = []
            for s, (cids, C) in enumerate(arrs):
                cells, dists = _assign_batch(
                    full[:, s * dsub : (s + 1) * dsub], cids, C
                )
                frames.append(
                    pd.DataFrame(
                        {"id": ids, "sub": s, "cell": cells.astype(np.int32),
                         "dist": dists}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return (
        df.select(F.col(id_col).alias("id"), _quantized(F.col(vec_col)).alias("_q"))
        .mapInPandas(encode, schema="id long, sub int, cell int, dist long")
        .withColumnRenamed("id", id_col)
    )


def _codebook_df(spark, books: list[list[tuple[int, list[int]]]]) -> DataFrame:
    rows = [
        (s, cid, comps)
        for s, book in enumerate(books)
        for cid, comps in book
    ]
    return spark.createDataFrame(rows, "sub int, cell int, c array<long>")


def pq_topk(
    db: DataFrame,
    queries: DataFrame,
    books: list[list[tuple[int, list[int]]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: → (query_id, neighbor_id, adc_dist, rk) — the k nearest
    database CODES per query by asymmetric distance Σ_sub
    l2²(query_sub, centroid[code_sub]); exact integers end to end, ties
    to the lowest neighbor id. Raw database vectors are never read —
    only the (id, sub, cell) code table and the broadcast LUT."""
    spark = db.sparkSession
    m = len(books)
    dsub = len(books[0][0][1])
    codes = pq_encode(db, books, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"), "sub", "cell"
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), _quantized(F.col(vec_col)).alias("_q")
    )
    cb = _codebook_df(spark, books)
    # LUT: exact squared L2 of each query SUBvector to every sub-centroid
    qsub = F.slice(F.col("_q"), F.col("sub") * dsub + 1, dsub)
    lut = (
        qv.crossJoin(F.broadcast(cb))
        .select(
            "query_id", "sub", "cell",
            F.aggregate(
                F.zip_with(qsub, F.col("c"), lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("d"),
        )
    )
    adc = (
        codes.join(F.broadcast(lut), ["sub", "cell"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d").alias("adc_dist"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        adc.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rk")
    )
