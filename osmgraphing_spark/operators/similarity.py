"""Similarity search over an embedding column (``embeddings`` table:
vec_id bigint, embedding array<float>, label int).

Two tiers, mirroring the engine-wide pattern of "exact baseline + scale
path" (DataFrame PageRank vs CSR SpMV):

- brute-force cosine top-k — exact; the oracle for everything else. The
  dot product is a built-in higher-order function (zip_with + aggregate):
  JVM-evaluated, no Python in the loop.
- LSH-bucketed ANN — random-hyperplane signs from a deterministic seeded
  projection; candidates only within matching buckets (multi-probe over
  bands). At 100 TB the bucket join replaces the V×Q cross join; recall is
  tested against the brute-force tier.
- IVF-style variant — coarse quantize to the nearest of k seeded
  centroids (built from a deterministic sample), search only the probe
  nearest cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..session import SEED


def _dot(a, b):
    # cast BEFORE multiplying: float×float loses bits a double product keeps
    # (and the SQL oracle multiplies doubles)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query → (query_id, neighbor_id,
    score). Deterministic tie-break (score DESC, neighbor_id ASC). The
    queries side is broadcast (it's the small side by construction)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec")
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "score", "rk")
    )


def contrastive_triplets(
    vectors: DataFrame,
    anchors: DataFrame,
    neg_max: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hard-triplet mining for contrastive training → one row per anchor
    (anchor_id, pos_id, pos_score, neg_id, neg_score):

    - positive  = the anchor's single nearest non-self neighbor by
      cosine (the in-batch positive);
    - hard negative = the HIGHEST-cosine vector whose score is still
      < ``neg_max`` — as similar as possible while staying outside the
      positive band, the negative that actually teaches the model
      (random negatives are trivially separable).

    Ties break (score DESC, id ASC). Anchors missing either side (e.g.
    every candidate scores ≥ neg_max) drop out.

    Scale contract (100 TB): this is the EXACT tier — anchors broadcast
    onto the corpus like `brute_force_topk`, one corpus pass, two
    windows over |anchors| partitions. For web-scale anchor sets swap
    the candidate generator for the LSH buckets (`ann_topk`) or IVF
    probes (`ivf_topk_portable`): the selection logic below is agnostic
    to where (anchor, candidate, score) rows come from."""
    a = anchors.select(F.col(id_col).alias("anchor_id"), F.col(vec_col).alias("a_vec"))
    v = vectors.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        v.crossJoin(F.broadcast(a))
        .where(F.col("cand_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "cand_id",
            F.round(cosine(F.col("a_vec"), F.col("c_vec")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("score").desc(), F.col("cand_id").asc()
    )
    pos = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "anchor_id",
            F.col("cand_id").alias("pos_id"),
            F.col("score").alias("pos_score"),
        )
    )
    neg = (
        scored.where(F.col("score") < neg_max)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "anchor_id",
            F.col("cand_id").alias("neg_id"),
            F.col("score").alias("neg_score"),
        )
    )
    return pos.join(neg, "anchor_id")


# ---------------------------------------------------------------------------
# LSH (random hyperplane) ANN
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, n_planes: int, seed: int = SEED) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_ids(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = SEED,
) -> DataFrame:
    """→ (id, table, bucket): sign-pattern bucket per hash table. The
    projection is a vectorized pandas UDF (one matrix multiply per Arrow
    batch — numpy BLAS, not per-row Python)."""
    planes = [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]

    def project(batch_iter):
        for pdf in batch_iter:
            mat = np.stack(pdf[vec_col].to_numpy())  # (rows, dim)
            out = []
            for t, P in enumerate(planes):
                signs = (mat @ P.T) > 0  # (rows, n_planes)
                bucket = (signs * (1 << np.arange(n_planes))).sum(axis=1)
                out.append(
                    pd.DataFrame(
                        {"id": pdf[id_col].to_numpy(), "table": t, "bucket": bucket}
                    )
                )
            yield pd.concat(out)

    return df.select(id_col, vec_col).mapInPandas(
        project, schema="id long, table int, bucket long"
    )


def ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing ≥1 (table, bucket)
    with the query, then exact cosine + window top-k on candidates only."""
    vb = lsh_bucket_ids(vectors, dim, n_planes, n_tables, id_col, vec_col)
    qb = lsh_bucket_ids(queries, dim, n_planes, n_tables, id_col, vec_col)
    cand = (
        vb.select("table", "bucket", F.col("id").alias("neighbor_id"))
        .join(
            F.broadcast(qb.select("table", "bucket", F.col("id").alias("query_id"))),
            ["table", "bucket"],
        )
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec"))
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(v, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "score", "rk")
    )


# ---------------------------------------------------------------------------
# portable (oracle-verifiable) integer-LSH ANN
# ---------------------------------------------------------------------------

Q_SCALE = 1024  # power of two: float32 * 1024 is EXACT in double


def int_hyperplanes(
    dim: int, n_planes: int = 8, n_tables: int = 4, seed: int = SEED
) -> list[list[list[int]]]:
    """Integer hyperplanes in [-1000, 1000] — same LSH family as gaussian
    hyperplanes (direction-uniform enough for bucketing), but the projection
    sign becomes an EXACT integer comparison, reproducible bit-for-bit in
    any engine: quantized vector (round(x·1024)) · integer plane stays far
    below 2^53, so even a double-based SQL engine computes it exactly."""
    rng = np.random.default_rng(seed)
    return rng.integers(-1000, 1001, size=(n_tables, n_planes, dim)).tolist()


def _quantized(vec_col):
    return F.transform(
        vec_col, lambda x: F.round(x.cast("double") * F.lit(float(Q_SCALE)), 0).cast("long")
    )


def _quantize_np(mat: np.ndarray) -> np.ndarray:
    """numpy replica of ``_quantized`` (Spark ``round(x*1024, 0)`` =
    HALF_UP, i.e. ties away from zero — np.rint would round ties to even):
    float32·1024 is exact in double, so both formulations see the same
    value and the tie-break is the only hazard."""
    v = mat.astype(np.float64) * Q_SCALE
    return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)).astype(np.int64)


def portable_bucket_ids(
    df: DataFrame,
    planes: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (id, table, bucket) like ``lsh_bucket_ids`` but over integer
    -quantized projections, exactly reproducible in the DuckDB oracle
    (exact int64 arithmetic on both sides).

    Computed as ONE vectorized Arrow batch (a single int64 matmul per hash
    table) rather than built-in column expressions: the expression
    formulation (n_tables × n_planes ``aggregate(zip_with(...))`` over
    dim-length literal arrays ≈ 2,000 literals) is higher-order-function
    interpreted, not codegen'd, and its Catalyst analysis alone cost ~20 s
    per query at dim=64 — the measured case where a tiny Arrow UDF beats
    "no Python at all"."""
    P = np.asarray(planes, dtype=np.int64)  # (tables, n_planes, dim)
    n_tables, n_planes, _ = P.shape
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    def project(batch_iter):
        for pdf in batch_iter:
            if not len(pdf):
                continue
            q = _quantize_np(np.stack(pdf[vec_col].to_numpy()))
            ids = pdf[id_col].to_numpy()
            for t in range(n_tables):
                proj = q @ P[t].T  # (rows, n_planes), exact int64
                bucket = ((proj > 0) * weights).sum(axis=1)
                yield pd.DataFrame(
                    {"id": ids, "table": np.full(len(ids), t, dtype=np.int32),
                     "bucket": bucket}
                )

    return df.select(id_col, vec_col).mapInPandas(
        project, schema="id long, table int, bucket long"
    )


def ann_topk_portable(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = SEED,
) -> DataFrame:
    """ann_topk with the portable integer-LSH bucketing: the candidate set
    (and hence the exact result) is SQL-reproducible, so the driver oracle
    value-checks the whole ANN pipeline. Same plan shape as ann_topk:
    bucket join replaces the V×Q cross join; exact rescoring + window top-k
    on candidates only."""
    planes = int_hyperplanes(dim, n_planes, n_tables, seed)
    vb = portable_bucket_ids(vectors, planes, id_col, vec_col)
    qb = portable_bucket_ids(queries, planes, id_col, vec_col)
    cand = (
        vb.select("table", "bucket", F.col("id").alias("neighbor_id"))
        .join(
            F.broadcast(qb.select("table", "bucket", F.col("id").alias("query_id"))),
            ["table", "bucket"],
        )
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec"))
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(v, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "score", "rk")
    )


def near_dup_pairs(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.42,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = SEED,
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS → (id_a < id_b, score ≥
    threshold): the dedup-by-embedding operator (the ANN functions answer
    "top-k for a query set"; dedup needs ALL close pairs corpus-wide).

    Candidates come from a self-join of the portable integer-LSH buckets —
    never the V² cross join — then exact cosine rescoring and the
    threshold filter. Because the bucketing is exact int64 arithmetic, the
    candidate set (hence the result) is SQL-reproducible and value-checked
    by the driver oracle. Recall vs brute force is the LSH dial: more
    tables / fewer planes raise recall, more planes shrink buckets (the
    per-bucket self-join is the quadratic hazard at scale — cap
    pathological buckets with ``max_bucket``, the hot-shingle ``max_df``
    analogue in dedup.jaccard_pairs)."""
    from ..plans.checkpoint import EphemeralTruncator

    planes = int_hyperplanes(dim, n_planes, n_tables, seed)
    # materialize the bucket map ONCE (parquet round-trip, no lingering
    # executor blocks): both self-join sides and the optional bucket-size
    # gate re-scan it, and re-deriving it re-runs the corpus scan + matmul
    # per consumer — the dominant waste at 100 TB (same fix as
    # dedup.lsh_candidate_pairs round 1 → 2)
    vb = EphemeralTruncator(vectors.sparkSession, "near-dup-buckets").truncate(
        portable_bucket_ids(vectors, planes, id_col, vec_col)
    )
    if max_bucket is not None:
        ok = (
            vb.groupBy("table", "bucket")
            .agg(F.count("*").alias("n"))
            .where(F.col("n") <= max_bucket)
            .select("table", "bucket")
        )
        vb = vb.join(ok, ["table", "bucket"])
    cand = (
        vb.select("table", "bucket", F.col("id").alias("id_a"))
        .join(vb.select("table", "bucket", F.col("id").alias("id_b")),
              ["table", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("a_vec"))
    vb2 = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("b_vec"))
    return (
        cand.join(va, "id_a")
        .join(vb2, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("a_vec"), F.col("b_vec")), 6).alias("score"),
        )
        .where(F.col("score") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF-style coarse quantization
# ---------------------------------------------------------------------------

def ivf_assign(
    vectors: DataFrame,
    n_cells: int = 16,
    sample_per_cell: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = SEED,
) -> tuple[DataFrame, np.ndarray]:
    """Deterministic IVF index: centroids = mean of seeded sample chunks
    (a k-means-free coarse quantizer — stable, no iterative fitting);
    → ((id, cell), centroids). Assignment is one vectorized matmul per
    Arrow batch."""
    sample = (
        vectors.orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(n_cells * sample_per_cell)
        .collect()
    )
    mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in sample])
    centroids = np.stack(
        [mat[i::n_cells].mean(axis=0) for i in range(n_cells)]
    )
    cnorm = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    def assign(batch_iter):
        for pdf in batch_iter:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            cell = (m @ cnorm.T).argmax(axis=1)
            yield pd.DataFrame({"id": pdf[id_col].to_numpy(), "cell": cell})

    assigned = vectors.select(id_col, vec_col).mapInPandas(
        assign, schema="id long, cell int"
    )
    return assigned, centroids


# ---------------------------------------------------------------------------
# Portable IVF search (coarse quantizer + probe + exact re-score)
# ---------------------------------------------------------------------------

def int_centroids(dim: int, n_cells: int = 8, seed: int = SEED) -> list[list[int]]:
    """Deterministic DATA-INDEPENDENT integer centroids in [-1000, 1000] —
    a random-projection coarse quantizer. Less balanced than k-means/
    sampled centroids (ivf_assign), but the cell of every vector becomes an
    EXACT integer argmax reproducible bit-for-bit in SQL, which is what
    lets the driver oracle value-check the whole IVF search path."""
    rng = np.random.default_rng(seed + 101)
    return rng.integers(-1000, 1001, size=(n_cells, dim)).tolist()


def portable_ivf_cells(
    df: DataFrame,
    centroids: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (id, scores array<long>, cell int): scores = exact integer dot
    products quantized-vec · centroid, cell = 1-based argmax score
    (first-occurrence ties — exact integers, so any engine agrees).

    One int64 matmul per Arrow batch, for the same reason as
    ``portable_bucket_ids``: the equivalent column-expression tree
    (n_cells × dim literal multiply-adds) pays seconds of Catalyst
    analysis per query and is interpreter-evaluated."""
    C = np.asarray(centroids, dtype=np.int64)  # (cells, dim)

    def score(batch_iter):
        for pdf in batch_iter:
            if not len(pdf):
                continue
            q = _quantize_np(np.stack(pdf[vec_col].to_numpy()))
            s = q @ C.T  # (rows, cells), exact int64
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "scores": list(s),
                    # np.argmax = first occurrence of the max, matching
                    # SQL array_position(scores, array_max(scores))
                    "cell": (s.argmax(axis=1) + 1).astype(np.int32),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        score, schema="id long, scores array<long>, cell int"
    )


def ivf_topk_portable(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = SEED,
) -> DataFrame:
    """IVF ANN: assign every vector to its best centroid cell, probe each
    query's ``nprobe`` best cells, exact-cosine re-score ONLY the vectors
    in probed cells, window top-k. The V×Q cross join becomes a cell-keyed
    join of V against Q×nprobe — the 100 TB search path (cells shard the
    corpus; per-cell scans are independent). Recall is gated in pytest
    against brute_force_topk; values are SQL-verified via int_centroids."""
    cents = int_centroids(dim, n_cells, seed)
    vc = portable_ivf_cells(vectors, cents, id_col, vec_col)
    qc = portable_ivf_cells(queries, cents, id_col, vec_col)

    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("s").desc(), F.col("cell").asc()
    )
    probes = (
        qc.select(
            F.col("id").alias("query_id"),
            F.posexplode(F.col("scores")).alias("cell0", "s"),
        )
        .select("query_id", (F.col("cell0") + 1).cast("int").alias("cell"), "s")
        .withColumn("prk", F.row_number().over(probe_w))
        .where(F.col("prk") <= nprobe)
        .select("query_id", "cell")
    )
    cand = (
        vc.select("cell", F.col("id").alias("neighbor_id"))
        .join(F.broadcast(probes), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec"))
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(v, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "score", "rk")
    )
