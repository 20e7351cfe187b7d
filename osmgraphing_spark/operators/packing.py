"""Training-batch assembly: deterministic epoch shuffle + sequence packing.

The last mile of a training-data pipeline: after dedup/filter/sampling the
corpus must be (a) SHUFFLED into a reproducible epoch order and sharded so
every data-loader rank reads a disjoint slice, and (b) PACKED into
fixed-capacity token sequences (greedy next-fit: concatenate documents in
shard order, cut a new sequence when the next doc would overflow) so GPU
batches waste no padding. The reference engine has no analogue (it is a
road-graph pipeline); these are beyond-reference training-data operators in
the same family as sampling/stratified_sample.

Determinism contract (the whole point): epoch order is a pure function of
(seed, doc key) via the portable md5 hash — independent of partitioning,
retries, engine, and cluster size, unlike ``df.orderBy(rand(seed))`` whose
sample order changes with the partitioning. The DuckDB oracle reproduces
shard assignment, within-shard order, and every packed bin boundary
value-for-value.

Scale design:
- shard assignment is MAP-ONLY (a hash mod); the only shuffle is the
  repartition-by-shard that packing needs anyway. ``n_shards`` is the
  parallelism knob: choose it so a shard (≈ corpus/n_shards tokens) fits
  one task — at 100 TB that is O(100k) shards, each packed independently.
- within-shard packing is inherently sequential (bin boundaries depend on
  the running fill), so it runs as ONE ``applyInPandas`` pass per shard —
  numpy cumsum-style, no per-row Python. Cross-shard there is full
  parallelism; no global order is ever materialized (a global next-fit
  would serialize the corpus through one task — the anti-scale shape).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

#: md5-prefix resolution for shard bucketing (56 bits, same base as
#: sampling._bucket so the oracle SQL shares one idiom)
_HEX_PREFIX = 14


def _epoch_hash(seed: int, key_cols: list) -> F.Column:
    """Portable per-row epoch hash: md5('<seed>|' || key). The seed is
    part of the hashed payload, so every epoch is a fresh permutation."""
    parts = [F.lit(str(int(seed)))] + [c.cast("string") for c in key_cols]
    return F.md5(F.concat_ws("|", *parts))


def epoch_shuffle(
    df: DataFrame,
    seed: int,
    n_shards: int,
    key_cols: list[str],
) -> DataFrame:
    """→ input columns + (shard int, pos long): a deterministic epoch
    permutation. shard = 56-bit md5 prefix mod n_shards (map-only);
    pos = rank of the md5 hex within the shard (one shuffle by shard).
    Same (seed, keys) ⇒ same order on any engine/partitioning/retry."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = _epoch_hash(seed, [F.col(c) for c in key_cols])
    u = F.conv(F.substring(h, 1, _HEX_PREFIX), 16, 10).cast("long")
    shard = (u % F.lit(n_shards)).cast("int")
    out = df.withColumn("_h", h).withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy(F.col("_h"), *[F.col(c) for c in key_cols])
    return (
        out.withColumn("pos", F.row_number().over(w).cast("long") - 1)
        .drop("_h")
    )


def pack_sequences(
    df: DataFrame,
    capacity: int,
    seed: int,
    n_shards: int,
    id_col: str,
    tokens_col: str,
) -> DataFrame:
    """→ (shard int, pos long, <id_col> long, n_tokens long, seq_id long):
    greedy next-fit packing of documents into fixed-``capacity`` token
    sequences, per epoch shard.

    Within a shard (epoch_shuffle order) documents are appended to the
    current sequence; when ``fill + n_tokens > capacity`` a new sequence
    starts. A document longer than ``capacity`` gets a sequence of its own
    (callers chunk oversize docs upstream if they must fit). seq_id is
    0-based per shard; (shard, seq_id) is the global sequence key.

    Next-fit (not best-fit/first-fit) is the streaming-friendly choice:
    one sequential pass, bin boundaries a pure function of the ordered
    token counts — which is exactly what makes it value-checkable in SQL.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    ordered = epoch_shuffle(
        df.select(F.col(id_col), F.col(tokens_col).cast("long").alias("n_tokens")),
        seed,
        n_shards,
        [id_col],
    )

    cap = int(capacity)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pos", kind="mergesort")
        toks = pdf["n_tokens"].to_numpy(dtype=np.int64)
        seq = np.zeros(len(toks), dtype=np.int64)
        fill = 0
        sid = 0
        for i, n in enumerate(toks):
            if i > 0 and fill + n > cap:
                sid += 1
                fill = 0
            seq[i] = sid
            fill += n
        out = pdf[["shard", "pos", id_col, "n_tokens"]].copy()
        out["seq_id"] = seq
        return out

    return ordered.groupBy("shard").applyInPandas(
        pack,
        schema=f"shard int, pos long, {id_col} long, n_tokens long, seq_id long",
    )


def packing_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """→ (shard int, n_seqs long, n_docs long, fill_ratio double): per-shard
    packing efficiency — the metric that tells you whether capacity /
    doc-length distribution wastes GPU batch space. One algebraic
    aggregation; fill_ratio = total tokens / (n_seqs · capacity), with
    oversize single-doc sequences allowed to push it past 1.0 within their
    own sequence (they are clamped nowhere — visibility beats prettiness).
    """
    return (
        packed.groupBy("shard")
        .agg(
            (F.max("seq_id") + 1).alias("n_seqs"),
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("_tok"),
        )
        .select(
            "shard",
            "n_seqs",
            "n_docs",
            F.round(
                F.col("_tok") / (F.col("n_seqs") * F.lit(float(capacity))), 6
            ).alias("fill_ratio"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    window: int = 512,
    stride: int = 384,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Long-context chunking → (id, chunk_id, n_tokens, chunk_text):
    token-level sliding windows of ``window`` tokens advancing by
    ``stride`` (overlap = window − stride), the standard prep for
    training sequences longer than a document boundary. Chunk k covers
    tokens [k·stride, k·stride + window); the last chunk is the first
    one reaching the document's end (shorter than ``window`` only when
    the doc is), so every token is covered and no chunk is redundant.

    Scale contract (100 TB): pure column expressions — tokenize, a
    sequence of window starts, slice + explode — fused into the corpus
    scan; zero shuffle, zero UDF. Output row count is
    ≈ n_tokens/stride per doc (the overlap factor), the documented
    storage amplification of overlapped chunking."""
    if window < 1 or stride < 1 or stride > window:
        raise ValueError(
            f"need 1 <= stride <= window, got window={window} stride={stride}"
        )
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size(toks)
    last_k = F.greatest(
        F.lit(0), F.ceil((n - F.lit(window)) / F.lit(stride)).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), last_k),
        lambda k: F.struct(
            k.cast("int").alias("k"),
            F.array_join(
                F.slice(toks, k * stride + 1, window), " "
            ).alias("txt"),
            F.least(n - k * stride, F.lit(window)).alias("nt"),
        ),
    )
    return (
        docs.select(F.col(id_col).alias("id"), F.explode(chunks).alias("c"))
        .select(
            F.col("id").alias(id_col),
            F.col("c.k").alias("chunk_id"),
            F.col("c.nt").alias("n_tokens"),
            F.col("c.txt").alias("chunk_text"),
        )
    )
