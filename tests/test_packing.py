"""Epoch shuffle, sequence packing, mixture sampling — python-mirror oracles.

The contract under test is DETERMINISM: every output (shard, order, bin
boundary, mixture membership) must be a pure function of (seed, keys),
reproduced here by a hashlib.md5 mirror, and invariant under
repartitioning.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from osmgraphing_spark.operators import packing, sampling


def _h(seed: int, *keys) -> str:
    return hashlib.md5("|".join([str(seed)] + [str(k) for k in keys]).encode()).hexdigest()


def _shard_of(seed: int, key, n_shards: int) -> int:
    return int(_h(seed, key)[:14], 16) % n_shards


def _py_epoch(ids, seed, n_shards):
    """→ {doc_id: (shard, pos)} — the mirror of packing.epoch_shuffle."""
    by_shard = {}
    for i in ids:
        by_shard.setdefault(_shard_of(seed, i, n_shards), []).append(i)
    out = {}
    for s, members in by_shard.items():
        members.sort(key=lambda i: (_h(seed, i), str(i)))
        for pos, i in enumerate(members):
            out[i] = (s, pos)
    return out


def _py_pack(ids_tokens, seed, n_shards, cap):
    """→ {doc_id: (shard, pos, seq_id)} — mirror of pack_sequences."""
    order = _py_epoch([i for i, _ in ids_tokens], seed, n_shards)
    toks = dict(ids_tokens)
    by_shard = {}
    for i, (s, pos) in order.items():
        by_shard.setdefault(s, []).append((pos, i))
    out = {}
    for s, members in by_shard.items():
        members.sort()
        fill, sid = 0, 0
        for k, (pos, i) in enumerate(members):
            n = toks[i]
            if k > 0 and fill + n > cap:
                sid += 1
                fill = 0
            out[i] = (s, pos, sid)
            fill += n
    return out


def test_epoch_shuffle_matches_mirror_and_partition_invariant(spark):
    ids = list(range(120))
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = packing.epoch_shuffle(df, seed=7, n_shards=4, key_cols=["doc_id"])
    rows = {r["doc_id"]: (r["shard"], r["pos"]) for r in got.collect()}
    assert rows == _py_epoch(ids, 7, 4)

    again = packing.epoch_shuffle(
        df.repartition(11), seed=7, n_shards=4, key_cols=["doc_id"]
    )
    assert {r["doc_id"]: (r["shard"], r["pos"]) for r in again.collect()} == rows


def test_epoch_shuffle_new_seed_new_permutation(spark):
    ids = list(range(200))
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    a = packing.epoch_shuffle(df, seed=1, n_shards=2, key_cols=["doc_id"])
    b = packing.epoch_shuffle(df, seed=2, n_shards=2, key_cols=["doc_id"])
    am = {r["doc_id"]: (r["shard"], r["pos"]) for r in a.collect()}
    bm = {r["doc_id"]: (r["shard"], r["pos"]) for r in b.collect()}
    assert am != bm  # a fresh permutation per epoch
    assert set(am) == set(bm) == set(ids)  # ...of the same corpus


def test_pack_sequences_matches_mirror(spark):
    # token counts spanning tiny → oversize (> capacity)
    rows = [(i, (i * 37) % 90 + 1) for i in range(150)] + [(900, 512), (901, 300)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    got = packing.pack_sequences(
        df, capacity=256, seed=3, n_shards=3, id_col="doc_id", tokens_col="n_tokens"
    )
    out = {r["doc_id"]: (r["shard"], r["pos"], r["seq_id"]) for r in got.collect()}
    assert out == _py_pack(rows, 3, 3, 256)


def test_pack_sequences_capacity_respected_except_oversize(spark):
    rows = [(i, 100) for i in range(40)] + [(999, 1000)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    packed = packing.pack_sequences(
        df, capacity=250, seed=0, n_shards=2, id_col="doc_id", tokens_col="n_tokens"
    )
    fills = (
        packed.groupBy("shard", "seq_id")
        .agg(F.sum("n_tokens").alias("fill"), F.count("*").alias("n"))
        .collect()
    )
    for r in fills:
        # a sequence either fits the capacity or is a single oversize doc
        assert r["fill"] <= 250 or r["n"] == 1
    # the oversize doc sits alone
    oversize = packed.where(F.col("doc_id") == 999).collect()[0]
    mates = packed.where(
        (F.col("shard") == oversize["shard"]) & (F.col("seq_id") == oversize["seq_id"])
    ).count()
    assert mates == 1


def test_packing_stats_fill_ratio(spark):
    rows = [(i, 128) for i in range(16)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    packed = packing.pack_sequences(
        df, capacity=256, seed=0, n_shards=1, id_col="doc_id", tokens_col="n_tokens"
    )
    stats = packing.packing_stats(packed, capacity=256).collect()
    assert len(stats) == 1
    s = stats[0]
    # 16 docs × 128 tok pack perfectly 2-per-sequence: fill ratio exactly 1
    assert s["n_docs"] == 16 and s["n_seqs"] == 8 and s["fill_ratio"] == 1.0


def test_mixture_sample_matches_mirror_and_rates(spark):
    rows = [(i, ["web", "books", "logs"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    weights = {"web": 0.3, "books": 1.0}  # logs absent → dropped
    got = sampling.mixture_sample(df, weights, "source", key_cols=["doc_id"])
    kept = {r["doc_id"] for r in got.collect()}

    expect = set()
    for i, src in rows:
        w = weights.get(src, 0.0)
        bucket = int(_h_raw(i)[:14], 16) % 1_000_000
        if bucket < round(w * 1_000_000):
            expect.add(i)
    assert kept == expect
    # every books row kept, no logs row kept, web ≈ 30 %
    assert all(("books" == s) <= (i in kept) for i, s in rows)
    assert not any(s == "logs" and i in kept for i, s in rows)
    n_web = sum(1 for i, s in rows if s == "web" and i in kept)
    assert 0.2 < n_web / 1000 < 0.4


def _h_raw(key) -> str:
    return hashlib.md5(str(key).encode()).hexdigest()


def test_chunk_documents_cover_and_overlap(spark):
    from osmgraphing_spark.operators.packing import chunk_documents

    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame(
        [(0, text), (1, "a b"), (2, "solo")], "doc_id long, text string"
    )
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(df, window=4, stride=3).collect()
    )
    # doc 0: 10 tokens, window 4 stride 3 -> starts 0,3,6 (start 6 reaches
    # the end: 6+4 >= 10), chunks t0..t3 / t3..t6 / t6..t9
    d0 = [r for r in rows if r[0] == 0]
    assert [r[1] for r in d0] == [0, 1, 2]
    assert d0[0][3] == "t0 t1 t2 t3"
    assert d0[1][3] == "t3 t4 t5 t6"
    assert d0[2][3] == "t6 t7 t8 t9"
    assert all(r[2] == 4 for r in d0)
    # every token of doc 0 appears in some chunk
    covered = set(" ".join(r[3] for r in d0).split())
    assert covered == {f"t{i}" for i in range(10)}
    # short docs: a single (possibly short) chunk
    assert [r for r in rows if r[0] == 1] == [(1, 0, 2, "a b")]
    assert [r for r in rows if r[0] == 2] == [(2, 0, 1, "solo")]


def test_chunk_documents_validation(spark):
    import pytest as pt

    from osmgraphing_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pt.raises(ValueError):
        chunk_documents(df, window=4, stride=5)
