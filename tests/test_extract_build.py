"""Golden graph-construction tests — the layer the reference covers in
tests/small/parsing.rs:30-141 (exact node set, exact edge set, dedup counts,
metric values at 1e-6) plus the per-row sha256 invariant."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmgraphing_spark.operators import extract as ex
from osmgraphing_spark.operators.build import build_csr_blocks, build_graph, dedup_edges
from osmgraphing_spark.sources import synth

from .helpers import build_fixture, stem_vids


def test_sha256_invariant_ok(spark):
    corpus = synth.fixture_corpus(spark, ("small",))
    ref = synth.reference_hashes(corpus)
    ex.verify_content_hashes(corpus, ref)  # must not raise
    # engine hash == independent hashlib hash, per row
    rows = corpus.collect()
    expected = {
        (r["repo"], r["path"]): hashlib.sha256(r["content"].encode()).hexdigest()
        for r in rows
    }
    got = {
        (r["repo"], r["path"]): r["content_sha256"]
        for r in ref.collect()
    }
    assert got == expected


def test_sha256_invariant_detects_corruption(spark):
    corpus = synth.fixture_corpus(spark, ("small",))
    ref = synth.reference_hashes(corpus)
    corrupted = corpus.withColumn(
        "content",
        F.when(F.col("path") == "src/b.py", F.concat(F.col("content"), F.lit("x")))
        .otherwise(F.col("content")),
    )
    with pytest.raises(ex.Sha256MismatchError):
        ex.verify_content_hashes(corrupted, ref)


def test_fused_verify_detects_corruption_at_scan(spark):
    """extract_edges(verify=True) aborts the job from INSIDE the extraction
    scan when a row's content no longer matches the reference hash."""
    corpus = synth.fixture_corpus(spark, ("small",))
    ref = synth.reference_hashes(corpus)
    corrupted = corpus.withColumn(
        "content",
        F.when(F.col("path") == "src/b.py", F.concat(F.col("content"), F.lit("x")))
        .otherwise(F.col("content")),
    )
    edges = ex.extract_edges(corrupted, ref, verify=True)
    with pytest.raises(Exception) as ei:
        edges.count()
    assert "sha256 invariant" in str(ei.value)


def test_fused_verify_detects_missing_reference_row(spark):
    corpus = synth.fixture_corpus(spark, ("small",))
    ref = synth.reference_hashes(corpus).where(F.col("path") != "src/b.py")
    edges = ex.extract_edges(corpus, ref, verify=True)
    with pytest.raises(Exception) as ei:
        edges.count()
    assert "sha256 invariant" in str(ei.value)


def test_fused_verify_single_content_scan(spark, tmp_path):
    """The sha256 check shares the extraction's ONE scan of `content`
    (the standalone verify_content_hashes costs a second full corpus scan;
    the fused path must not)."""
    import re

    corpus = synth.fixture_corpus(spark, ("small",))
    corpus.write.parquet(str(tmp_path / "corpus"))
    synth.reference_hashes(corpus).write.parquet(str(tmp_path / "ref"))
    c = spark.read.parquet(str(tmp_path / "corpus"))
    r = spark.read.parquet(str(tmp_path / "ref"))
    edges = ex.extract_edges(c, r, verify=True)
    assert edges.count() == 19  # same result as the unfused path
    plan = edges._jdf.queryExecution().executedPlan().toString()
    # exactly one scan reads the `content` column (content_sha256 on the
    # reference side does not match the regex)
    assert len(re.findall(r"content:string", plan)) == 1, plan


def test_small_golden_edge_set(spark):
    """19 raw edges → 16 after dedup, exact set (reference fixture counts,
    /root/reference/tests/small/parsing.rs:139-141 and resources/small/graph.fmi)."""
    corpus = synth.fixture_corpus(spark, ("small",))
    ref = synth.reference_hashes(corpus)
    raw = ex.extract_edges(corpus, ref)
    assert raw.count() == 19

    g = build_graph(raw, num_blocks=4, id_partitions=2)
    assert g.num_vertices == 8
    assert g.num_edges == 16

    sv = stem_vids(g)
    got = {
        (r["src"], r["dst"], r["weight"])
        for r in g.edges.select("src", "dst", "weight").collect()
    }
    expected_stems = {
        ("b", "a", 1.0), ("b", "c", 1.0), ("c", "a", 1.0), ("c", "b", 1.0),
        ("d", "b", 1.0), ("d", "e", 2.0), ("d", "h", 1.0), ("e", "d", 2.0),
        ("e", "f", 1.0), ("f", "e", 1.0), ("f", "h", 1.0), ("g", "e", 1.0),
        ("g", "f", 1.0), ("h", "c", 4.0), ("h", "d", 1.0), ("h", "f", 1.0),
    }
    expected = {(sv[s], sv[d], w) for s, d, w in expected_stems}
    assert got == expected


def test_vertex_ids_contiguous_and_sorted(spark):
    g, _, _ = build_fixture(spark, ("small", "bait"))
    rows = sorted(g.vertices.collect(), key=lambda r: r["key"])
    vids = [r["vid"] for r in rows]
    assert vids == list(range(len(rows)))  # contiguous AND key-ordered


def test_vertex_ids_parallelism_invariant(spark):
    """Same ids regardless of partition count (determinism requirement —
    the scaling evidence at local[8] vs local[32] depends on it)."""
    corpus = synth.fixture_corpus(spark, ("small", "bait", "stuttgart"))
    raw = ex.extract_edges(corpus, verify=False)
    d = dedup_edges(raw)
    from osmgraphing_spark.operators.build import assign_vertex_ids

    a = {r["key"]: r["vid"] for r in assign_vertex_ids(d, 2).collect()}
    b = {r["key"]: r["vid"] for r in assign_vertex_ids(d, 7).collect()}
    assert a == b


def test_csr_blocks_reconstruct_edges(spark):
    g, edges, weights = build_fixture(spark, ("small", "stuttgart"), num_blocks=4)
    blocks = build_csr_blocks(g.edges, g.num_blocks).collect()
    recon = []
    for b in blocks:
        srcs, offs = b["src_ids"], b["offsets"]
        assert offs[0] == 0 and offs[-1] == len(b["dst_ids"])
        assert list(srcs) == sorted(srcs)  # block-local CSR sorted by src
        for i, s in enumerate(srcs):
            for k in range(offs[i], offs[i + 1]):
                recon.append((s, b["dst_ids"][k], b["weights"][k]))
    assert sorted(recon) == sorted(zip((e[0] for e in edges), (e[1] for e in edges), weights))


def test_weight_clamp_at_1e6(spark):
    """Zero/negative metrics clamp to 1e-6 on insert (reference
    building.rs:69-88: positive weights required)."""
    df = spark.createDataFrame(
        [("a", "b", 0.0), ("b", "c", -1.0), ("c", "a", 0.5)],
        "src_key string, dst_key string, weight double",
    )
    got = {(r["src_key"], r["dst_key"]): r["weight"] for r in dedup_edges(df).collect()}
    assert got[("a", "b")] == 1e-6
    assert got[("b", "c")] == 1e-6
    assert got[("c", "a")] == 0.5


def test_powerlaw_deterministic_and_skewed(spark):
    c1 = synth.powerlaw_corpus(spark, 300, m=3).orderBy("path").collect()
    c2 = synth.powerlaw_corpus(spark.newSession() if False else spark, 300, m=3)
    c2 = c2.repartition(13).orderBy("path").collect()  # different parallelism
    assert [r["content"] for r in c1] == [r["content"] for r in c2]

    raw = ex.extract_edges(synth.powerlaw_corpus(spark, 300, m=3), verify=False)
    g = build_graph(raw, num_blocks=4)
    indeg = (
        g.edges.groupBy("dst").count().agg(F.max("count"), F.avg("count")).collect()[0]
    )
    assert indeg[0] > 5 * indeg[1]  # hubs exist: max in-degree >> mean
