"""Executor-storage hygiene + block-loss survival.

Round-1's one flaky failure was the classic localCheckpoint defect: loop
blocks accumulate across a long session until an executor drops one and the
job dies replaying `computeOrReadCheckpoint` (stage 17323). The contract
now is:

1. **zero residue** — an iterative operator releases every block it pinned
   (localCheckpoints, loop-scoped persists) before returning;
2. **survival** — its RESULT is parquet-backed (reliable truncation), so it
   stays collectable even after TOTAL loss of executor-storage blocks (the
   single-box analogue of losing every executor).
"""

from __future__ import annotations

from osmgraphing_spark.operators import cc as cc_op
from osmgraphing_spark.operators import dedup as dd
from osmgraphing_spark.operators import lpa as lpa_op
from osmgraphing_spark.operators import pagerank as pr
from osmgraphing_spark.operators import triangles as tri

from .helpers import _build_fixture_uncached, build_fixture


def _persistent_ids(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def _release_all_blocks(spark) -> None:
    """Drop EVERY persisted/local-checkpointed block in the context — the
    single-box stand-in for losing all executors at once."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for k in jmap.keySet().toArray():
        jmap.get(k).unpersist(True)


def test_iterative_ops_leave_no_blocks(spark):
    g, _, _ = build_fixture(spark, ("small", "stuttgart"))
    baseline = _persistent_ids(spark)

    pr.run(g, max_iter=4, tol=0.0, check_every=2).ranks.count()
    cc_op.run(g).count()
    lpa_op.run(g, max_iter=3).count()
    tri.per_vertex(g).count()

    leaked = _persistent_ids(spark) - baseline
    assert leaked == set(), f"loop-scoped blocks leaked: rdd ids {leaked}"


def test_dedup_leaves_no_blocks(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon token{i % 3} zeta eta") for i in range(30)],
        "doc_id long, text string",
    )
    baseline = _persistent_ids(spark)
    dd.jaccard_pairs(docs, threshold=0.3, n=2).count()
    dd.simhash_near_pairs(docs, max_hamming=3).count()
    leaked = _persistent_ids(spark) - baseline
    assert leaked == set(), f"dedup blocks leaked: rdd ids {leaked}"


def test_results_survive_total_block_loss(spark):
    """Collect each result once, drop EVERY block in the context, collect
    again: reliable truncation means identical answers, no
    CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND."""
    g, _, _ = _build_fixture_uncached(spark, ("small", "stuttgart"), 4)

    ranks = pr.run(g, max_iter=4, tol=0.0, check_every=2).ranks
    comps = cc_op.run(g)
    labels = lpa_op.run(g, max_iter=3)

    before = {
        "pr": {(r["vid"], round(r["rank"], 12)) for r in ranks.collect()},
        "cc": {tuple(r) for r in comps.collect()},
        "lpa": {tuple(r) for r in labels.collect()},
    }
    _release_all_blocks(spark)
    after = {
        "pr": {(r["vid"], round(r["rank"], 12)) for r in ranks.collect()},
        "cc": {tuple(r) for r in comps.collect()},
        "lpa": {tuple(r) for r in labels.collect()},
    }
    assert before == after
