"""Label propagation (synchronous, deterministic).

The reference's balancer repeatedly replaces a per-edge metric with an
aggregate of its neighborhood's traffic (update rule
/root/reference/src/defaults.rs:132-259); LPA is the per-vertex analogue:
each superstep every vertex adopts the most frequent label among its
(undirected) neighbors.

Determinism (north rule: "label assignments exactly"): ties break to the
SMALLEST label — implemented as an ordered window rank over
(count DESC, label ASC), never hash order. Synchronous updates from a
seeded state (label₀ = vid), fixed round structure ⇒ identical output at
any parallelism.

Each superstep: one join (labels ⨝ edges on src — the edge table's resting
hash(src) layout) + one groupBy(dst, label) count (map-side combinable)
+ one groupBy(dst) max-struct decode. The winner-per-dst is an ALGEBRAIC
aggregate — ``max(struct(cnt, -label))`` encodes (count DESC, label ASC) —
not a window: both aggregations pre-combine map-side and there is no
per-hub sort, so a power-law hub costs O(distinct labels), not O(deg log
deg). Checkpoint/resume like every iterative op; per-round state goes
through a reliable parquet truncation and the round's executor blocks are
released (see plans.checkpoint docstring).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import CheckpointManager, EphemeralTruncator, SuperstepMetrics
from ..plans.superstep import BlockScope
from .build import Graph


def run(
    graph: Graph,
    max_iter: int = 20,
    checkpoint: CheckpointManager | None = None,
    resume: bool = False,
) -> DataFrame:
    """→ (vid long, label long) at convergence (or max_iter)."""
    from ..plans.superstep import iterative_conf

    with iterative_conf(graph.edges.sparkSession):
        return _run_loop(graph, max_iter, checkpoint, resume)


def superstep(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One synchronous LPA round: (vid, label) → (vid, label).

    Winner per dst = algebraic max over struct(cnt, -label): maximizing the
    struct lexicographically maximizes cnt then MINIMIZES label — the
    deterministic (count DESC, label ASC) tie-break with no window sort.
    """
    votes = (
        edges.join(labels.withColumnRenamed("vid", "src"), "src", "inner")
        .groupBy("dst", "label")
        .agg(F.count("*").alias("cnt"))
    )
    winners = (
        votes.groupBy("dst")
        .agg(F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))).alias("w"))
        .select(F.col("dst").alias("vid"), (-F.col("w.nl")).alias("new_label"))
    )
    return labels.join(winners, "vid", "left").select(
        "vid", F.coalesce("new_label", "label").alias("label")
    )


def _run_loop(graph, max_iter, checkpoint, resume):
    edges = graph.symmetrized_edges()  # undirected neighbor relation
    edges = edges.persist()
    edges.count()
    spark = graph.edges.sparkSession
    scope = BlockScope(spark)
    trunc = EphemeralTruncator(spark, "lpa") if checkpoint is None else None

    labels = graph.vertices.select("vid", F.col("vid").alias("label"))
    start = 0
    if checkpoint is not None and resume:
        latest = checkpoint.latest()
        if latest is not None:
            labels = checkpoint.read(latest)
            start = latest + 1

    for it in range(start, max_iter):
        t0 = time.time()
        new_labels = superstep(edges, labels)
        changed_df = new_labels.join(
            labels.withColumnRenamed("label", "old_label"), "vid", "inner"
        ).where(F.col("label") != F.col("old_label"))
        changed = changed_df.limit(1).count()

        if checkpoint is not None:
            new_labels = checkpoint.write(
                it,
                new_labels,
                SuperstepMetrics(
                    step=it,
                    delta=float(changed),
                    rows=graph.num_vertices,
                    wall_ms=(time.time() - t0) * 1000,
                ),
            )
        else:
            new_labels = trunc.truncate(new_labels)
            scope.release_new()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels
