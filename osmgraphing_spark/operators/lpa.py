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
+ one tiny window per dst. Checkpoint/resume like every iterative op.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.checkpoint import CheckpointManager, SuperstepMetrics
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


def _run_loop(graph, max_iter, checkpoint, resume):
    edges = graph.symmetrized_edges()  # undirected neighbor relation
    edges = edges.persist()
    edges.count()

    labels = graph.vertices.select("vid", F.col("vid").alias("label"))
    start = 0
    if checkpoint is not None and resume:
        latest = checkpoint.latest()
        if latest is not None:
            labels = checkpoint.read(latest)
            start = latest + 1

    w = Window.partitionBy("dst").orderBy(F.col("cnt").desc(), F.col("label").asc())
    for it in range(start, max_iter):
        t0 = time.time()
        votes = (
            edges.join(labels.withColumnRenamed("vid", "src"), "src", "inner")
            .groupBy("dst", "label")
            .agg(F.count("*").alias("cnt"))
        )
        winners = (
            votes.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select(F.col("dst").alias("vid"), F.col("label").alias("new_label"))
        )
        new_labels = (
            labels.join(winners, "vid", "left")
            .select("vid", F.coalesce("new_label", "label").alias("label"))
        )
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
            new_labels = new_labels.localCheckpoint(eager=True)
        labels = new_labels
        if changed == 0:
            break
    return labels
