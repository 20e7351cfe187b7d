"""Shared plumbing for BSP superstep loops.

Two measured rules for iterative jobs (both verified on this sandbox with
the power-law bench corpus, 150k vertices / 600k edges):

1. **AQE off inside the loop.** Every superstep's shuffles get re-optimized
   and staged sequentially — multiple scheduler round-trips per iteration
   for data volumes that are known and stable after the first superstep
   (~18 s/superstep with AQE vs ~1.5 s without, on a tiny graph). Build
   -phase jobs keep AQE; loops run under ``iterative_conf``.

2. **No broadcast joins inside the loop.** A broadcast of the rank state is
   rebuilt ON EVERY ACTION (broadcast variables aren't reused across jobs),
   serializing through the driver each superstep: measured 9.5 s/superstep
   with broadcasts vs 1.4 s with shuffle joins at local[32]. Shuffle joins
   also compose: a whole ``check_every`` stride of lazily-chained
   supersteps pipelines as ONE multi-stage job. The big edge side rests in
   hash(src) layout, so only the slim per-vertex state shuffles.
   ``autoBroadcastJoinThreshold=-1`` here prevents Catalyst from sneaking
   broadcasts back in. (On a real cluster the same logic holds — executor-
   count × per-action broadcast build cost — only the constants change.)
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# broadcast of per-vertex state inside loops is disabled by default (see
# module docstring, rule 2); raise explicitly for experiments only.
BROADCAST_VERTEX_LIMIT = 0

_ITER_CONF = {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    # constraint propagation re-derives filter constraints across every
    # join in the loop plan on every action — the optimizer cost Spark's
    # own docs call out for iterative workloads (its pruning never fires
    # on these loops' equi-joins; measured neutral on the tiny driver
    # fixtures, protective on deep plans)
    "spark.sql.constraintPropagation.enabled": "false",
}


@contextmanager
def iterative_conf(spark: SparkSession):
    saved = {}
    for k, v in _ITER_CONF.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)


@contextmanager
def sized_shuffle(spark: SparkSession, n_rows: int, rows_per_partition: int = 250_000):
    """Loop-scoped shuffle width sized to the state actually shuffling.

    Iterative per-vertex state is tiny compared to the session's configured
    width: a 32-partition exchange per join/agg on a fixture-sized frame is
    pure per-task fixed cost (measured ~1.7× of the wall clock on the tiny
    driver digraphs). Target ~`rows_per_partition` rows per shuffle
    partition, capped by the session's configured parallelism so big inputs
    keep their full width — the manual analogue of AQE partition
    coalescing, which ``iterative_conf`` disables for plan stability.
    Yields the chosen width (1 ⇒ the caller may also batch its convergence
    probes to stride boundaries, the `scc._scc` discipline); restores the
    session conf on exit."""
    conf_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    p = max(1, min(conf_p, (int(n_rows) + rows_per_partition - 1) // rows_per_partition))
    spark.conf.set("spark.sql.shuffle.partitions", str(p))
    try:
        yield p
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(conf_p))


def maybe_broadcast(df: DataFrame, n_rows: int) -> DataFrame:
    if BROADCAST_VERTEX_LIMIT and n_rows <= BROADCAST_VERTEX_LIMIT:
        return F.broadcast(df)
    return df


class BlockScope:
    """Frees executor-storage blocks created inside a loop stride.

    ``localCheckpoint`` (and lazy persists) register RDDs in the context's
    persistent-RDD map but nothing ever unpersists them — in a long-lived
    session the blocks accumulate until executors die (the round-1 flaky
    pytest failure at stage 17323). The scope snapshots the persistent-RDD
    ids at construction; ``release_new()`` unpersists every id added since,
    which is safe once the stride's output has been reliably truncated
    (parquet round-trip) — nothing re-reads the dropped blocks.
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.baseline = self._ids()

    def _jmap(self):
        return self.spark.sparkContext._jsc.getPersistentRDDs()

    def _ids(self) -> set[int]:
        return {int(k) for k in self._jmap().keySet().toArray()}

    def release_new(self) -> int:
        jmap = self._jmap()
        released = 0
        for k in jmap.keySet().toArray():
            if int(k) not in self.baseline:
                jmap.get(k).unpersist(False)
                released += 1
        return released
