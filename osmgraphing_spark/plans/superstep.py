"""Shared plumbing for BSP superstep loops.

AQE is a net loss *inside* an iterative loop: every superstep's shuffles
get re-optimized and staged sequentially, which costs multiple scheduler
round-trips per iteration while the data volumes are already known and
stable after the first superstep (measured locally: ~18 s/superstep with
AQE vs ~1.5 s without, on a tiny graph — pure overhead). Build-phase jobs
keep AQE; loops run under ``iterative_conf``.

``maybe_broadcast``: rank/label state is one slim row per vertex — up to a
few million vertices it fits comfortably under a broadcast and turns the
per-superstep join against the (huge, co-partitioned) edge table into a
map-side hash join with zero shuffle of the edge side. Past the threshold
the state joins shuffle — against an edge table already at rest in
hash(src) layout, so only the small state side moves.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ~24 bytes/row state → 4M vertices ≈ 100 MB broadcast: fine on executors
# with multi-GB heaps; beyond this the state side shuffles instead.
BROADCAST_VERTEX_LIMIT = 4_000_000

_ITER_CONF = {
    "spark.sql.adaptive.enabled": "false",
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


def maybe_broadcast(df: DataFrame, n_rows: int) -> DataFrame:
    return F.broadcast(df) if n_rows <= BROADCAST_VERTEX_LIMIT else df
