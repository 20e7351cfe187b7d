"""Metric-update (balancing) rules.

The reference's balancer replaces one metric column per iteration with a
blend of the old value and a new normalized workload
(/root/reference/src/defaults.rs:132-259; rule selection
/root/reference/src/configs/balancing.rs:134-137):

- ExplicitEuler:  new = old + (norm_new − old) · correction
- Averaging:      new = (iter · old + norm_new) / (iter + 1)

both followed by a 1e-6 positive clamp and mean-renormalization (A3/P7).
Pure column arithmetic on the joined (old, new) frame — the exact template
the PageRank update step generalizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import F64_ABS


def _normalize_by_mean(df: DataFrame, col: str) -> DataFrame:
    mean = df.agg(F.avg(col).alias("_m"))
    return (
        df.crossJoin(F.broadcast(mean))
        .withColumn(col, F.col(col) / F.col("_m"))
        .drop("_m")
    )


def _clamp(c):
    return F.when(c < F.lit(F64_ABS), F.lit(F64_ABS)).otherwise(c)


def explicit_euler_update(
    metrics: DataFrame,
    workloads: DataFrame,
    key: str = "edge_id",
    metric_col: str = "metric",
    workload_col: str = "workload",
    correction: float = 0.1,
) -> DataFrame:
    """new = old + (normalized_workload − old) · correction, clamped and
    renormalized (defaults.rs:178-185)."""
    w = _normalize_by_mean(
        workloads.select(key, F.col(workload_col).cast("double").alias("_new")), "_new"
    )
    joined = metrics.join(w, key, "left").withColumn(
        metric_col,
        _clamp(
            F.col(metric_col)
            + (F.coalesce(F.col("_new"), F.lit(0.0)) - F.col(metric_col))
            * F.lit(correction)
        ),
    ).drop("_new")
    return _normalize_by_mean(joined, metric_col)


def averaging_update(
    metrics: DataFrame,
    workloads: DataFrame,
    iteration: int,
    key: str = "edge_id",
    metric_col: str = "metric",
    workload_col: str = "workload",
) -> DataFrame:
    """new = (iter · old + normalized_workload) / (iter + 1)."""
    w = _normalize_by_mean(
        workloads.select(key, F.col(workload_col).cast("double").alias("_new")), "_new"
    )
    joined = metrics.join(w, key, "left").withColumn(
        metric_col,
        _clamp(
            (F.lit(float(iteration)) * F.col(metric_col)
             + F.coalesce(F.col("_new"), F.lit(0.0)))
            / F.lit(float(iteration + 1))
        ),
    ).drop("_new")
    return _normalize_by_mean(joined, metric_col)
