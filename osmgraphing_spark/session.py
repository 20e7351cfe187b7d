"""SparkSession factory.

Mirrors the reference's single configuration front-door
(/root/reference/src/configs/parsing/mod.rs:86-142 — Raw → Proto → Config):
one place that decides every engine-level knob, so jobs and tests share
identical semantics.

Cluster notes (the settings below are chosen for a 1000-executor / 100 TB
deployment and merely *work* on local[32]):

- AQE on: runtime coalescing of the post-shuffle side, skew-join splitting.
- shuffle.partitions: at scale this should be ~2-3x total executor cores;
  locally we default to the core count.
- Arrow on: every Python-side operator in this engine is a pandas/Arrow UDF
  (no per-row Python anywhere).
- Iceberg: when the runtime has the Iceberg jars on the classpath, pass
  ``iceberg_warehouse`` and the ``local`` hadoop catalog is configured; the
  sandbox image has no Iceberg jar, so plans.checkpoint falls back to
  parquet-directory tables with the same layout and commit protocol.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32
F64_ABS = 1e-6  # the reference's global tolerance, /root/reference/src/defaults.rs:15
SEED = 42  # the reference's global seed,        /root/reference/src/defaults.rs:1


def get_spark(
    app_name: str = "osmgraphing-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    iceberg_warehouse: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[%s]" % (
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # deterministic float behavior for the 1e-6 correctness gate
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if iceberg_warehouse:
        b = (
            b.config(
                "spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
            )
            .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.local.type", "hadoop")
            .config("spark.sql.catalog.local.warehouse", iceberg_warehouse)
        )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
