"""Iceberg checkpoint-table integration — gated on runtime availability.

The north rule's production shape checkpoints superstep state to Iceberg
tables (snapshot commit = the atomic marker; see plans/checkpoint.py
docstring). This sandbox bakes no Iceberg runtime jar and has no network to
fetch one, so the test SKIPS with that exact reason when the class is
absent — on a cluster with `iceberg-spark-runtime` on the classpath it runs
the real table round-trip, including the snapshot-per-commit property the
checkpoint protocol relies on.
"""

from __future__ import annotations

import pytest


def _iceberg_unavailable_reason(spark) -> str | None:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return None
    except Exception:
        return (
            "org.apache.iceberg.spark.SparkCatalog not on the JVM classpath "
            "(no iceberg-spark-runtime jar baked into this sandbox, and no "
            "network to resolve spark.jars.packages)"
        )


def test_iceberg_checkpoint_table_roundtrip(spark, tmp_path):
    reason = _iceberg_unavailable_reason(spark)
    if reason:
        pytest.skip(f"Iceberg path untestable here: {reason}")

    # Iceberg catalogs are lazily instantiated, so runtime registration on
    # the shared session works (spark.sql.extensions is only needed for
    # MERGE/procedures, which this protocol doesn't use).
    spark.conf.set("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ice.warehouse", str(tmp_path))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ice.ckpt")

    state = spark.range(100).selectExpr("id AS vid", "1.0 / 100 AS rank")
    state.writeTo("ice.ckpt.pr_state").create()
    assert spark.table("ice.ckpt.pr_state").count() == 100

    # one snapshot per superstep commit — the atomic marker the parquet
    # fallback emulates with _COMMITTED files
    state.writeTo("ice.ckpt.pr_state").append()
    snaps = spark.sql(
        "SELECT COUNT(*) AS c FROM ice.ckpt.pr_state.snapshots"
    ).collect()[0]["c"]
    assert snaps == 2
