"""Per-superstep checkpoint / resume protocol.

The Spark analogue of the reference's balancing loop persistence: every
iteration writes the full graph + per-edge workloads + stats to a results
dir before the next iteration starts
(/root/reference/src/bin/osmgraphing/balancing/mod.rs:35-72, 301-373), so a
crashed run can restart from the last completed iteration.

Design (north rule: "checkpoints per-partition lineage and convergence
metrics ... so runs resume mid-iteration"):

- state table per superstep: ``<root>/<job>/step=<k>/state/`` (parquet here;
  ``local.<job>_state`` Iceberg table with a ``step`` partition column when
  an Iceberg catalog is configured — same protocol, the commit marker is
  then the Iceberg snapshot).
- metrics row per superstep: ``<root>/<job>/step=<k>/metrics.json`` with
  convergence delta, row count, wall ms, and per-partition row counts (the
  "per-partition lineage": which partitions contributed, and how many rows
  each — enough to audit a partial write).
- commit marker ``_COMMITTED`` written LAST: a step directory without it is
  an aborted write and is ignored + cleaned on resume. Parquet's _SUCCESS
  alone is not enough because state+metrics are two artifacts.

Checkpointing doubles as **lineage truncation**: re-reading the parquet
breaks the 50-superstep join chain that would otherwise blow up Catalyst
planning (SURVEY §7 risk list).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class SuperstepMetrics:
    step: int
    delta: float
    rows: int
    wall_ms: float
    partition_rows: dict[str, int] = field(default_factory=dict)
    extra: dict = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {
                "step": self.step,
                "delta": self.delta,
                "rows": self.rows,
                "wall_ms": self.wall_ms,
                "partition_rows": self.partition_rows,
                **self.extra,
            }
        )


class CheckpointManager:
    def __init__(self, spark: SparkSession, root: str, job: str):
        self.spark = spark
        self.dir = os.path.join(root, job)
        os.makedirs(self.dir, exist_ok=True)

    def _step_dir(self, step: int) -> str:
        return os.path.join(self.dir, f"step={step}")

    def committed_steps(self) -> list[int]:
        steps = []
        if not os.path.isdir(self.dir):
            return steps
        for name in os.listdir(self.dir):
            if name.startswith("step="):
                k = int(name.split("=", 1)[1])
                if os.path.exists(os.path.join(self.dir, name, "_COMMITTED")):
                    steps.append(k)
        return sorted(steps)

    def latest(self) -> int | None:
        steps = self.committed_steps()
        return steps[-1] if steps else None

    def write(self, step: int, state: DataFrame, metrics: SuperstepMetrics) -> DataFrame:
        """Persist state + metrics atomically; returns the re-read state
        (lineage truncated)."""
        sdir = self._step_dir(step)
        if os.path.isdir(sdir):  # aborted previous attempt
            shutil.rmtree(sdir)
        t0 = time.time()
        state.write.mode("overwrite").parquet(os.path.join(sdir, "state"))
        # per-partition lineage: rows written per file/partition of the state
        part_rows = {
            str(r["pid"]): r["n"]
            for r in self.spark.read.parquet(os.path.join(sdir, "state"))
            .select(F.spark_partition_id().alias("pid"))
            .groupBy("pid")
            .count()
            .withColumnRenamed("count", "n")
            .collect()
        }
        metrics.partition_rows = part_rows
        metrics.extra.setdefault("checkpoint_ms", round((time.time() - t0) * 1000, 1))
        with open(os.path.join(sdir, "metrics.json"), "w") as f:
            f.write(metrics.to_json())
        with open(os.path.join(sdir, "_COMMITTED"), "w") as f:
            f.write("ok")
        return self.spark.read.parquet(os.path.join(sdir, "state"))

    def amend_metrics(self, step: int, metrics: SuperstepMetrics) -> None:
        """Rewrite a committed step's metrics row (used when the convergence
        delta is only known from the action that materializes the NEXT
        lineage — keeps the protocol at one Spark action per superstep
        while still recording delta per step)."""
        sdir = self._step_dir(step)
        old = {}
        try:
            with open(os.path.join(sdir, "metrics.json")) as f:
                old = json.load(f)
        except FileNotFoundError:
            pass
        metrics.partition_rows = metrics.partition_rows or old.get("partition_rows", {})
        with open(os.path.join(sdir, "metrics.json"), "w") as f:
            f.write(metrics.to_json())

    def read(self, step: int) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self._step_dir(step), "state"))

    def read_metrics(self, step: int) -> dict:
        with open(os.path.join(self._step_dir(step), "metrics.json")) as f:
            return json.load(f)

    def clean(self) -> None:
        if os.path.isdir(self.dir):
            shutil.rmtree(self.dir)
        os.makedirs(self.dir, exist_ok=True)
