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

All marker/metrics/listing I/O goes through the Hadoop FileSystem API of
the checkpoint root (not the driver's local os/shutil), so the same
protocol works when the root is hdfs:///... or s3a://... on a cluster —
the deployment the north rule describes.

``EphemeralTruncator`` is the no-user-checkpoint path: iterative operators
route their in-loop state through a RELIABLE parquet round-trip at stride
boundaries even when the caller asked for no durable checkpoints.
``localCheckpoint`` alone is NOT enough at scale: its blocks live only in
executor storage, so one lost executor (or long-session memory pressure —
the round-1 flaky pytest failure at stage 17323) kills the job with an
unrecoverable block-fetch error mid-run. A parquet round-trip of the slim
per-vertex state is the cheap, recoverable alternative.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class _Hdfs:
    """Thin Hadoop FileSystem wrapper (py4j) so checkpoint metadata works on
    hdfs:///s3a:// roots, not just the driver's local disk."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.jvm = spark.sparkContext._jvm
        self.jpath = self.jvm.org.apache.hadoop.fs.Path(root)
        self.fs = self.jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())

    def path(self, p: str):
        return self.jvm.org.apache.hadoop.fs.Path(p)

    def exists(self, p: str) -> bool:
        return self.fs.exists(self.path(p))

    def mkdirs(self, p: str) -> None:
        self.fs.mkdirs(self.path(p))

    def delete(self, p: str) -> None:
        self.fs.delete(self.path(p), True)

    def rename(self, src: str, dst: str) -> bool:
        return self.fs.rename(self.path(src), self.path(dst))

    def listdir(self, p: str) -> list[str]:
        if not self.exists(p):
            return []
        return [s.getPath().getName() for s in self.fs.listStatus(self.path(p))]

    def write_text(self, p: str, text: str) -> None:
        out = self.fs.create(self.path(p), True)
        try:
            out.write(bytearray(text, "utf-8"))
        finally:
            out.close()

    def read_text(self, p: str) -> str:
        stream = self.fs.open(self.path(p))
        try:
            return self.jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()


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
        self.dir = root.rstrip("/") + "/" + job
        self._fs = _Hdfs(spark, self.dir)
        self._fs.mkdirs(self.dir)

    def _step_dir(self, step: int) -> str:
        return f"{self.dir}/step={step}"

    def committed_steps(self) -> list[int]:
        steps = []
        for name in self._fs.listdir(self.dir):
            if name.startswith("step="):
                k = int(name.split("=", 1)[1])
                if self._fs.exists(f"{self.dir}/{name}/_COMMITTED"):
                    steps.append(k)
        return sorted(steps)

    def latest(self) -> int | None:
        steps = self.committed_steps()
        return steps[-1] if steps else None

    def write(self, step: int, state: DataFrame, metrics: SuperstepMetrics) -> DataFrame:
        """Persist state + metrics atomically; returns the re-read state
        (lineage truncated)."""
        sdir = self._step_dir(step)
        if self._fs.exists(sdir):  # aborted previous attempt
            self._fs.delete(sdir)
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
        self._fs.write_text(os.path.join(sdir, "metrics.json"), metrics.to_json())
        self._fs.write_text(os.path.join(sdir, "_COMMITTED"), "ok")
        return self.spark.read.parquet(os.path.join(sdir, "state"))

    def amend_metrics(self, step: int, metrics: SuperstepMetrics) -> None:
        """Rewrite a committed step's metrics row (used when the convergence
        delta is only known from the action that materializes the NEXT
        lineage — keeps the protocol at one Spark action per superstep
        while still recording delta per step)."""
        sdir = self._step_dir(step)
        old = {}
        mpath = os.path.join(sdir, "metrics.json")
        if self._fs.exists(mpath):
            old = json.loads(self._fs.read_text(mpath))
        metrics.partition_rows = metrics.partition_rows or old.get("partition_rows", {})
        self._fs.write_text(mpath, metrics.to_json())

    def read(self, step: int) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self._step_dir(step), "state"))

    def read_metrics(self, step: int) -> dict:
        return json.loads(self._fs.read_text(os.path.join(self._step_dir(step), "metrics.json")))

    def clean(self) -> None:
        if self._fs.exists(self.dir):
            self._fs.delete(self.dir)
        self._fs.mkdirs(self.dir)


class EphemeralTruncator:
    """Reliable in-loop lineage truncation when no durable CheckpointManager
    was supplied: ``truncate(df)`` round-trips the (slim) state through
    parquet and returns the re-read frame — a plan whose only input is a
    file scan, recoverable after ANY block/executor loss. Older steps are
    deleted as soon as the next one lands, so disk stays O(|state|).

    Root resolution (first hit wins): ``spark.osmgraphing.truncateDir``
    session conf → ``$SPARK_GRAFT_TRUNC_DIR`` → the driver's tempdir. On a
    multi-executor cluster set the conf/env to a shared path (hdfs/s3a);
    in local mode the tempdir is visible to every executor thread already.
    The final step's files are kept alive (the returned DataFrame reads
    them); they live under an app-scoped directory the OS tempdir reaper
    (or the configured root's retention) cleans up.
    """

    def __init__(self, spark: SparkSession, tag: str):
        root = None
        try:
            root = spark.conf.get("spark.osmgraphing.truncateDir")
        except Exception:
            root = None
        root = root or os.environ.get("SPARK_GRAFT_TRUNC_DIR") or tempfile.gettempdir()
        app_id = spark.sparkContext.applicationId
        self.dir = f"{root.rstrip('/')}/osmg-trunc-{app_id}/{tag}-{uuid.uuid4().hex[:8]}"
        self.spark = spark
        self._fs = _Hdfs(spark, self.dir)
        self._step = 0
        self._prev_dir: str | None = None
        self._pending: list[str] = []

    def truncate(self, df: DataFrame, reap: bool = True) -> DataFrame:
        """``reap=False`` defers deleting the previous step until ``reap()``
        — required when a loop keeps MULTIPLE interdependent truncated
        frames (e.g. SSSP state + frontier): frame B's not-yet-written plan
        may still scan frame A's previous step, so neither previous step may
        be deleted until every frame of the iteration has been written."""
        sdir = f"{self.dir}/step-{self._step}"
        df.write.mode("overwrite").parquet(sdir)
        out = self.spark.read.parquet(sdir)
        if self._prev_dir is not None:
            if reap:
                self._fs.delete(self._prev_dir)
            else:
                self._pending.append(self._prev_dir)
        self._prev_dir = sdir
        self._step += 1
        return out

    def reap(self) -> None:
        for d in self._pending:
            self._fs.delete(d)
        self._pending = []
