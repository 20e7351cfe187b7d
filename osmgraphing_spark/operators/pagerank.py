"""PageRank: iterative rank recomputation over the built graph.

The role the balancer's metric-update loop plays in the reference —
"traverse everything, aggregate per-edge/vertex, blend into new state,
renormalize, repeat until stable"
(/root/reference/src/bin/osmgraphing/balancing/mod.rs:35-72; update rule
/root/reference/src/defaults.rs:132-259) — expressed as BSP supersteps:

    rank' = (1-d)/N + d * (Σ_in rank/out_deg + dangling_mass/N)
    converged ⇔ max|rank' - rank| < tol   (tol = the reference's 1e-6
    F64_ABS, /root/reference/src/defaults.rs:15)

Two interchangeable executors (correctness gate: identical to 1e-9):

- ``mode="dataframe"``: rank ⨝ edges on src (the edge table rests in
  hash(src) layout → the big side never re-shuffles), then
  groupBy(dst).sum. Whole-stage-codegen end to end.
- ``mode="csr"``: SpMV gather-scatter over per-partition CSR blocks via
  ``cogroup().applyInPandas`` — ranks shuffle to their block, numpy does
  repeat/bincount, only (dst, partial) pairs shuffle out. At 100 TB this
  moves O(V) rows per superstep instead of touching O(E) join rows.

Dangling mass is folded INTO the plan (a 1-row aggregate cross-joined into
the next superstep) rather than collected per iteration, so ``check_every``
supersteps compose lazily into ONE Spark action — per-superstep driver
round-trips were the dominant cost at small scale, and at cluster scale
this halves job-scheduling overhead without changing semantics.

Skew (north rule: explicit handling, not AQE-only), two independent knobs:

- ``salt > 1`` (gather side): contributions into power-law hub dsts
  pre-combine in two stages (groupBy(dst, salt) then groupBy(dst)),
  bounding any reducer's fan-in at E/salt on top of map-side partial
  aggregation.
- ``salt="auto"`` (scatter side — the one that actually bites): a hub
  SOURCE's edge block is unsplittable in the hash(src) resting layout
  (hashing keeps a key together), so one task carries the whole block and
  every superstep barrier waits on it. ``_auto_salt_plan`` measures the
  layout with ``graphstats.partition_stats``; when the largest
  single-source block exceeds the partition target E/num_blocks, the
  resting layout is re-keyed to (src, _ssalt = hash(dst) % k) — splitting
  each hub block k ways — and the (small) rank side replicates k× for hub
  sources only. At most num_blocks sources can exceed the target (their
  degrees sum to E), so the hot list is always tiny and plan-literal.
  Balanced layouts resolve to k = 0 and run the exact unsalted plan.

Durable checkpoints (state + convergence metrics + per-partition lineage)
go through ``plans.checkpoint`` every ``checkpoint_every`` supersteps;
``resume=True`` restarts from the latest committed superstep.

Lineage discipline (two tiers, both required at scale):

- WITHIN a stride, each superstep's plan is truncated with a lazy
  ``localCheckpoint`` (pure plan-size control — Catalyst would otherwise
  re-traverse an exponentially-shared subtree per extra superstep).
- AT stride boundaries the state goes through a RELIABLE parquet
  round-trip (user ``CheckpointManager`` if given, else an internal
  ``EphemeralTruncator``), after which every block the stride pinned in
  executor storage is released via ``BlockScope``. ``localCheckpoint``
  blocks are non-recoverable — accumulating them across a long run is a
  deterministic out-of-memory/executor-loss job killer; after the parquet
  round-trip nothing ever re-reads them, so releasing is safe.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import CheckpointManager, EphemeralTruncator, SuperstepMetrics
from ..plans.superstep import BlockScope, iterative_conf, maybe_broadcast
from ..session import F64_ABS
from .build import Graph


@dataclass
class PageRankResult:
    ranks: DataFrame  # (vid long, rank double)
    iterations: int
    converged: bool
    deltas: list[float]  # delta at each convergence check
    edges_processed: int  # num_edges * iterations
    wall_sec: float
    salt_k: int = 0  # src-salt replication applied (0 = unsalted plan)
    hot_srcs: int = 0  # hub sources whose edge blocks were split salt_k ways


def _contrib_edges(graph: Graph, weighted: bool) -> DataFrame:
    """Edge table annotated with the per-edge contribution factor (rank is
    multiplied by this at superstep time — metrics stored once and reused,
    like the reference's canonical metric store, mod.rs:95)."""
    if weighted:
        factor = F.col("weight") / F.col("out_wsum")
    else:
        factor = F.lit(1.0) / F.col("out_deg").cast("double")
    return graph.edges.select("src", "dst", factor.alias("cfac"))


def run(
    graph: Graph,
    damping: float = 0.85,
    tol: float = F64_ABS,
    max_iter: int = 200,
    weighted: bool = False,
    mode: str = "dataframe",
    salt: int | str = 0,
    check_every: int = 1,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    reset: DataFrame | None = None,
    init_ranks: DataFrame | None = None,
) -> PageRankResult:
    """``reset``: optional teleport distribution (vid, p) for PERSONALIZED
    PageRank — both the (1-d) restart and the dangling mass teleport
    proportionally to p instead of uniformly (vertices absent from
    ``reset`` get p = 0 and receive rank only through in-links). Σp should
    be 1. With ``reset=None`` the update is the classic uniform rule,
    expression-identical to previous releases.

    ``init_ranks``: optional WARM-START vector (vid, rank) — the
    incremental-recompute path: after an edge delta, restart from the
    previous converged ranks instead of uniform and convergence takes a
    handful of supersteps instead of dozens (power iteration error decays
    from the starting distance). Vertices absent from ``init_ranks``
    (e.g. newly added) start at 1/N; the vector is renormalized to Σ = 1
    so the fixed point is unchanged — warm starting changes WHERE the
    iteration starts, never where it converges
    (`test_pagerank.py::test_warm_start_converges_faster`)."""
    spark = graph.edges.sparkSession
    n = graph.num_vertices
    d = float(damping)

    with iterative_conf(spark):
        return _run_loop(
            spark, graph, n, d, tol, max_iter, weighted, mode, salt,
            check_every, checkpoint, checkpoint_every, resume, reset,
            init_ranks,
        )


def _run_loop(
    spark, graph, n, d, tol, max_iter, weighted, mode, salt,
    check_every, checkpoint, checkpoint_every, resume, reset=None,
    init_ranks=None,
):
    if checkpoint is not None:
        # durable per-superstep metrics require an action per superstep
        check_every = 1

    # Dangling handling via a VIRTUAL SINK: every vertex with no out-edges
    # (the 'dea' sink in simple_stuttgart,
    # /root/reference/resources/simple_stuttgart/graph.fmi) gets one synthetic
    # edge to vid = -1 with contribution factor 1.0. The dangling mass then
    # falls out of the SAME shuffle as the regular contributions (the row at
    # dst = -1), instead of costing a separate filter+aggregate branch per
    # superstep. Semantics identical: dm/N is redistributed to every vertex.
    VSINK = -1
    dangling = graph.vertices.select("vid").join(
        graph.edges.select(F.col("src").alias("vid")).distinct(), "vid", "left_anti"
    )
    sink_edges = dangling.select(
        F.col("vid").alias("src"), F.lit(VSINK).cast("long").alias("dst"),
        F.lit(1.0).alias("cfac"),
    )

    # salt="auto": measure the resting layout and engage src-side salting
    # only when a hub source's unsplittable edge block exceeds the partition
    # target (see module docstring). CSR mode packs blocks by src-hash with
    # its own per-block cap, so auto resolves to the plain plan there.
    src_salt_k, hot_src_ids = 0, []
    if isinstance(salt, str):
        if salt != "auto":
            raise ValueError(f"salt must be an int or 'auto', got {salt!r}")
        if mode != "csr":
            src_salt_k, hot_src_ids = _auto_salt_plan(graph)
        salt = 0

    csr = None
    cedges = None
    if mode == "csr":
        csr = _csr_contrib_blocks(graph, weighted, sink_edges)
        csr.persist()
        csr.count()
    else:
        cedges = _contrib_edges(graph, weighted).unionByName(sink_edges)
        if src_salt_k:
            # split each hub source's block across k sub-partitions keyed by
            # hash(dst); cold sources keep _ssalt = 0 so their layout (and
            # the join fan-out) is unchanged
            cedges = cedges.withColumn(
                "_ssalt",
                F.when(
                    F.col("src").isin(hot_src_ids),
                    F.pmod(F.hash(F.col("dst")), F.lit(src_salt_k)),
                )
                .otherwise(F.lit(0))
                .cast("int"),
            ).repartition(graph.num_blocks, F.col("src"), F.col("_ssalt"))
        else:
            cedges = cedges.repartition(graph.num_blocks, F.col("src"))
        cedges = cedges.sortWithinPartitions("src", "dst").persist()
        cedges.count()

    # static vertex dimension, pre-shuffled into the loop's hash(vid) layout
    # + sorted: zero exchange for this side across all supersteps. For
    # personalized PageRank the teleport distribution p rides along as a
    # column of this static side — joined ONCE here, never per superstep.
    vsel = graph.vertices.select("vid")
    if reset is not None:
        vsel = vsel.join(
            reset.select("vid", F.col("p").cast("double").alias("p")), "vid", "left"
        ).select("vid", F.coalesce("p", F.lit(0.0)).alias("p"))
    verts = (
        vsel
        .repartition(graph.num_blocks, F.col("vid"))
        .sortWithinPartitions("vid")
        .persist()
    )
    verts.count()

    # everything persisted/local-checkpointed from here on is stride-scoped
    # and released at each boundary (after the reliable truncation)
    scope = BlockScope(spark)
    trunc = EphemeralTruncator(spark, "pagerank") if checkpoint is None else None

    cached_summed: list[DataFrame] = []

    def superstep(state: DataFrame) -> DataFrame:
        """state (vid, rank) → next state; fully lazy."""
        if mode == "csr":
            contribs = _spmv_superstep(state, csr, graph.num_blocks)
        else:
            rank_side = state.select(F.col("vid").alias("src"), "rank")
            if src_salt_k:
                # replicate the rank row k× for hub sources only (O(V +
                # k·|hot|) rows, |hot| < num_blocks) so each salted edge
                # sub-partition finds its rank under the (src, _ssalt) key
                rank_side = rank_side.withColumn(
                    "_ssalt",
                    F.explode(
                        F.when(
                            F.col("src").isin(hot_src_ids),
                            F.sequence(F.lit(0), F.lit(src_salt_k - 1)),
                        ).otherwise(F.array(F.lit(0)))
                    ),
                ).withColumn("_ssalt", F.col("_ssalt").cast("int"))
                contribs = cedges.join(
                    maybe_broadcast(rank_side, n), ["src", "_ssalt"], "inner"
                ).select("dst", (F.col("rank") * F.col("cfac")).alias("c"))
            else:
                contribs = cedges.join(
                    maybe_broadcast(rank_side, n), "src", "inner"
                ).select("dst", (F.col("rank") * F.col("cfac")).alias("c"))
        if salt and salt > 1:
            summed = _salted_sum(contribs, salt)
        else:
            summed = contribs.groupBy("dst").agg(F.sum("c").alias("c"))
        # lazy persist: summed is referenced twice (dm row + main join); the
        # cache prevents the broadcast branch from re-executing the whole
        # upstream plan (which compounds exponentially across a stride)
        summed = summed.persist()
        cached_summed.append(summed)
        dm = summed.where(F.col("dst") == VSINK).select(
            F.coalesce(F.sum("c"), F.lit(0.0)).alias("dm")
        )
        return (
            verts.join(
                maybe_broadcast(
                    summed.where(F.col("dst") != VSINK).withColumnRenamed("dst", "vid"),
                    n,
                ),
                "vid",
                "left",
            )
            .crossJoin(F.broadcast(dm))
            .select(
                "vid",
                (
                    (
                        # personalized: restart AND dangling mass teleport ∝ p
                        F.col("p") * (F.lit(1.0 - d) + F.lit(d) * F.col("dm"))
                        if reset is not None
                        else F.lit((1.0 - d) / n)
                        + F.lit(d) * F.col("dm") / F.lit(float(n))
                    )
                    + F.lit(d) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("rank"),
            )
        )

    def _drain_cache():
        for df in cached_summed:
            df.unpersist()
        cached_summed.clear()

    start_step = 0
    deltas: list[float] = []
    if init_ranks is not None:
        # warm start: previous ranks where known, 1/N for new vertices,
        # renormalized so the state stays a distribution
        seeded = graph.vertices.select("vid").join(
            init_ranks.select("vid", F.col("rank").alias("_r0")), "vid", "left"
        ).select(
            "vid",
            F.coalesce(F.col("_r0"), F.lit(1.0) / F.lit(float(n))).alias("_r0"),
        )
        total = seeded.agg(F.sum("_r0").alias("t"))
        state = seeded.crossJoin(F.broadcast(total)).select(
            "vid", (F.col("_r0") / F.col("t")).alias("rank")
        )
    elif reset is not None:
        state = verts.select("vid", F.col("p").alias("rank"))
    else:
        state = graph.vertices.select(
            "vid", (F.lit(1.0) / F.lit(float(n))).alias("rank")
        )
    if checkpoint is not None and resume:
        latest = checkpoint.latest()
        if latest is not None:
            state = checkpoint.read(latest)
            start_step = latest + 1
            m = checkpoint.read_metrics(latest)
            deltas = m.get("deltas_so_far", [])
            if m["delta"] < tol:
                for df in (cedges, csr, verts):
                    if df is not None:
                        df.unpersist()
                return PageRankResult(
                    state.select("vid", "rank"), latest + 1, True, deltas,
                    graph.num_edges * (latest + 1), 0.0,
                    salt_k=src_salt_k, hot_srcs=len(hot_src_ids),
                )

    t_start = time.time()
    converged = False
    it = start_step
    while it < max_iter and not converged:
        t0 = time.time()
        stride = min(check_every, max_iter - it)
        prev = state
        for _ in range(stride - 1):
            prev = superstep(prev).localCheckpoint(eager=False)
        new_state = superstep(prev).localCheckpoint(eager=False)

        # ONE action per check: delta of the last consecutive transition.
        # At tol <= 0 with no durable checkpointing (fixed-superstep
        # benchmark legs) convergence can never trigger, so the delta join
        # would be a pure-overhead second action per stride — skip it and
        # let the reliable truncation below be the stride's only action.
        delta = 0.0
        if tol > 0 or checkpoint is not None:
            delta = float(
                new_state.select("vid", "rank")
                .join(
                    prev.select("vid", F.col("rank").alias("old_rank")), "vid", "inner"
                )
                .agg(F.max(F.abs(F.col("rank") - F.col("old_rank"))))
                .collect()[0][0]
                or 0.0
            )
            deltas.append(delta)
        it += stride
        converged = tol > 0 and delta < tol

        # reliable boundary truncation: the state leaves executor storage
        # for parquet BEFORE the stride's blocks are released below
        if checkpoint is not None and (
            (it - 1) % checkpoint_every == 0 or converged or it >= max_iter
        ):
            new_state = checkpoint.write(
                it - 1,
                new_state.select("vid", "rank"),
                SuperstepMetrics(
                    step=it - 1,
                    delta=delta,
                    rows=n,
                    wall_ms=(time.time() - t0) * 1000,
                    extra={"deltas_so_far": deltas, "mode": mode},
                ),
            )
        elif trunc is not None:
            new_state = trunc.truncate(new_state.select("vid", "rank"))

        # the stride's summed caches + local checkpoints are now dead weight
        _drain_cache()
        scope.release_new()
        state = new_state

    wall = time.time() - t_start
    # state is parquet-backed (truncated at the last boundary): the loop's
    # static caches can be dropped before returning — a long-lived session
    # keeps zero blocks per completed run
    for df in (cedges, csr, verts):
        if df is not None:
            df.unpersist()
    return PageRankResult(
        ranks=state.select("vid", "rank"),
        iterations=it,
        converged=converged,
        deltas=deltas,
        edges_processed=graph.num_edges * max(it - start_step, 0),
        wall_sec=wall,
        salt_k=src_salt_k,
        hot_srcs=len(hot_src_ids),
    )


#: absolute engagement floor for salt="auto": a single-source block below
#: this many edge rows is milliseconds of task work and cannot straggle a
#: superstep barrier, whatever the relative skew says — tiny fixture graphs
#: (where E/num_blocks ~ 1) must not pay the replicated-join plan.
AUTO_SALT_MIN_BLOCK = 65_536


def _auto_salt_plan(graph: Graph) -> tuple[int, list[int]]:
    """Measure the resting hash(src) layout and derive the src-salt plan.

    The decision quantities are exactly what ``graphstats.partition_stats``
    reports for capacity planning — ``max_src_deg``, the largest
    single-source edge block (the thing adding partitions cannot split),
    against the partition target E/num_blocks — but read straight off the
    resting ``out_deg`` column: out_deg is constant per src by
    construction, so max(out_deg) IS max_src_deg, and one codegen scan of
    the persisted layout replaces partition_stats' per-src groupBy (the
    plan probe must cost a fraction of the supersteps it speeds up).
    When the max block exceeds the target, return (k, hot_src_ids) with
    k = ceil(max_block / target) capped at num_blocks; the hot list is
    every source whose block exceeds the gate — provably fewer than
    num_blocks of them (their degrees sum to E).

    Balanced layouts return (0, []) and the caller runs the plain plan.
    """
    row = graph.edges.agg(
        F.max("out_deg").alias("hot"), F.count("*").alias("e")
    ).collect()[0]
    hot_deg, n_edges = int(row["hot"] or 0), int(row["e"] or 0)
    target = max(n_edges / max(graph.num_blocks, 1), 1.0)
    gate = max(target, float(AUTO_SALT_MIN_BLOCK))
    if hot_deg <= gate:
        return 0, []
    k = int(min(graph.num_blocks, -(-hot_deg // int(target))))
    if k < 2:
        return 0, []
    hot = [
        r["src"]
        for r in graph.edges.where(F.col("out_deg") > F.lit(gate))
        .select("src")
        .distinct()
        .collect()
    ]
    return (k, sorted(hot)) if hot else (0, [])


def _salted_sum(contribs: DataFrame, salt: int) -> DataFrame:
    """Two-stage aggregation: spread each hot dst over `salt` pre-reducers."""
    salted = contribs.withColumn(
        "_salt", F.pmod(F.hash(F.col("dst"), F.col("c")), F.lit(salt))
    )
    stage1 = salted.groupBy("dst", "_salt").agg(F.sum("c").alias("c"))
    return stage1.groupBy("dst").agg(F.sum("c").alias("c"))


# ---------------------------------------------------------------------------
# CSR SpMV fast path
# ---------------------------------------------------------------------------

def _csr_contrib_blocks(
    graph: Graph, weighted: bool, sink_edges: DataFrame | None = None
) -> DataFrame:
    """CSR blocks whose weights array already holds the contribution factor
    (1/out_deg or weight/out_wsum); includes the virtual-sink edges so the
    SpMV emits the dangling-mass row at dst = -1 like the join executor."""
    from .build import build_csr_blocks

    cedges = _contrib_edges(graph, weighted)
    if sink_edges is not None:
        cedges = cedges.unionByName(sink_edges)
    return build_csr_blocks(cedges.withColumnRenamed("cfac", "weight"), graph.num_blocks)


def _spmv_superstep(ranks: DataFrame, csr: DataFrame, num_blocks: int) -> DataFrame:
    """One gather-scatter: ranks shuffle to their src block; numpy computes
    per-block partial sums per dst; output (dst, c) partials."""
    ranks_b = ranks.withColumn(
        "block_id", F.pmod(F.hash(F.col("vid")), F.lit(num_blocks)).cast("int")
    )

    def spmv(key, rank_pdf: pd.DataFrame, csr_pdf: pd.DataFrame):
        if len(csr_pdf) == 0 or len(rank_pdf) == 0:
            return pd.DataFrame(
                {"dst": pd.Series(dtype="int64"), "c": pd.Series(dtype="float64")}
            )
        rank_ids = rank_pdf["vid"].to_numpy(dtype=np.int64)
        rank_vals = rank_pdf["rank"].to_numpy(dtype=np.float64)
        order = np.argsort(rank_ids, kind="mergesort")
        rank_ids, rank_vals = rank_ids[order], rank_vals[order]
        dst_all, val_all = [], []
        for row in csr_pdf.itertuples(index=False):
            src_ids = np.asarray(row.src_ids, dtype=np.int64)
            offsets = np.asarray(row.offsets, dtype=np.int64)
            dst_ids = np.asarray(row.dst_ids, dtype=np.int64)
            weights = np.asarray(row.weights, dtype=np.float64)
            pos = np.searchsorted(rank_ids, src_ids)
            src_rank = rank_vals[pos]
            counts = np.diff(offsets)
            edge_c = np.repeat(src_rank, counts) * weights
            uniq_dst, inv = np.unique(dst_ids, return_inverse=True)
            partial = np.bincount(inv, weights=edge_c)
            dst_all.append(uniq_dst)
            val_all.append(partial)
        return pd.DataFrame(
            {"dst": np.concatenate(dst_all), "c": np.concatenate(val_all)}
        )

    return (
        ranks_b.groupBy("block_id")
        .cogroup(csr.groupBy("block_id"))
        .applyInPandas(spmv, schema="dst long, c double")
    )
