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


def balance_loop(
    edges: DataFrame,
    pairs: DataFrame,
    num_iter: int = 2,
    rule: str = "averaging",
    correction: float = 0.1,
    min_metric: float = F64_ABS,
    checkpoint=None,
    resume: bool = False,
) -> tuple[DataFrame, list[dict]]:
    """The reference's flagship ``osmgraphing balancing`` binary, composed
    in-engine (/root/reference/src/bin/osmgraphing/balancing/mod.rs:34-71):
    per iteration it (1) CONTRACTS the current graph — the step the
    reference ships out to multi-ch-constructor, here
    ``ch.contract_graph`` — (2) routes the whole pair workload over the
    hierarchy in ONE batch (``ch.ch_shortest_paths``; the reference
    routes pairs in a thread pool, mod.rs multithreading), (3) counts
    per-edge usage from the expanded routes (A1), and (4) blends the
    usage into the metric with the configured rule (ExplicitEuler /
    Averaging, defaults.rs:132-259) + 1e-6 clamp + mean renormalization.

    ``pairs`` may carry a ``count`` column (the route-pairs file's
    multiplicity); usage is then count-weighted. Returns the final
    (src, dst, w) frame and a per-iteration history
    [{iteration, routed_pairs, mean_w}].

    Scale: each iteration is a contraction (bounded wedge joins), one
    batched route job whose cost is independent of the pair count, one
    explode + algebraic groupBy over route hops, and two 1-row mean
    aggregates — no per-pair driver work anywhere."""
    from ..plans.checkpoint import EphemeralTruncator
    from . import ch as ch_op

    if rule not in ("averaging", "explicit_euler"):
        raise ValueError(f"unknown balancing rule {rule!r}")
    spark = edges.sparkSession
    trunc = EphemeralTruncator(spark, "balance-loop")
    cur = trunc.truncate(
        edges.select("src", "dst", F.col("w").cast("double").alias("w")),
        reap=False,
    )
    has_count = "count" in pairs.columns
    p = pairs.select(
        "src", "dst",
        (F.col("count").cast("double") if has_count else F.lit(1.0)).alias("_n"),
    ).groupBy("src", "dst").agg(F.sum("_n").alias("_n"))
    p = trunc.truncate(p, reap=False)

    history: list[dict] = []
    start_iter = 0
    if checkpoint is not None and resume:
        # the same resumability discipline as the PageRank loop: each
        # completed iteration's metric state is durably committed, so a
        # killed run restarts AFTER the last expensive contraction+route
        # batch instead of repeating it
        latest = checkpoint.latest()
        if latest is not None:
            cur = checkpoint.read(latest)
            m = checkpoint.read_metrics(latest)
            history = list(m.get("history", []))
            start_iter = latest + 1
    for it in range(start_iter, num_iter):
        ch_e, lv = ch_op.contract_graph(cur)
        routes = ch_op.ch_shortest_paths(
            ch_e, lv, p.select("src", "dst")
        ).join(p, ["src", "dst"])
        hops = (
            routes.where(F.size("nodes") >= 2)
            .select(
                "_n",
                F.explode(
                    F.arrays_zip(
                        F.expr("slice(nodes, 1, size(nodes) - 1)").alias("a"),
                        F.expr("slice(nodes, 2, size(nodes) - 1)").alias("b"),
                    )
                ).alias("h"),
            )
            .select(
                F.struct(
                    F.col("h.a").alias("src"), F.col("h.b").alias("dst")
                ).alias("_ek"),
                "_n",
            )
        )
        usage = hops.groupBy("_ek").agg(F.sum("_n").alias("workload"))
        metrics = cur.select(
            F.struct("src", "dst").alias("_ek"), "src", "dst",
            F.col("w").alias("metric"),
        )
        if rule == "averaging":
            updated = averaging_update(
                metrics, usage, iteration=it, key="_ek",
                metric_col="metric", workload_col="workload",
            )
        else:
            updated = explicit_euler_update(
                metrics, usage, key="_ek",
                metric_col="metric", workload_col="workload",
                correction=correction,
            )
        # the reference's min_new_metric floor (blueprint.yaml:150-153:
        # zero-ish edges breed useless shortcuts and slow the router);
        # applied after the rule's own renormalization, so the mean can sit
        # slightly above 1 when the floor binds — same as the reference,
        # which clamps after normalizing
        cur = trunc.truncate(
            updated.select(
                "src", "dst",
                F.greatest(F.col("metric"), F.lit(float(min_metric))).alias("w"),
            ),
            reap=False,
        )
        row = cur.agg(F.round(F.avg("w"), 9).alias("m")).collect()[0]
        history.append(
            {
                "iteration": it,
                "routed_pairs": routes.count(),
                "mean_w": float(row["m"]),
            }
        )
        if checkpoint is not None:
            from ..plans.checkpoint import SuperstepMetrics

            cur = checkpoint.write(
                it,
                cur,
                SuperstepMetrics(
                    step=it,
                    delta=0.0,
                    rows=cur.count(),
                    wall_ms=0.0,
                    extra={"history": history},
                ),
            )
    return cur, history
