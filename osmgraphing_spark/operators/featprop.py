"""Feature propagation over the link graph — the GraphSAGE-mean /
feature-smoothing primitive (Hamilton et al., NeurIPS 2017 aggregation;
"Feature Propagation" for missing-feature imputation, Rossi et al. 2021)
on the engine's exact-integer grid.

Each round replaces every vertex's feature vector with the
round-half-up mean of its in-neighbors' vectors (plus its own when
``include_self``), computed entirely in int64:

    h_{t+1}(v) = floor((2·Σ h_t(u) + n) / (2n)),  u ∈ N(v) [∪ {v}]

— the same exact mean as operators/kmeans, so any number of rounds is
bit-reproducible in the DuckDB oracle: the standard "average your
neighborhood" embedding-smoothing pass, value-checkable at any depth.

Scale contract (100 TB): per round, messages are (dst, i, x) triples —
|E|·dim rows BEFORE map-side combine, |V|·dim after (the combine
absorbs hub fan-in exactly like CC's algebraic min). No vector ever
leaves the integer grid, no UDF, no collect; the per-round state is one
(id, array) table re-materialized through the ephemeral truncator so
lineage stays flat across rounds. Feature width multiplies shuffle
volume linearly — the documented cost of element-wise aggregation; for
dim ≫ 10³ prefer blocking columns into several propagation passes.

Reference parity: the metric-recomputation feedback loop
(/root/reference/src/network/graph/building.rs:1410-1455) with the mean
taken over graph neighborhoods instead of the whole column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import EphemeralTruncator


def propagate_features(
    edges: DataFrame,
    feats: DataFrame,
    rounds: int = 2,
    include_self: bool = True,
    id_col: str = "vid",
    feat_col: str = "f",
) -> DataFrame:
    """→ (id_col, feat_col): integer feature vectors after ``rounds``
    neighborhood-mean rounds. ``edges`` is (src, dst) — messages flow
    src → dst; vertices with features but no in-edges keep (the mean of)
    their own vector when ``include_self``, else their rows drop for the
    round (no messages). ``feats`` must be (id_col, array<long>)."""
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    trunc = EphemeralTruncator(edges.sparkSession, "featprop")
    e = edges.select("src", "dst")
    state = feats.select(F.col(id_col).alias("id"), F.col(feat_col).alias("f"))
    for _ in range(rounds):
        msgs = e.join(state.withColumnRenamed("id", "src"), "src").select(
            F.col("dst").alias("id"), "f"
        )
        if include_self:
            msgs = msgs.unionByName(state)
        nxt = (
            msgs.select("id", F.posexplode("f").alias("i", "x"))
            .groupBy("id", "i")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .withColumn(
                "m",
                F.floor((2 * F.col("s") + F.col("n")) / (2 * F.col("n"))).cast("long"),
            )
            .groupBy("id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "m"))),
                    lambda st: st["m"],
                ).alias("f")
            )
        )
        state = trunc.truncate(nxt, reap=False)
    return state.select(F.col("id").alias(id_col), F.col("f").alias(feat_col))
