"""SimRank — "two objects are similar if their in-neighbors are similar"
(Jeh & Widom, KDD'02), the classic structural-similarity measure on link
graphs (co-citation generalized to any depth):

    S_0(a,b)     = [a = b]
    S_{k+1}(a,a) = 1
    S_{k+1}(a,b) = C / (|I(a)|·|I(b)|) · Σ_{u∈I(a), v∈I(b)} S_k(u,v)

(0 when either in-neighborhood is empty). A FIXED-ITERATION run is an
exact rational recurrence — the ``simrank_nations`` driver oracle replays
it round-for-round in SQL (the katz.py value-check pattern for fixpoint
loops).

Scale contract — stated, not hidden: SimRank's state is inherently
PAIRWISE. The sparse frame holds only nonzero pairs, which is exactly the
co-citation closure: |state| starts at the co-in-neighbor pair count
(what `linkpred.bipartite_project` computes) and grows toward V² with
depth. The scale paths are (a) ``threshold`` — drop pairs whose score
falls below ε each round; scores attenuate by C per hop, so the tail is
provably ≤ C^k and pruning bounds |state| like the similarity literature's
top-k SimRank variants — and (b) restricting the GRAPH first (ego_net
around the query vertices), since S_k(a,b) only reads the k-hop
in-neighborhood. The update itself is two joins against the resting
edge layout + one algebraic groupBy((a,b)) — map-side combine absorbs
hub-pair fan-in the same way PageRank's gather does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import EphemeralTruncator
from ..plans.superstep import BlockScope, iterative_conf


def run(
    edges: DataFrame,
    c: float = 0.8,
    max_iter: int = 3,
    threshold: float = 0.0,
    truncate_every: int = 1,
) -> DataFrame:
    """→ (a long, b long, simrank double) for a < b, nonzero pairs after
    exactly ``max_iter`` iterations (diagonal rows are implicit 1s and not
    emitted). ``threshold`` > 0 prunes sub-ε pairs every round — the lossy
    knob that bounds the pair state at web scale."""
    if not 0.0 < c < 1.0:
        raise ValueError(f"decay c must be in (0, 1), got {c}")
    if max_iter < 0:
        raise ValueError(f"max_iter must be >= 0, got {max_iter}")
    spark = edges.sparkSession
    with iterative_conf(spark):
        return _run_loop(edges, c, max_iter, threshold, max(truncate_every, 1))


def _run_loop(edges, c, max_iter, threshold, truncate_every):
    spark = edges.sparkSession
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    # in-edge view (u → a): state pairs advance one hop DOWN these
    ein = e.select(F.col("dst").alias("a"), F.col("src").alias("u"))
    indeg = e.groupBy("dst").agg(F.count("*").alias("d"))
    verts = (
        e.select(F.col("src").alias("vid"))
        .unionAll(e.select(F.col("dst").alias("vid")))
        .distinct()
    )
    diag = verts.select(
        F.col("vid").alias("a"), F.col("vid").alias("b"), F.lit(1.0).alias("s")
    )

    trunc = EphemeralTruncator(spark, "simrank")
    scope = BlockScope(spark)
    from ..plans.superstep import sized_shuffle

    # width proxy: pair-BSP state is bounded below by |E| and (pruned by
    # `threshold` at scale) typically a small multiple of it — 8× biases
    # wide, and the session conf still caps big graphs at full width
    n_e = e.limit(1_000_000).count() * 8
    with sized_shuffle(spark, n_e):
        return _simrank_rounds(
            spark, diag, ein, indeg, c, max_iter, threshold, truncate_every,
            trunc, scope,
        )


def _simrank_rounds(spark, diag, ein, indeg, c, max_iter, threshold,
                    truncate_every, trunc, scope):
    # sparse symmetric state INCLUDING the diagonal (the recurrence reads it)
    state = diag
    for it in range(1, max_iter + 1):
        moved = (
            state.join(ein.select(F.col("a").alias("na"), F.col("u").alias("a")), "a")
            .join(ein.select(F.col("a").alias("nb"), F.col("u").alias("b")), "b")
            .where(F.col("na") != F.col("nb"))
            .groupBy("na", "nb")
            .agg(F.sum("s").alias("raw"))
        )
        offdiag = (
            moved.join(indeg.select(F.col("dst").alias("na"), F.col("d").alias("da")), "na")
            .join(indeg.select(F.col("dst").alias("nb"), F.col("d").alias("db")), "nb")
            .select(
                F.col("na").alias("a"),
                F.col("nb").alias("b"),
                (F.lit(float(c)) * F.col("raw") / (F.col("da") * F.col("db"))).alias("s"),
            )
        )
        if threshold > 0.0:
            offdiag = offdiag.where(F.col("s") >= threshold)
        state = diag.unionByName(offdiag)
        if it % truncate_every == 0 or it == max_iter:
            state = trunc.truncate(state)
            scope.release_new()
        else:
            state = state.localCheckpoint(eager=False)
    return (
        state.where(F.col("a") < F.col("b"))
        .select("a", "b", F.round("s", 6).alias("simrank"))
        .where(F.col("simrank") > 0.0)
    )
