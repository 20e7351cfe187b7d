"""Neighborhood function, distance distribution, effective diameter.

The classic whole-graph distance analytics of the link-graph literature
(Palmer et al., ANF, KDD'02; Boldi-Vigna-Rosa, HyperANF, WWW'11): the
neighborhood function N(t) = #{(u,v) : dist(u→v) ≤ t} — from which fall
out the distance distribution, the average path length, and the effective
diameter (smallest t covering ≥ α of all reachable pairs). The reference
computes point-to-point distances (Dijkstra); this is the corpus-level
view a link-graph engine owes on top: "how far is this graph across",
asked of the WHOLE web-scale graph at once.

Both tiers are the same BSP pull loop — vertex v's reachable-set sketch at
round t is the merge of its own sketch with its OUT-neighbors' sketches at
t-1 — differing only in the sketch algebra:

- **exact tier** (`distance_distribution`): the sketch is a literal bitset
  over dense vertex indices, stored SPARSE as (vid, word, bits long) rows
  (only nonzero 64-bit words exist). Merge = ``bit_or`` groupBy — an
  algebraic aggregate, so hub vertices combine map-side exactly like CC's
  ``min`` (operators/cc.py discipline). N(t) = Σ bit_count(bits), one
  scalar action per round. State is O(V²/64) worst case: the ORACLE tier —
  exact answers on fixtures/subgraphs (same role as similarity.embed_topk
  vs embed_ann), and the value-checkable pin for the sketch tier.
- **scale tier** (`neighborhood_function_hll`): the sketch is an m-register
  HyperLogLog (HyperANF proper). State is O(V·m) REGARDLESS of reachable-
  set size — the 100 TB path. Merge = elementwise register ``max`` (same
  sparse row layout, same map-side combine). Registers derive from the
  engine's portable md5 hash, so the whole run is deterministic across
  partitionings, retries, and engines. Fixpoint detection is exact (Σreg
  is a monotone integer; unchanged ⇒ registers converged), so termination
  never depends on float tolerance.

Both loops cut lineage through the reliable parquet truncation used by
every iterative operator here (plans/checkpoint.EphemeralTruncator) with
lazy localCheckpoint mid-stride, and release loop-scoped blocks at stride
boundaries (plans/superstep.BlockScope).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.checkpoint import EphemeralTruncator
from ..plans.superstep import BlockScope, iterative_conf


def _dense_index(edges: DataFrame) -> DataFrame:
    """(vid, idx): dense 0..V-1 indices in vid order. One sort-shuffle,
    once per run (bit positions must be dense; ids need not be)."""
    verts = (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )
    w = Window.orderBy("vid")
    return verts.select("vid", (F.row_number().over(w) - 1).alias("idx"))


def distance_distribution(edges: DataFrame, max_iter: int = 64) -> DataFrame:
    """→ (t int, pairs long): the EXACT neighborhood function — pairs =
    #{(u,v): v reachable from u within t hops}, t = 0 (self pairs = V)
    up to the graph's diameter (series stops growing ⇒ fixpoint).

    Directed semantics over (src, dst) edges; self-loops and duplicate
    edges are harmless (bitset algebra is idempotent)."""
    spark = edges.sparkSession
    with iterative_conf(spark):
        series = _exact_series(edges, max_iter)
    return spark.createDataFrame(
        [(t, int(n)) for t, n in series], "t int, pairs long"
    )


def _exact_series(edges: DataFrame, max_iter: int) -> list[tuple[int, int]]:
    spark = edges.sparkSession
    idx = _dense_index(edges)
    e = (
        edges.select("src", "dst")
        .join(idx.withColumnRenamed("vid", "dst"), "dst")
        .select("src", F.col("idx").alias("dvid"))
        .join(idx.withColumnRenamed("vid", "src"), "src")
        .select(F.col("idx").alias("vid"), F.col("dvid").alias("nbr"))
    )
    e = e.repartition("nbr").persist()

    state = idx.select(
        F.col("idx").alias("vid"),
        (F.col("idx") / 64).cast("int").alias("word"),
        # PySpark's shiftleft() only takes a literal shift; expr() allows a column
        F.expr("shiftleft(cast(1 as bigint), cast(idx % 64 as int))").alias("bits"),
    )

    trunc = EphemeralTruncator(spark, "nf-exact")
    scope = BlockScope(spark)
    series: list[tuple[int, int]] = []
    prev = -1
    try:
        for t in range(max_iter + 1):
            if t > 0:
                pulled = (
                    e.join(state.withColumnRenamed("vid", "nbr"), "nbr")
                    .select("vid", "word", "bits")
                )
                state = (
                    state.unionByName(pulled)
                    .groupBy("vid", "word")
                    .agg(F.bit_or("bits").alias("bits"))
                )
            boundary = t % 4 == 0
            if boundary:
                state = trunc.truncate(state)
            else:
                state = state.localCheckpoint(eager=False)
            total = state.agg(F.sum(F.bit_count("bits"))).collect()[0][0]
            if boundary:
                scope.release_new()
            if total == prev:
                break
            series.append((t, int(total)))
            prev = total
    finally:
        e.unpersist()
        scope.release_new()
    return series


# -- HyperANF (scale tier) ---------------------------------------------------

def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def neighborhood_function_hll(
    edges: DataFrame, log2m: int = 6, max_iter: int = 64
) -> DataFrame:
    """→ (t int, pairs double): HyperANF estimate of the neighborhood
    function. State per vertex is m = 2**log2m registers (≤ V·m rows,
    stored sparse), independent of how large reachable sets grow — THIS is
    the tier that runs on the full 10^12-vertex graph; std error of each
    per-vertex cardinality ≈ 1.04/√m (~13% at m=64, ~4.6% at m=512).

    Registers: md5(vid) → 60 uniform bits; bucket = 8 leading-ones-free
    bits mod m, rank = leading zeros of the remainder + 1 computed exactly
    via integer bin-length (no float log). Merge = max, estimate =
    bias-corrected harmonic mean with small-range linear counting."""
    if not 4 <= log2m <= 12:
        raise ValueError(f"log2m must be in [4, 12], got {log2m}")
    m = 1 << log2m
    spark = edges.sparkSession
    with iterative_conf(spark):
        series = _hll_series(edges, m, max_iter)
    return spark.createDataFrame(
        [(t, float(n)) for t, n in series], "t int, pairs double"
    )


def _hll_series(edges: DataFrame, m: int, max_iter: int) -> list[tuple[int, float]]:
    spark = edges.sparkSession
    e = edges.select("src", "dst").distinct().repartition("dst").persist()
    verts = (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )

    # portable md5 → (bucket, rank): first 3 hex chars (12 bits — uniform
    # mod any m = 2^log2m ≤ 2^12) bucket the vertex; the next 15 hex chars
    # (60 bits, always a non-negative long) give rank = 61 - bitlength(w),
    # exact via bin() string length
    hx = F.md5(F.concat(F.lit("nf:"), F.col("vid").cast("string")))
    w60 = F.conv(F.substring(hx, 4, 15), 16, 10).cast("long")
    state = verts.select(
        "vid",
        (F.conv(F.substring(hx, 1, 3), 16, 10).cast("int") % m).alias("bucket"),
        F.when(w60 > 0, F.lit(61) - F.length(F.bin(w60)))
        .otherwise(F.lit(61))
        .cast("int")
        .alias("reg"),
    )

    alpha = _alpha(m)

    def estimate(st: DataFrame) -> float:
        per_v = st.groupBy("vid").agg(
            F.count("*").alias("nnz"),
            F.sum(F.pow(F.lit(0.5), F.col("reg"))).alias("s"),
        )
        z = (F.lit(m) - F.col("nnz")) + F.col("s")
        raw = F.lit(alpha * m * m) / z
        zeros = (F.lit(m) - F.col("nnz")).cast("double")
        est = F.when(
            (raw <= 2.5 * m) & (zeros > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
        ).otherwise(raw)
        return float(per_v.agg(F.sum(est)).collect()[0][0])

    trunc = EphemeralTruncator(spark, "nf-hll")
    scope = BlockScope(spark)
    series: list[tuple[int, float]] = []
    prev_regsum = -1
    try:
        for t in range(max_iter + 1):
            if t > 0:
                pulled = (
                    e.join(state.withColumnRenamed("vid", "dst"), "dst")
                    .select(F.col("src").alias("vid"), "bucket", "reg")
                )
                state = (
                    state.unionByName(pulled)
                    .groupBy("vid", "bucket")
                    .agg(F.max("reg").alias("reg"))
                )
            boundary = t % 4 == 0
            if boundary:
                state = trunc.truncate(state)
            else:
                state = state.localCheckpoint(eager=False)
            regsum = state.agg(F.sum("reg")).collect()[0][0]
            if boundary:
                scope.release_new()
            if regsum == prev_regsum:
                break
            series.append((t, estimate(state)))
            prev_regsum = regsum
    finally:
        e.unpersist()
        scope.release_new()
    return series


def effective_diameter(series: DataFrame, alpha: float = 0.9) -> float:
    """Smallest (interpolated) t such that N(t) ≥ α · N(∞), from a
    neighborhood-function series (t, pairs) — the standard HyperANF
    readout. The series is O(diameter) rows; collecting it is free."""
    rows = sorted((r["t"], float(r["pairs"])) for r in series.collect())
    if not rows:
        return 0.0
    target = alpha * rows[-1][1]
    for (t0, n0), (t1, n1) in zip([(0, 0.0)] + rows[:-1], rows):
        if n1 >= target:
            if t1 == 0 or n1 == n0:
                return float(t1)
            # linear interpolation inside the step (Boldi-Vigna convention)
            return float(t0 + (target - n0) / (n1 - n0) * (t1 - t0))
    return float(rows[-1][0])


def avg_distance(series: DataFrame) -> float:
    """Mean finite distance over reachable ordered pairs (self pairs at
    distance 0 included), from the same series: Σ t·(N(t)-N(t-1)) / N(∞)."""
    rows = sorted((r["t"], float(r["pairs"])) for r in series.collect())
    if not rows or rows[-1][1] == 0:
        return math.nan
    total = 0.0
    prev = 0.0
    for t, n in rows:
        total += t * (n - prev)
        prev = n
    return total / rows[-1][1]


def khop_vertices(
    edges: DataFrame,
    seeds: list[int] | DataFrame,
    k: int | None,
    direction: str = "both",
    max_iter: int = 200,
    truncate_every: int = 4,
) -> DataFrame:
    """→ (vid, hops): every vertex within k hops of any seed, with its
    minimum hop count. ``direction``: "out" follows edges forward, "in"
    backward, "both" treats the graph as undirected (the ego-net ball).
    ``seeds`` may be a vid list or a 1-column DataFrame (a seed SET too
    large to collect — e.g. a whole SCC in the bowtie decomposition).
    ``k=None`` runs to the reachability fixpoint (bounded by ``max_iter``).

    BSP BFS with a delta frontier: round t's join size is the wavefront,
    not the ball, and the loop runs exactly k rounds — the bounded-cost
    contract that makes hub forensics safe on a web-scale graph (a k=2
    ball around one hub is huge but FINITE and known before extraction;
    a driver-side traversal is neither)."""
    if direction not in ("out", "in", "both"):
        raise ValueError(f"direction must be out|in|both, got {direction}")
    spark = edges.sparkSession
    fwd = edges.select("src", "dst")
    bwd = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    adj = {"out": fwd, "in": bwd, "both": fwd.unionAll(bwd)}[direction]
    adj = adj.where(F.col("src") != F.col("dst")).distinct()

    trunc_front = EphemeralTruncator(spark, "khop-front")
    trunc_state = EphemeralTruncator(spark, "khop-state")
    scope = BlockScope(spark)
    if isinstance(seeds, DataFrame):
        seed_col = seeds.columns[0]
        state = seeds.select(
            F.col(seed_col).cast("long").alias("vid"), F.lit(0).alias("hops")
        ).distinct()
    else:
        state = spark.createDataFrame(
            [(int(s), 0) for s in seeds], "vid long, hops int"
        )
    frontier = state
    stride = max(truncate_every, 1)
    boundary = True
    # Batched convergence probes on a tiny graph (same exactness argument
    # as scc._scc): an empty frontier stays empty, so probing only at
    # stride boundaries is still an exact fixpoint test, and the skipped
    # rounds fuse into the boundary's single job instead of paying ~0.3 s
    # of per-ACTION fixed cost each. "Tiny" is signalled by the session's
    # shuffle width — callers that shrank it to 1 (e.g. graphstats.bowtie
    # after its size probe) have already measured the graph; at real scale
    # the width is > 1 and every round keeps its own probe, because there
    # a wasted post-fixpoint round is a real wavefront-sized shuffle.
    probe_every = (
        stride
        if int(spark.conf.get("spark.sql.shuffle.partitions")) == 1
        else 1
    )
    with iterative_conf(spark):
        for t in range(1, (max_iter if k is None else k) + 1):
            reached = (
                frontier.join(adj, frontier["vid"] == adj["src"])
                .select(adj["dst"].alias("vid"), F.lit(t).alias("hops"))
                .distinct()
            )
            new = reached.join(state.select("vid"), "vid", "left_anti")
            # stride discipline (sssp.py): reliable parquet truncation only
            # at stride boundaries; mid-stride rounds cut lineage with a
            # lazy localCheckpoint that the next probe's job materializes.
            # Two interdependent frames: write both before reaping either
            # previous step (new's plan scans the previous state step).
            boundary = t % stride == 0
            if boundary:
                new = trunc_front.truncate(new, reap=False)
                state = trunc_state.truncate(state.unionByName(new), reap=False)
                trunc_front.reap()
                trunc_state.reap()
                scope.release_new()
            else:
                new = new.localCheckpoint(eager=False)
                state = state.unionByName(new).localCheckpoint(eager=False)
            if t % probe_every == 0 and new.limit(1).count() == 0:
                break
            frontier = new
        if not boundary:
            # loop ended mid-stride: hand back a reliably truncated frame
            state = trunc_state.truncate(state)
            scope.release_new()
    return state


def ego_net(
    edges: DataFrame, seeds: list[int], k: int, direction: str = "both"
) -> DataFrame:
    """The induced subgraph on the k-hop ball around ``seeds`` → the input
    edge rows where BOTH endpoints are within k hops (plus each endpoint's
    hop distance). The debugging extraction every skew investigation
    starts from: "give me the 2-hop neighborhood of this hub" — two
    semi-join-shaped joins against the (small) ball, the corpus edge table
    is scanned once and never shuffled by more than the ball join keys."""
    ball = khop_vertices(edges, seeds, k, direction)
    return (
        edges.join(ball.select(F.col("vid").alias("src"),
                               F.col("hops").alias("src_hops")), "src")
        .join(ball.select(F.col("vid").alias("dst"),
                          F.col("hops").alias("dst_hops")), "dst")
    )
