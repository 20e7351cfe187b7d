"""Weisfeiler-Lehman color refinement — structural-role fingerprints for
every vertex (1-WL, Weisfeiler & Leman 1968 / Shervashidze et al., JMLR
2011 kernel setting).

Round 0 colors a vertex by its undirected degree; each round re-colors by

    c_{t+1}(v) = md5( c_t(v) | Σ h(c_t(u)) | deg(v) ),  u ∈ N(v)

where h is a 48-bit md5 slice reduced mod 10⁹. Classic WL aggregates the
SORTED neighbor color multiset — a per-vertex sort that a 10⁷-degree hub
turns into a single-task giant; this variant replaces it with a
COMMUTATIVE sum, so the aggregation is algebraic and map-side combines
exactly like CC's min (the hub never materializes its color list).
Distinct multisets can in principle collide through the sum, but h is
uniform on [0, 10⁹) — at that width two random multisets collide with
probability ≈ 10⁻⁹ per pair, the usual hashed-WL trade (the md5 outer
hash never collides on identical inputs, so equal structures ALWAYS get
equal colors: refinement soundness is exact, only distinguishing power
is probabilistic).

After r rounds, vertices with equal colors have isomorphic r-hop
unfoldings (up to hash collision) — the standard structural-role
bucketing for role discovery, graph fingerprinting and candidate
pruning in graph dedup.

Scale contract (100 TB): per round one shuffle of (v, h) pairs with
map-side combine; the color table is |V| rows re-rested through the
ephemeral truncator. Σ h stays < 2⁶³ up to ~9·10⁹ neighbors per vertex
(h < 10⁹), so the int64 sum never overflows on any real graph — and the
same arithmetic holds in the DuckDB oracle, which replays every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import EphemeralTruncator

#: h(color) = (first 48 md5 bits) mod H_MOD — keeps Σ h int64-safe
H_MOD = 10**9


def _h(color):
    return F.conv(F.substring(F.md5(color), 1, 12), 16, 10).cast("long") % F.lit(
        H_MOD
    )


def wl_colors(
    edges: DataFrame,
    rounds: int = 3,
    id_col: str = "vid",
) -> DataFrame:
    """→ (id_col, color string): the 1-WL color after ``rounds``
    refinement rounds over the undirected view of ``edges`` (src, dst).
    Isolated vertices don't appear (no edge rows). Colors are md5 hex —
    compare for equality only."""
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    trunc = EphemeralTruncator(edges.sparkSession, "wl")
    und = trunc.truncate(
        edges.select("src", "dst")
        .unionAll(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct(),
        reap=False,
    )
    deg = und.groupBy("src").agg(F.count("*").alias("deg"))
    state = trunc.truncate(
        deg.select(
            F.col("src").alias("id"),
            F.md5(F.col("deg").cast("string")).alias("color"),
            "deg",
        ),
        reap=False,
    )
    for _ in range(rounds):
        msgs = und.join(
            state.select(F.col("id").alias("dst"), _h(F.col("color")).alias("hc")),
            "dst",
        ).select(F.col("src").alias("id"), "hc")
        agg = msgs.groupBy("id").agg(F.sum("hc").alias("s"))
        nxt = state.join(agg, "id").select(
            "id",
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("color"),
                    F.col("s").cast("string"),
                    F.col("deg").cast("string"),
                )
            ).alias("color"),
            "deg",
        )
        state = trunc.truncate(nxt, reap=False)
    return state.select(F.col("id").alias(id_col), "color")


def wl_histogram(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """→ (color, n_vertices): the WL color class sizes — the graph's
    structural fingerprint (two graphs with different histograms are
    non-isomorphic; the 1-WL graph-kernel feature map)."""
    return (
        wl_colors(edges, rounds=rounds)
        .groupBy("color")
        .agg(F.count("*").alias("n_vertices"))
    )
