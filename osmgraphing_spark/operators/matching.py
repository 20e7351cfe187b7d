"""Maximal matching — deterministic handshake rounds (Luby on the line
graph) — and the 2-approximate vertex cover it implies.

Beyond-reference graph primitives: a maximal matching pairs vertices so no
two pairs share an endpoint and no unmatched edge could still be added —
the basis of graph coarsening (multilevel partitioners contract matched
pairs), load-balanced pairing, and the classic 2-approx vertex cover
(take both endpoints of every matched edge).

Algorithm: matching = independent set on the LINE graph, so Luby's MIS
discipline applies edge-wise (same portable-md5 randomness as
``operators/mis``). Per round, every live edge gets priority
md5(u|v|round); each live vertex points at its minimum-priority incident
edge; an edge both of whose endpoints point at it (a local minimum in the
line graph) joins the matching; its endpoints' edges die. Local minima
always exist, and with per-round re-salted priorities a constant fraction
of live edges dies per round in expectation — O(log |E|) rounds, same
tier as MIS/CC. Priorities are md5-derived, so runs are deterministic
across partitionings/retries/engines and the python mirror test replays
rounds EXACTLY.

Scale design:
- per round: one explode (2 rows/edge), one per-vertex algebraic
  ``min_by`` (map-side combine caps hub fan-in), one groupBy(edge) count
  (≤ 2 rows/edge), two semi-join kills against the matched-vertex set.
  Everything keyed by vertex or edge — no all-pairs term anywhere.
- the live edge set only shrinks; loop frames (live, matched) follow the
  strided reliable-truncation discipline (plans/checkpoint.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import EphemeralTruncator
from ..plans.superstep import BlockScope, iterative_conf


def _canonical(edges: DataFrame) -> DataFrame:
    """(u, v): undirected canonical live-edge view — u < v, self-loops
    dropped, parallel edges collapsed."""
    return (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _priority(rnd: int):
    """Portable per-round edge priority: first 56 bits of md5(u|v|round),
    ties impossible within a round (md5 collision tier)."""
    key = F.concat_ws("|", F.col("u"), F.col("v"), F.lit(rnd))
    return F.conv(F.substring(F.md5(key), 1, 14), 16, 10).cast("long")


def maximal_matching(
    edges: DataFrame,
    max_rounds: int = 60,
    truncate_every: int = 2,
) -> DataFrame:
    """→ (u long, v long): a maximal matching of the undirected view of
    ``edges`` (src, dst, ...) — no shared endpoints, and every input edge
    has ≥ 1 matched endpoint. Deterministic (portable md5 priorities).
    ``max_rounds`` is a safety valve; expected rounds are O(log |E|)."""
    spark = edges.sparkSession
    with iterative_conf(spark):
        return _matching_loop(
            _canonical(edges), max_rounds, max(truncate_every, 1)
        )


def _matching_loop(live, max_rounds, truncate_every):
    spark = live.sparkSession
    scope = BlockScope(spark)
    trunc_live = EphemeralTruncator(spark, "match-live")
    trunc_m = EphemeralTruncator(spark, "match-m")

    live = trunc_live.truncate(live)
    matched = spark.createDataFrame([], "u long, v long")
    r = 0
    while r < max_rounds:
        r += 1
        pe = live.select("u", "v", _priority(r).alias("p"))
        both = pe.select(F.col("u").alias("vtx"), "u", "v", "p").unionAll(
            pe.select(F.col("v").alias("vtx"), "u", "v", "p")
        )
        picks = (
            both.groupBy("vtx")
            .agg(F.min_by(F.struct("u", "v"), F.struct("p", "u", "v")).alias("e"))
            .select("e.u", "e.v")
        )
        # an edge picked by BOTH endpoints appears twice
        new_m = (
            picks.groupBy("u", "v")
            .agg(F.count("*").alias("k"))
            .where(F.col("k") == 2)
            .select("u", "v")
        )
        # one action per round; the global-min live edge is always mutual,
        # so 0 new matches ⇔ no live edges remain
        new_m = new_m.localCheckpoint(eager=True)
        if new_m.isEmpty():
            break
        matched = matched.unionAll(new_m)
        dead = new_m.select(F.col("u").alias("vtx")).unionAll(
            new_m.select(F.col("v").alias("vtx"))
        )
        live = live.join(
            dead.withColumnRenamed("vtx", "u"), "u", "left_anti"
        ).join(dead.withColumnRenamed("vtx", "v"), "v", "left_anti").select("u", "v")
        boundary = r % truncate_every == 0
        if boundary:
            live = trunc_live.truncate(live, reap=False)
            matched = trunc_m.truncate(matched, reap=False)
            trunc_live.reap()
            trunc_m.reap()
            scope.release_new()
        else:
            live = live.localCheckpoint(eager=False)
            matched = matched.localCheckpoint(eager=False)
    matched = trunc_m.truncate(matched)
    scope.release_new()
    return matched


def vertex_cover_2approx(edges: DataFrame, max_rounds: int = 60) -> DataFrame:
    """→ (vid long): both endpoints of a maximal matching — a vertex cover
    at most 2× the optimum (every edge is covered because the matching is
    maximal; at most 2·OPT because the matching's edges are disjoint and
    any cover needs ≥ 1 vertex per matched edge)."""
    m = maximal_matching(edges, max_rounds=max_rounds)
    return (
        m.select(F.col("u").alias("vid"))
        .unionAll(m.select(F.col("v").alias("vid")))
        .distinct()
    )
