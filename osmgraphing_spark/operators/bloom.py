"""Bloom-filter membership sketch — the fixed-state prefilter.

Completes the portable sketch family (count-min = frequencies, HLL =
cardinalities, MinHash/SimHash = similarity, Bloom = MEMBERSHIP): a
privileged key set (benchmark shingles for decontamination, a blocklist,
yesterday's ingested digests) compressed to m bits with NO false
negatives — a "not in filter" verdict is definite, so the expensive exact
path (operators/decontaminate's broadcast set, dedup's verify join) only
runs on the small possibly-member remainder. ~9.6 bits/key at 1 % false
positives vs the raw strings' hundreds — the gap between "the benchmark
set broadcasts" and "it doesn't".

Portability: k probe positions per key from the md5 double-hash family
(Kirsch-Mitzenmacher: pos_i = (h1 + i·h2) mod m, the same split-md5 trick
as operators/heavyhitters.cms_sketch), bits packed 63 per long so no mask
ever touches the sign bit — every word of the filter and every probe is
reproducible in ANSI SQL, so the driver oracle value-checks the sketch
cell-for-cell, not just the verdicts.

Scale shape: build = one map-only probe explosion (k rows/key) + one
algebraic groupBy(word, bit_or) → ≤ ⌈m/63⌉ words regardless of key count;
filters merge by bit_or (union semantics), same as CMS/HLL. Probing =
k-way explode + ONE join on word — a broadcast hash join while the filter
fits the threshold (a 10⁹-bit filter is 2 GB of words: per-executor
memory, not per-row state), a word-keyed shuffle join beyond it.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bits packed per filter word — 63 keeps every mask positive in a signed
#: 64-bit lane, so Spark longs and SQL BIGINTs agree bit-for-bit
WORD_BITS = 63


def bloom_params(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Classic sizing: m = −n·ln p /(ln 2)², k = (m/n)·ln 2."""
    if not 0 < fpp < 1:
        raise ValueError(f"fpp must be in (0,1), got {fpp}")
    m = max(WORD_BITS, int(math.ceil(-n_keys * math.log(fpp) / math.log(2) ** 2)))
    k = max(1, int(round(m / max(n_keys, 1) * math.log(2))))
    return m, k


def _with_probes(df: DataFrame, col: str, m_bits: int, k: int, salt: str) -> DataFrame:
    """Explode each row into its k (word, mask) probes (map-only)."""
    hx = F.md5(F.concat(F.lit(salt), F.col(col).cast("string")))
    out = df.withColumn("_h1", F.conv(F.substring(hx, 1, 15), 16, 10).cast("long") % m_bits)
    out = out.withColumn(
        "_h2", F.conv(F.substring(hx, 16, 15), 16, 10).cast("long") % m_bits
    )
    out = out.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_i")
    )
    pos = (F.col("_h1") + F.col("_i") * F.col("_h2")) % m_bits
    return (
        out.withColumn("_pos", pos)
        .withColumn("word", F.expr(f"_pos DIV {WORD_BITS}"))
        .withColumn(
            "mask",
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(_pos % {WORD_BITS} AS INT))"),
        )
        .drop("_h1", "_h2", "_i", "_pos")
    )


def bloom_build(
    keys: DataFrame, col: str, m_bits: int, k: int, salt: str = "bloom:"
) -> DataFrame:
    """→ sparse filter (word long, bits long): ≤ ⌈m_bits/63⌉ rows. One
    map-only probe explosion + one algebraic bit_or groupBy. Merge two
    filters (same m, k, salt) with `bloom_merge` for union semantics."""
    return (
        _with_probes(keys.where(F.col(col).isNotNull()), col, m_bits, k, salt)
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Union of the underlying key sets: elementwise bit_or."""
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_hits(
    df: DataFrame,
    col: str,
    flt: DataFrame,
    m_bits: int,
    k: int,
    salt: str = "bloom:",
    broadcast: bool = True,
) -> DataFrame:
    """→ df + `might_contain` boolean: true iff ALL k probe bits are set
    (false ⇒ DEFINITELY not in the filter's key set — no false negatives).
    One k-way map-only explode + one join on word + one all-probes groupBy
    over the input's columns (duplicate input rows collapse — membership
    is a property of the value). Pass ``broadcast=False`` when the filter
    outgrows executor memory; the join then shuffles on word."""
    cols = df.columns
    probes = _with_probes(df, col, m_bits, k, salt)
    flt_side = F.broadcast(flt) if broadcast else flt
    joined = probes.join(flt_side, "word", "left")
    hit = (
        F.col("bits").isNotNull()
        & (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask"))
    ).cast("int")
    return (
        joined.groupBy(*cols)
        .agg((F.min(hit) == 1).alias("might_contain"))
    )


def bloom_filter_new(
    df: DataFrame,
    col: str,
    flt: DataFrame,
    m_bits: int,
    k: int,
    salt: str = "bloom:",
) -> DataFrame:
    """Rows of df whose `col` is DEFINITELY absent from the filter's key
    set — the cheap first stage of incremental dedup / decontamination:
    survivors skip the exact verify entirely; route only the
    `might_contain` remainder (target-fpp-sized) to the exact path."""
    return (
        bloom_hits(df, col, flt, m_bits, k, salt)
        .where(~F.col("might_contain"))
        .drop("might_contain")
    )
