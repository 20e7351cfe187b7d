"""Deterministic hash-based row sampling.

`df.sample()` is non-deterministic under retries and repartitioning (it
samples per-partition with a seeded RNG, so a recomputed partition or a
different partitioning yields a different sample) — unusable for a
debugging slice of a 100 TB pipeline that must be REPRODUCIBLE across
runs, retries and engines. Hash-based sampling makes membership a pure
function of the row key: keep iff h(key) mod M < fraction·M.

The hash is the portable md5 double-hash base used by MinHash
(dedup._portable_hash_pair) so the exact sample is reproducible in the
DuckDB oracle — the sample itself is value-checkable, not just its size.

Scale: map-only (no shuffle, no state); the predicate pushes into the
scan stage and composes with column pruning. Sampling by KEY (e.g. src)
instead of whole-row keeps all rows of a sampled group together —
group-coherent sampling for per-vertex debugging.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: sampling resolution: fraction is quantized to 1/RESOLUTION steps
RESOLUTION = 1_000_000


def _bucket(cols: list[Column]) -> Column:
    """Deterministic bucket in [0, RESOLUTION): first 56 bits of
    md5(key) mod RESOLUTION — portable to any engine with md5."""
    key = F.concat_ws("|", *[c.cast("string") for c in cols])
    u = F.conv(F.substring(F.md5(key), 1, 14), 16, 10).cast("long")
    return u % F.lit(RESOLUTION)


def sample_rows(
    df: DataFrame, fraction: float, key_cols: list[str] | None = None
) -> DataFrame:
    """Keep ~`fraction` of rows, deterministically by hash of `key_cols`
    (default: all columns). Same input ⇒ same sample, regardless of
    partitioning, retries, or engine."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cols = [F.col(c) for c in (key_cols or df.columns)]
    # round, not int(): 0.3 * 1e6 is 299999.99999999994 in binary floating
    # point, and truncation would shift the threshold (and disagree with
    # any engine computing fraction * 10^6 exactly — the whole contract)
    return df.where(_bucket(cols) < round(fraction * RESOLUTION))


def sample_edges(edges: DataFrame, fraction: float) -> DataFrame:
    """Deterministic (src, dst)-keyed edge sample."""
    return sample_rows(edges, fraction, key_cols=["src", "dst"])
