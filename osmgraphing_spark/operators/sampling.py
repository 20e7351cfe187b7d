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


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    strata_col: str,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Per-stratum deterministic rate sampling — the training-MIXTURE
    primitive ("keep 100 % of books, 30 % of web, 5 % of logs"). Strata
    absent from ``weights`` are dropped (weight 0). Same hash contract as
    ``sample_rows``: membership is a pure function of the row key, so the
    exact mixture is reproducible across runs/retries/engines and is
    value-checkable in SQL.

    Scale: map-only — one ``when`` chain over the stratum column against
    the hash bucket; no shuffle, composes with scan-level column pruning
    (unlike ``df.sampleBy``, which is per-partition-RNG nondeterministic).
    """
    for s, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"weight for {s!r} must be in [0, 1], got {w}")
    cols = [F.col(c) for c in (key_cols or df.columns)]
    b = _bucket(cols)
    thresh = F.lit(0)
    for s, w in sorted(weights.items()):
        thresh = F.when(F.col(strata_col) == s, F.lit(round(w * RESOLUTION))).otherwise(thresh)
    return df.where(b < thresh)


#: 2^48 — the race uniform uses 48 md5 bits so the integer is EXACT in a
#: double (2^48 < 2^53); a 56-bit slice would round differently nowhere,
#: but exactness makes the cross-engine contract trivially auditable
_RACE_DENOM = 1 << 48


def _race_key(cols: list[Column], weight: Column) -> Column:
    """Efraimidis-Spirakis exponential race key r = −ln(u)/w, u ∈ (0,1)
    from the first 48 bits of md5(key): selecting the k SMALLEST r draws
    a weighted sample without replacement, P(i ∈ sample) ∝ w_i (the
    classic distributed weighted-sampling reduction — top-k is algebraic,
    so it map-side combines). Rounded to 9 decimals so the value — not
    just the order — is the cross-engine contract; ties break on md5."""
    key = F.concat_ws("|", *[c.cast("string") for c in cols])
    u48 = F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("double")
    u = (u48 + F.lit(0.5)) / F.lit(float(_RACE_DENOM))
    return F.round(-F.log(u) / weight.cast("double"), 9)


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Exactly ``min(k, |rows with weight > 0|)`` rows, inclusion
    probability ∝ ``weight_col`` (A-ES weighted reservoir semantics) —
    THE quality-weighted corpus subsampling primitive ("sample 1B docs
    ∝ quality score"), deterministic across runs/retries/partitionings/
    engines. Rows with weight ≤ 0 or NULL are never selected.

    Scale: ``orderBy().limit(k)`` compiles to TakeOrderedAndProject —
    per-partition top-k then a k-row merge; no full sort, no shuffle of
    the corpus, no driver involvement beyond k rows."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cols = [F.col(c) for c in (key_cols or df.columns)]
    tie = F.md5(F.concat_ws("|", *[c.cast("string") for c in cols]))
    return (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .orderBy(_race_key(cols, F.col(weight_col)), tie)
        .limit(k)
    )


def weighted_stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    weight_col: str,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Per-stratum A-ES: ``min(k, |stratum ∩ w>0|)`` rows per stratum,
    inclusion ∝ weight within the stratum — weighted quota balancing
    (per-language caps where better docs win the slots). One shuffle by
    stratum, same hot-key profile as ``stratified_sample``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    cols = [F.col(c) for c in (key_cols or df.columns)]
    tie = F.md5(F.concat_ws("|", *[c.cast("string") for c in cols]))
    w = Window.partitionBy(*strata_cols).orderBy(
        _race_key(cols, F.col(weight_col)), tie
    )
    return (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    key_cols: list[str] | None = None,
    prefilter_fraction: float | None = None,
) -> DataFrame:
    """Exactly ``min(k, stratum size)`` rows per stratum, chosen as the k
    smallest md5-hash values of ``key_cols`` within each stratum — a
    deterministic quota sample (per-language / per-source caps are how
    training mixtures are balanced), reproducible across runs, retries,
    partitionings and engines, unlike ``df.sampleBy``.

    Scale: the exact quota needs a per-stratum rank, i.e. one shuffle by
    stratum. A huge stratum makes that a hot key; ``prefilter_fraction``
    bounds it — apply the map-only hash sample first (no shuffle), then
    rank only the survivors. Because BOTH stages order by the same hash,
    the composition stays exact: the k smallest hashes of the stratum
    survive any prefilter that keeps at least the bottom
    ``prefilter_fraction`` of the hash range (choose it so
    E[survivors] = fraction·|stratum| ≫ k).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    cols = [F.col(c) for c in (key_cols or df.columns)]
    ranked = df.withColumn("_bucket", _bucket(cols))
    if prefilter_fraction is not None:
        ranked = ranked.where(
            F.col("_bucket") < round(prefilter_fraction * RESOLUTION)
        )
    # _bucket has only RESOLUTION values — break ties on the full md5 so the
    # selected set is unique even in strata larger than the resolution
    tie = F.md5(F.concat_ws("|", *[c.cast("string") for c in cols]))
    w = Window.partitionBy(*strata_cols).orderBy(F.col("_bucket"), tie)
    return (
        ranked.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_bucket", "_rn")
    )


def leakage_safe_split(
    df: DataFrame,
    fractions: dict[str, float],
    group_col: str,
) -> DataFrame:
    """Train/val/test split with a LEAKAGE GUARD: every row of a group lands
    in the SAME split. The group is the near-dup cluster id (from
    `dedup.dup_clusters`, coalesced to the doc's own id for singletons), so
    a document and its near-duplicates can never straddle train and eval —
    the contamination mode a row-wise random split is blind to, and the
    reason eval numbers inflate on deduplicated-but-naively-split corpora.

    `fractions`: ordered {split_name: fraction}, summing to ~1; the split
    is chosen by where the group's deterministic bucket (md5 of the GROUP
    key, same portable hash as `sample_rows`) falls in the cumulative
    ranges, so it is reproducible across runs, retries, partitionings and
    engines, and STABLE UNDER CORPUS GROWTH: a group's split never changes
    when other documents appear (the property epoch-resampling pipelines
    need so eval sets stay fixed while train grows).

    Scale: map-only given the group column (the expensive part — cluster
    discovery — is the dedup pass you already ran); no shuffle, no state.
    → df + (split string).
    """
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    b = _bucket([F.col(group_col)])
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = b < round(acc * RESOLUTION)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)


#: weight grid for temperature_sample: floor(n^alpha * 2^20) — integer
#: weights make the denominator Σw an exact integer sum, so the keep rate
#: is identical under any partitioning / aggregation order / engine
#: (a float Σ over strata is order-dependent in the last ulp, and a
#: membership threshold has no rounding refuge)
W_GRID = 1 << 20


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    budget: int,
    alpha: float = 0.5,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Temperature-based mixture rebalancing — the multilingual α-sampling
    of large-LM data pipelines (sampling probability ∝ n_s^α with α < 1
    flattens the head language and upweights the tail, α = 1 is
    proportional, α = 0 uniform-per-stratum):

        rate_s = min(1, budget · w_s / (Σ_t w_t · n_s)),  w_s = ⌊n_s^α · 2^20⌋

    so E[rows from s] = budget · w_s/Σw (until a stratum saturates at
    keep-everything). Membership is the portable md5 bucket of
    ``key_cols`` against the per-stratum threshold — deterministic across
    runs, retries, partitionings and engines, like every sampler here.

    In-plan end to end: one groupBy for the counts, a 1-row broadcast
    cross join for the Σw denominator, a broadcast strata→threshold map
    onto the corpus — no driver collect, corpus scanned once, never
    shuffled. α = 0.5 uses sqrt (IEEE-exact in every engine); other α go
    through pow.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    n = F.col("_n").cast("double")
    pw = F.sqrt(n) if alpha == 0.5 else F.pow(n, F.lit(float(alpha)))
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_n")).withColumn(
        "_w", F.floor(pw * F.lit(W_GRID)).cast("long")
    )
    denom = counts.agg(F.sum("_w").alias("_wsum"))
    rate = F.least(
        F.lit(1.0),
        F.lit(float(budget)) * F.col("_w")
        / (F.col("_wsum").cast("double") * F.col("_n").cast("double")),
    )
    thresh = counts.crossJoin(F.broadcast(denom)).select(
        strata_col, F.floor(rate * F.lit(RESOLUTION)).cast("long").alias("_thresh")
    )
    cols = [F.col(c) for c in (key_cols or df.columns)]
    return (
        df.join(F.broadcast(thresh), strata_col)
        .where(_bucket(cols) < F.col("_thresh"))
        .drop("_thresh")
    )
