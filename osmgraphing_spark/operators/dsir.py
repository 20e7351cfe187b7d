"""DSIR — data selection via importance resampling (Xie et al., "Data
Selection for Language Models via Importance Resampling", NeurIPS 2023
problem setting).

Given a small TARGET corpus (the domain you want more of) and the big
RAW corpus, score every raw document by the log importance ratio of two
smoothed unigram LMs,

    log w(x) = Σ_tok [ ln p_target(tok) − ln p_raw(tok) ],
    p(tok)   = (count(tok) + k) / (total + k·V)      (shared vocab V),

then resample the raw corpus proportionally to w via the Gumbel-top-n
trick: g(x) = log w(x) − ln(−ln u(x)) with a deterministic md5 uniform;
the n largest g are a weight-proportional sample WITHOUT replacement —
the exponential-race equivalence (Efraimidis-Spirakis), taken in log
space so astronomically large/small w never overflow a double.

Scale contract (100 TB): both LM frequency tables are vocabulary-bounded
(Zipf ≪ corpus) and broadcast, so the exploded raw corpus never shuffles
for the lookups; the only movement is the per-doc log-ratio sum (doc_id
+ one double, map-side combined). The Gumbel top-n compiles to
TakeOrderedAndProject — per-partition top-n, k-row merge, no full sort.
The smoothing constant keeps out-of-target tokens finite, so no join is
ever inner-restricted to the target vocabulary.

Portability: the uniform is the same 48-bit md5 slice as
operators/sampling (exact in a double); the Gumbel key is rounded to 6
decimals as the cross-engine contract, ties broken on md5 — the DuckDB
oracle replays weights AND the selected sample value-for-value.

Reference parity: the mean-normalization feedback pattern
(/root/reference/src/network/graph/building.rs:1410-1455) — a global
aggregate re-enters per-row — with the aggregate now a pair of LMs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import _RACE_DENOM
from .termstats import _tokens


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id, n_tokens, log_ratio): per-raw-document log importance
    ratio under add-k smoothed unigram LMs sharing the union vocabulary."""
    toks = _tokens(raw, id_col, text_col)
    tfreq = _tokens(target, id_col, text_col).groupBy("tok").agg(
        F.count("*").alias("t_cnt")
    )
    rfreq = toks.groupBy("tok").agg(F.count("*").alias("r_cnt"))
    # shared vocabulary = union of both LMs' support
    vocab = (
        rfreq.select("tok")
        .unionAll(tfreq.select("tok"))
        .distinct()
        .agg(F.count("*").alias("v"))
    )
    t_tot = tfreq.agg(F.sum("t_cnt").alias("t_total"))
    r_tot = rfreq.agg(F.sum("r_cnt").alias("r_total"))
    kk = F.lit(float(k))
    scored = (
        toks.join(F.broadcast(tfreq), "tok", "left")
        .join(F.broadcast(rfreq), "tok")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .withColumn(
            "lr",
            F.log(
                (F.coalesce(F.col("t_cnt"), F.lit(0)).cast("double") + kk)
                / (F.col("t_total").cast("double") + kk * F.col("v"))
            )
            - F.log(
                (F.col("r_cnt").cast("double") + kk)
                / (F.col("r_total").cast("double") + kk * F.col("v"))
            ),
        )
    )
    return scored.groupBy(F.col("id")).agg(
        F.count("*").alias("n_tokens"),
        F.round(F.sum("lr"), 6).alias("log_ratio"),
    )


def _gumbel_key(id_expr: Column, log_w: Column) -> Column:
    """g = log w − ln(−ln u), u from 48 md5 bits — top-n by g is an exact
    weight-proportional sample without replacement, overflow-free in log
    space. Rounded to 6 decimals: the VALUE is the cross-engine contract."""
    u48 = F.conv(F.substring(F.md5(id_expr.cast("string")), 1, 12), 16, 10).cast(
        "double"
    )
    u = (u48 + F.lit(0.5)) / F.lit(float(_RACE_DENOM))
    return F.round(log_w - F.log(-F.log(u)), 6)


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    n: int,
    k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id, n_tokens, log_ratio, gumbel): the ``n`` raw documents
    selected by importance resampling (largest Gumbel keys; ties on
    md5(id))."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = dsir_log_weights(raw, target, k=k, id_col=id_col, text_col=text_col)
    keyed = w.withColumn("gumbel", _gumbel_key(F.col("id"), F.col("log_ratio")))
    return keyed.orderBy(
        F.col("gumbel").desc(), F.md5(F.col("id").cast("string"))
    ).limit(n)
