"""Config-driven training-data pipeline runner.

The document-side sibling of `cli.py` (which runs the graph pipeline):
a JSON or YAML config declares an ORDERED list of cleaning stages —
quality funnel, dedup tiers, benchmark decontamination, sampling — and
the runner applies them to a documents parquet, writes the surviving
corpus, and emits a per-stage accounting report (n_in / n_out / dropped
per stage, plus the per-rule funnel breakdown), mirroring how production
pipelines (C4 / Gopher / RefinedWeb, public literature) audit their
cleaning chains. The reference's analogue is the config-declared filter
chain applied during parsing (/root/reference/src/configs/parsing/
mod.rs:86-142 three-stage lowering); here the vocabulary is document
operators instead of way filters.

    {
      "documents": "/data/crawl.parquet",
      "output": "/data/clean",
      "stages": [
        {"op": "filter_funnel", "min_tokens": 20},
        {"op": "exact_dedup"},
        {"op": "near_dedup", "threshold": 0.5, "num_hashes": 8, "bands": 4},
        {"op": "decontaminate", "benchmark": "/data/eval.parquet"},
        {"op": "mixture_sample", "weights": {"web": 0.3, "books": 1.0},
         "strata_col": "source"}
      ]
    }

Run: ``python -m osmgraphing_spark.datapipe --config pipeline.json``

Scale notes: each stage's SURVIVOR frame is materialized through the
ephemeral truncator before the next stage, so (a) the per-stage counts
are one cheap aggregate each, (b) no stage re-executes its
predecessors, and (c) lineage stays flat across arbitrarily long
chains — the same discipline the iterative graph loops use. Every
stage is one of the engine's shuffle-audited operators; the runner adds
no joins of its own beyond the id semi-join that maps a sample's id set
back to full rows.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .plans.checkpoint import EphemeralTruncator


def _load_config(path: str) -> dict:
    if path.endswith((".yaml", ".yml")):
        from . import miniyaml

        raw = miniyaml.load(path)
    else:
        with open(path) as f:
            raw = json.load(f)
    if not isinstance(raw, dict):
        raise ValueError(f"config root must be a mapping, got {type(raw).__name__}")
    for key in ("documents", "output", "stages"):
        if key not in raw:
            raise ValueError(f"config is missing required key {key!r}")
    if not isinstance(raw["stages"], list) or not raw["stages"]:
        raise ValueError("stages must be a non-empty list")
    return raw


def _stage_filter_funnel(spark, docs: DataFrame, p: dict):
    from .operators import funnel

    rules = funnel.default_rules(
        min_tokens=p.get("min_tokens", 20),
        max_dup_fraction=p.get("max_dup_fraction", 0.65),
        min_stopword_ratio=p.get("min_stopword_ratio", 0.01),
    )
    summary = [
        {k: r[k] for k in ("rule_order", "rule", "n_in", "n_dropped")}
        for r in funnel.summary(docs, rules).collect()
    ]
    keep = funnel.verdicts(docs, rules).where(F.col("verdict") == funnel.KEPT)
    return docs.join(keep.select("doc_id"), "doc_id", "left_semi"), {"rules": summary}


def _stage_exact_dedup(spark, docs, p):
    from .operators import dedup

    return dedup.drop_exact_duplicates(docs), {}


def _stage_near_dedup(spark, docs, p):
    from .operators import dedup

    return (
        dedup.drop_near_duplicates(
            docs,
            threshold=p.get("threshold", 0.5),
            num_hashes=p.get("num_hashes", 16),
            bands=p.get("bands", 4),
            n=p.get("n", 3),
        ),
        {},
    )


def _stage_decontaminate(spark, docs, p):
    from .operators import decontaminate

    bench = spark.read.parquet(p["benchmark"])
    return (
        decontaminate.decontaminate(
            docs, bench, n=p.get("n", 3), min_hits=p.get("min_hits", 1)
        ),
        {},
    )


def _stage_hash_sample(spark, docs, p):
    from .operators import sampling

    return sampling.sample_rows(docs, p["fraction"], key_cols=["doc_id"]), {}


def _stage_mixture_sample(spark, docs, p):
    from .operators import sampling

    return (
        sampling.mixture_sample(
            docs, p["weights"], p.get("strata_col", "source"), key_cols=["doc_id"]
        ),
        {},
    )


def _stage_stratified_sample(spark, docs, p):
    from .operators import sampling

    return (
        sampling.stratified_sample(
            docs, p.get("strata_cols", ["lang"]), p["k"], key_cols=["doc_id"]
        ),
        {},
    )


def _stage_weighted_sample(spark, docs, p):
    from .operators import sampling

    return (
        sampling.weighted_sample(docs, p["k"], p["weight_col"], key_cols=["doc_id"]),
        {},
    )


def _stage_redact_pii(spark, docs, p):
    """TRANSFORM stage (row count unchanged): rewrite the text column
    with emails/IPs redacted — a map-only column expression that fuses
    into the scan."""
    from .functions import text as X

    col = p.get("text_col", "text")
    return docs.withColumn(col, X.redact_pii(F.col(col))), {}


def _stage_nll_band(spark, docs, p):
    """CCNet-style middle-band selection: keep documents whose mean
    unigram NLL under the corpus's own LM falls inside [lo, hi] —
    dropping both tails (rare-token gibberish above, stopword soup
    below). Band bounds are either absolute (`lo`/`hi`) or quantiles of
    the current corpus (`lo_q`/`hi_q`, computed exactly)."""
    from .operators import termstats

    scored = termstats.unigram_logprob(docs, id_col="doc_id")
    if "lo_q" in p or "hi_q" in p:
        qs = scored.approxQuantile(
            "avg_nll", [p.get("lo_q", 0.0), p.get("hi_q", 1.0)], 0.0
        )
        lo, hi = qs[0], qs[1]
    else:
        lo, hi = p.get("lo", float("-inf")), p.get("hi", float("inf"))
    keep = scored.where(
        (F.col("avg_nll") >= lo) & (F.col("avg_nll") <= hi)
    ).select(F.col("id").alias("doc_id"))
    return docs.join(keep, "doc_id", "left_semi"), {"lo": lo, "hi": hi}


def _stage_scrub_spans(spark, docs, p):
    """TRANSFORM stage: cut cross-document duplicated k-token spans out
    of the text (RefinedWeb-style boilerplate scrub); row count
    unchanged, before/after token counts added."""
    from .operators.spans import scrub_duplicated_spans

    return (
        scrub_duplicated_spans(
            docs,
            k=p.get("k", 8),
            min_docs=p.get("min_docs", 2),
            max_df=p.get("max_df"),
            text_col=p.get("text_col", "text"),
        ),
        {},
    )


def _stage_dsir_sample(spark, docs, p):
    from .operators import dsir

    target = docs.where(F.col(p.get("target_col", "lang")) == p["target_value"])
    picked = dsir.dsir_sample(docs, target, n=p["n"], k=p.get("smoothing", 0.5))
    return (
        docs.join(
            picked.select(F.col("id").alias("doc_id")), "doc_id", "left_semi"
        ),
        {},
    )


def _stage_temperature_sample(spark, docs, p):
    from .operators import sampling

    return (
        sampling.temperature_sample(
            docs,
            p.get("strata_col", "lang"),
            budget=p["budget"],
            alpha=p.get("alpha", 0.5),
            key_cols=["doc_id"],
        ),
        {},
    )


def _stage_train_split(spark, docs, p):
    """TRANSFORM stage (row count unchanged): attach a leakage-safe
    `split` column — groups are near-dup clusters discovered with the
    same LSH parameters as `near_dedup`, singletons group as themselves,
    so a doc and its near-duplicates always land in the same split."""
    from .operators import dedup, sampling

    clusters = dedup.dup_clusters(
        docs,
        threshold=p.get("threshold", 0.5),
        num_hashes=p.get("num_hashes", 16),
        bands=p.get("bands", 4),
        n=p.get("n", 3),
    )
    grouped = docs.join(
        clusters.withColumnRenamed("id", "doc_id"), "doc_id", "left"
    ).withColumn("grp", F.coalesce("cluster", "doc_id")).drop("cluster")
    fractions = p.get("fractions", {"train": 0.9, "val": 0.05, "test": 0.05})
    out = sampling.leakage_safe_split(grouped, fractions, "grp").drop("grp")
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    return out, {"split_counts": counts}


def _stage_quality_filter(spark, docs, p):
    """GPT-3-style quality gate: train the in-engine logistic classifier
    (operators/logreg) to recognize ``seed_sources``, then keep documents
    scoring ≥ ``threshold`` (seed documents kept unconditionally unless
    ``keep_seed`` is false). Reports the trained weights."""
    from .functions import text as tf
    from .operators import logreg

    t = F.col("text")
    feats = docs.select(
        "doc_id",
        F.least(tf.token_count(t).cast("double") / 100.0, F.lit(1.0)).alias(
            "x_len"
        ),
        tf.punct_ratio(t).alias("x_punct"),
        tf.stopword_ratio(t).alias("x_stop"),
        F.col("source").isin(*p["seed_sources"]).cast("long").alias("is_seed"),
    )
    cols = ["x_len", "x_punct", "x_stop"]
    w = logreg.train(
        feats, cols, "is_seed", lr=p.get("lr", 1.0), iters=p.get("iters", 4)
    )
    scored = feats.select("doc_id", logreg.score(cols, w).alias("_q"), "is_seed")
    keep = F.col("_q") >= float(p.get("threshold", 0.5))
    if p.get("keep_seed", True):
        keep = keep | (F.col("is_seed") == 1)
    survivors = scored.where(keep).select("doc_id")
    return (
        docs.join(survivors, "doc_id", "left_semi"),
        {"weights": [round(x, 6) for x in w]},
    )


def _stage_rake_weights(spark, docs, p):
    """TRANSFORM stage (row count unchanged): attach the two-margin IPF
    sampling weight (operators/raking) over (row_col × col_col)."""
    from .operators import raking

    out = raking.rake_weights(
        docs,
        p.get("row_col", "lang"),
        p.get("col_col", "source"),
        p.get("row_targets"),
        p.get("col_targets"),
        rounds=p.get("rounds", 3),
    )
    return out, {}


STAGES = {
    "filter_funnel": _stage_filter_funnel,
    "exact_dedup": _stage_exact_dedup,
    "near_dedup": _stage_near_dedup,
    "decontaminate": _stage_decontaminate,
    "hash_sample": _stage_hash_sample,
    "mixture_sample": _stage_mixture_sample,
    "stratified_sample": _stage_stratified_sample,
    "weighted_sample": _stage_weighted_sample,
    "dsir_sample": _stage_dsir_sample,
    "redact_pii": _stage_redact_pii,
    "scrub_spans": _stage_scrub_spans,
    "nll_band": _stage_nll_band,
    "temperature_sample": _stage_temperature_sample,
    "train_split": _stage_train_split,
    "quality_filter": _stage_quality_filter,
    "rake_weights": _stage_rake_weights,
}


def run_pipeline(spark: SparkSession, cfg: dict) -> dict:
    """Apply cfg['stages'] in order to cfg['documents']; write the
    surviving corpus under cfg['output'] and return the report dict."""
    unknown = [s.get("op") for s in cfg["stages"] if s.get("op") not in STAGES]
    if unknown:
        raise ValueError(f"unknown stage ops: {unknown} (valid: {sorted(STAGES)})")
    trunc = EphemeralTruncator(spark, "datapipe")
    docs = spark.read.parquet(cfg["documents"])
    n = docs.count()
    report = {"input": cfg["documents"], "n_input": n, "stages": []}
    for i, spec in enumerate(cfg["stages"]):
        op = spec["op"]
        docs, extra = STAGES[op](spark, docs, spec)
        docs = trunc.truncate(docs, reap=False)
        n_out = docs.count()
        entry = {"stage": i, "op": op, "n_in": n, "n_out": n_out,
                 "n_dropped": n - n_out}
        entry.update(extra)
        report["stages"].append(entry)
        n = n_out
    out_dir = cfg["output"]
    corpus_path = os.path.join(out_dir, "corpus.parquet")
    docs.write.mode("overwrite").parquet(corpus_path)
    report["n_output"] = n
    report["corpus"] = corpus_path
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    return report


def main() -> None:
    from .session import get_spark

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config", required=True)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    cfg = _load_config(args.config)
    spark = get_spark(app_name="osmgraphing-datapipe", master=args.master or cfg.get("master"))
    try:
        report = run_pipeline(spark, cfg)
    except Exception as exc:  # surface a clean one-line failure for scripts
        print(f"datapipe failed: {exc}", file=sys.stderr)
        raise SystemExit(1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
