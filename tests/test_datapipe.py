"""End-to-end config-driven document pipeline runner."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from osmgraphing_spark import datapipe
from osmgraphing_spark.operators import dedup as dd


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("dp"))
    path = os.path.join(base, "docs.parquet")
    # 25+ mostly-distinct tokens with a sprinkling of stopwords: passes the
    # length floor, the repetition cap and the stopword-ratio floor
    def mk(prefix):
        return "the " + " ".join(f"{prefix}{i}" for i in range(12)) + \
            " and " + " ".join(f"{prefix}x{i}" for i in range(12)) + " of it"

    rows = [
        (0, mk("word") + " alpha", "en", "web"),
        (1, mk("word") + " alpha", "en", "web"),   # exact dup of 0
        (2, mk("word") + " beta", "en", "books"),  # near dup of 0
        (3, "short doc", "en", "web"),             # fails min_tokens
        (4, mk("gamma"), "fr", "web"),             # distinct vocabulary
        (5, mk("delta"), "de", "books"),           # distinct vocabulary
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    df = df.withColumn("n_chars", F.length("text"))
    df.write.mode("overwrite").parquet(path)
    return path


def test_pipeline_report_and_survivors(spark, corpus_path, tmp_path):
    cfg = {
        "documents": corpus_path,
        "output": str(tmp_path / "out"),
        "stages": [
            {"op": "filter_funnel", "min_tokens": 20},
            {"op": "exact_dedup"},
            {"op": "near_dedup", "threshold": 0.5, "num_hashes": 8, "bands": 4},
        ],
    }
    report = datapipe.run_pipeline(spark, cfg)
    assert report["n_input"] == 6
    # chain arithmetic: each stage's n_in is the previous n_out
    n = report["n_input"]
    for st in report["stages"]:
        assert st["n_in"] == n
        assert st["n_out"] == n - st["n_dropped"]
        n = st["n_out"]
    assert report["n_output"] == n
    # funnel stage carries the per-rule breakdown
    assert "rules" in report["stages"][0]
    # doc 3 fails the funnel; doc 1 is an exact dup; doc 2 a near dup
    out = spark.read.parquet(report["corpus"])
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 3 not in ids and 1 not in ids and 2 not in ids
    assert 0 in ids and 4 in ids and 5 in ids
    # report.json written next to the corpus
    with open(os.path.join(cfg["output"], "report.json")) as f:
        assert json.load(f)["n_output"] == report["n_output"]


def test_pipeline_sampling_and_dsir(spark, corpus_path, tmp_path):
    cfg = {
        "documents": corpus_path,
        "output": str(tmp_path / "out2"),
        "stages": [
            {"op": "mixture_sample", "weights": {"web": 1.0, "books": 1.0},
             "strata_col": "source"},
            {"op": "dsir_sample", "target_value": "en", "n": 3},
        ],
    }
    report = datapipe.run_pipeline(spark, cfg)
    assert report["n_output"] == 3
    out = spark.read.parquet(report["corpus"])
    assert out.count() == 3
    assert set(out.columns) >= {"doc_id", "text", "lang", "source"}


def test_pipeline_matches_direct_operator_calls(spark, corpus_path, tmp_path):
    cfg = {
        "documents": corpus_path,
        "output": str(tmp_path / "out3"),
        "stages": [{"op": "exact_dedup"}],
    }
    report = datapipe.run_pipeline(spark, cfg)
    direct = dd.drop_exact_duplicates(spark.read.parquet(corpus_path))
    got = {r["doc_id"] for r in spark.read.parquet(report["corpus"]).collect()}
    want = {r["doc_id"] for r in direct.collect()}
    assert got == want


def test_pipeline_rejects_unknown_stage(spark, corpus_path, tmp_path):
    cfg = {
        "documents": corpus_path,
        "output": str(tmp_path / "out4"),
        "stages": [{"op": "nonsense"}],
    }
    with pytest.raises(ValueError, match="unknown stage ops"):
        datapipe.run_pipeline(spark, cfg)


def test_config_loader_validation(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"documents": "x", "stages": []}))
    with pytest.raises(ValueError):
        datapipe._load_config(str(p))
    p2 = tmp_path / "ok.yaml"
    p2.write_text(
        "documents: /x/docs.parquet\n"
        "output: /x/out\n"
        "stages:\n"
        "  - op: exact_dedup\n"
    )
    cfg = datapipe._load_config(str(p2))
    assert cfg["stages"][0]["op"] == "exact_dedup"


def test_pipeline_redact_pii_transform(spark, tmp_path):
    path = str(tmp_path / "pii.parquet")
    spark.createDataFrame(
        [(0, "contact bob@example.com at 10.0.0.1 now", "en", "web")],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(path)
    cfg = {
        "documents": path,
        "output": str(tmp_path / "out5"),
        "stages": [{"op": "redact_pii"}],
    }
    report = datapipe.run_pipeline(spark, cfg)
    assert report["stages"][0]["n_dropped"] == 0
    text = spark.read.parquet(report["corpus"]).collect()[0]["text"]
    assert "bob@example.com" not in text and "10.0.0.1" not in text


def test_pipeline_nll_band(spark, corpus_path, tmp_path):
    from osmgraphing_spark.operators import termstats

    docs = spark.read.parquet(corpus_path)
    scored = {r["id"]: r["avg_nll"]
              for r in termstats.unigram_logprob(docs).collect()}
    vals = sorted(scored.values())
    lo, hi = vals[1], vals[-2]  # cut one doc from each tail
    cfg = {
        "documents": corpus_path,
        "output": str(tmp_path / "out6"),
        "stages": [{"op": "nll_band", "lo": lo, "hi": hi}],
    }
    report = datapipe.run_pipeline(spark, cfg)
    got = {r["doc_id"]
           for r in spark.read.parquet(report["corpus"]).collect()}
    want = {d for d, v in scored.items() if lo <= v <= hi}
    assert got == want
    assert report["stages"][0]["lo"] == lo

    # quantile form: middle 60% band keeps a strict subset
    cfg2 = {
        "documents": corpus_path,
        "output": str(tmp_path / "out7"),
        "stages": [{"op": "nll_band", "lo_q": 0.2, "hi_q": 0.8}],
    }
    r2 = datapipe.run_pipeline(spark, cfg2)
    assert 0 < r2["n_output"] < r2["n_input"]


def test_pipeline_temperature_and_train_split(spark, corpus_path, tmp_path):
    cfg = {
        "documents": corpus_path,
        "output": str(tmp_path / "out_ts"),
        "stages": [
            {"op": "train_split", "threshold": 0.5, "num_hashes": 8,
             "bands": 4, "fractions": {"train": 0.8, "val": 0.1, "test": 0.1}},
            {"op": "temperature_sample", "strata_col": "lang",
             "budget": 100, "alpha": 0.5},
        ],
    }
    report = datapipe.run_pipeline(spark, cfg)
    out = spark.read.parquet(report["corpus"])
    # train_split is a transform (drops nothing) and attaches `split`
    assert report["stages"][0]["n_dropped"] == 0
    assert set(report["stages"][0]["split_counts"]) <= {"train", "val", "test"}
    assert "split" in out.columns and "grp" not in out.columns
    # leakage guard survives the pipeline: docs 0/1/2 are one near-dup
    # cluster, so whichever of them survive share one split value
    splits = {r["doc_id"]: r["split"] for r in out.collect()}
    cluster = {s for d, s in splits.items() if d in (0, 1, 2)}
    assert len(cluster) <= 1
    # budget 100 >> corpus: temperature stage saturates, drops nothing
    assert report["stages"][1]["n_dropped"] == 0


def test_pipeline_quality_filter_and_rake(spark, corpus_path, tmp_path):
    """quality_filter trains in-pipeline and reports weights; seed docs
    survive unconditionally; rake_weights attaches a positive weight to
    every surviving row without changing the count."""
    cfg = {
        "documents": corpus_path,
        "output": str(tmp_path / "outq"),
        "stages": [
            {"op": "quality_filter", "seed_sources": ["books"],
             "threshold": 2.0},  # impossible threshold: only seeds survive
            {"op": "rake_weights", "rounds": 3},
        ],
    }
    report = datapipe.run_pipeline(spark, cfg)
    out = spark.read.parquet(report["corpus"])
    rows = out.collect()
    assert {r["source"] for r in rows} == {"books"}
    assert all(r["weight"] > 0 for r in rows)
    stage0 = report["stages"][0]
    assert len(stage0["weights"]) == 4  # bias + 3 features
