"""Unit tests for decontamination, unigram LM scoring, TF-IDF keywords,
and stratified sampling — each against a pure-Python oracle (the same
discipline as the reference's hand-computed golden tables,
/root/reference/tests/small/routing/shortest.rs:95-180)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from osmgraphing_spark.operators import sampling, termstats
from osmgraphing_spark.operators.decontaminate import (
    contamination_stats,
    decontaminate,
)

DOCS = [
    # (doc_id, text)
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a completely different sentence with no overlap at all"),
    (2, "quick brown fox goes home early today"),  # shares "quick brown fox"
    (3, "the quick brown fox jumps again and again"),  # shares 3 trigrams
    (4, "short doc"),  # < 3 tokens → no shingles
    (5, "lazy dog sleeps while the quick brown fox jumps over fences"),
]


def _df(spark, rows=DOCS):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _ngrams(text, n=3):
    toks = text.lower().strip().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------

def test_contamination_stats_matches_python(spark):
    docs = _df(spark)
    bench = docs.where(F.col("doc_id") == 0)
    corpus = docs.where(F.col("doc_id") != 0)
    got = {
        r["id"]: (r["sz"], r["n_hits"], r["overlap_frac"])
        for r in contamination_stats(corpus, bench, n=3).collect()
    }

    bench_grams = _ngrams(DOCS[0][1])
    expect = {}
    for did, text in DOCS[1:]:
        grams = _ngrams(text)
        hits = len(grams & bench_grams)
        if grams and hits >= 1:
            expect[did] = (len(grams), hits, round(hits / len(grams), 6))
    assert got == expect
    assert 3 in got and 2 in got  # planted overlaps found
    assert 1 not in got and 4 not in got  # clean doc + shingle-less doc


def test_decontaminate_drops_only_contaminated(spark):
    docs = _df(spark)
    bench = docs.where(F.col("doc_id") == 0)
    corpus = docs.where(F.col("doc_id") != 0)
    kept = sorted(
        r["doc_id"] for r in decontaminate(corpus, bench, n=3).collect()
    )
    bench_grams = _ngrams(DOCS[0][1])
    expect = sorted(
        did for did, text in DOCS[1:] if not (_ngrams(text) & bench_grams)
    )
    assert kept == expect
    assert 4 in kept  # too-short doc cannot be contaminated


def test_contamination_min_hits_threshold(spark):
    docs = _df(spark)
    bench = docs.where(F.col("doc_id") == 0)
    corpus = docs.where(F.col("doc_id") != 0)
    strict = contamination_stats(corpus, bench, n=3, min_hits=3).collect()
    for r in strict:
        assert r["n_hits"] >= 3


# ---------------------------------------------------------------------------
# unigram LM score
# ---------------------------------------------------------------------------

def test_unigram_logprob_matches_python(spark):
    docs = _df(spark)
    got = {
        r["id"]: (r["n_tokens"], r["avg_nll"])
        for r in termstats.unigram_logprob(docs).collect()
    }

    all_toks = [t for _, text in DOCS for t in text.lower().strip().split()]
    total = len(all_toks)
    freq = {}
    for t in all_toks:
        freq[t] = freq.get(t, 0) + 1
    expect = {}
    for did, text in DOCS:
        toks = text.lower().strip().split()
        nll = [-math.log(freq[t] / total) for t in toks]
        expect[did] = (len(toks), round(sum(nll) / len(nll), 6))
    assert got == expect


def test_unigram_logprob_ranks_rare_above_common(spark):
    """A doc of corpus-unique tokens must score strictly higher (more
    surprising) than a doc repeating the corpus's most common token."""
    rows = [
        (0, "common common common common"),
        (1, "xqzt wvut plok mjnh"),
        (2, "common common xqzt common"),
    ]
    scores = {
        r["id"]: r["avg_nll"]
        for r in termstats.unigram_logprob(_df(spark, rows)).collect()
    }
    assert scores[1] > scores[2] > scores[0]


# ---------------------------------------------------------------------------
# TF-IDF top terms
# ---------------------------------------------------------------------------

def test_tfidf_top_terms_matches_python(spark):
    docs = _df(spark)
    got = {}
    for r in termstats.tfidf_top_terms(docs, k=2).collect():
        got.setdefault(r["id"], []).append((r["rank"], r["term"], r["tf"], r["tfidf"]))
    for v in got.values():
        v.sort()

    n_docs = len(DOCS)
    tf = {}
    for did, text in DOCS:
        for t in text.lower().strip().split():
            tf[(did, t)] = tf.get((did, t), 0) + 1
    df = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    expect = {}
    for did, text in DOCS:
        terms = {t for t in text.lower().strip().split()}
        scored = sorted(
            (
                (-round(tf[(did, t)] * math.log((1 + n_docs) / (1 + df[t])), 6), t)
                for t in terms
            )
        )[:2]
        expect[did] = [
            (i + 1, t, tf[(did, t)], -s) for i, (s, t) in enumerate(scored)
        ]
    assert got == expect


def test_tfidf_rank_deterministic_under_repartition(spark):
    docs = _df(spark)
    a = sorted(map(tuple, termstats.tfidf_top_terms(docs, k=3).collect()))
    b = sorted(
        map(tuple, termstats.tfidf_top_terms(docs.repartition(7), k=3).collect())
    )
    assert a == b


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------

def _strat_rows():
    return [(i, "en" if i % 3 else "de") for i in range(200)]


def test_stratified_sample_exact_quota_and_determinism(spark):
    df = spark.createDataFrame(_strat_rows(), ["doc_id", "lang"])
    got = sampling.stratified_sample(df, ["lang"], 10, key_cols=["doc_id"])
    rows = got.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert {k: len(v) for k, v in by_lang.items()} == {"en": 10, "de": 10}

    # python oracle: k smallest (bucket, md5) per stratum
    def key(i):
        h = hashlib.md5(str(i).encode()).hexdigest()
        return (int(h[:14], 16) % 1_000_000, h)

    for lang, ids in by_lang.items():
        stratum = [i for i, lg in _strat_rows() if lg == lang]
        expect = sorted(stratum, key=key)[:10]
        assert sorted(ids) == sorted(expect)

    # invariant under repartitioning
    again = sampling.stratified_sample(
        df.repartition(13), ["lang"], 10, key_cols=["doc_id"]
    )
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, rows))


def test_stratified_sample_small_stratum_returns_all(spark):
    rows = [(1, "en"), (2, "en"), (3, "rare")]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    got = sampling.stratified_sample(df, ["lang"], 10, key_cols=["doc_id"])
    assert got.count() == 3


def test_stratified_sample_prefilter_composes_exactly(spark):
    """A hash prefilter keeping far more than k per stratum must not change
    the selected set (both stages order by the same hash)."""
    df = spark.createDataFrame(_strat_rows(), ["doc_id", "lang"])
    base = sampling.stratified_sample(df, ["lang"], 5, key_cols=["doc_id"])
    pre = sampling.stratified_sample(
        df, ["lang"], 5, key_cols=["doc_id"], prefilter_fraction=0.5
    )
    assert sorted(map(tuple, pre.collect())) == sorted(map(tuple, base.collect()))


# ---------------------------------------------------------------------------
# weighted (A-ES) sampling
# ---------------------------------------------------------------------------

def _py_race(i, w):
    """Mirror of sampling._race_key: r = round(-ln(u)/w, 9), u from the
    first 48 md5 bits; tie-break = full md5 hex."""
    h = hashlib.md5(str(i).encode()).hexdigest()
    u = (int(h[:12], 16) + 0.5) / float(1 << 48)
    return (round(-math.log(u) / w, 9), h)


def test_weighted_sample_matches_mirror_and_partitioning(spark):
    rows = [(i, float(1 + (i * 13) % 7)) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = sorted(
        r["doc_id"]
        for r in sampling.weighted_sample(df, 20, "w", key_cols=["doc_id"]).collect()
    )
    exp = sorted(
        i for i, w in sorted(rows, key=lambda t: _py_race(t[0], t[1]))[:20]
    )
    assert got == exp
    again = sorted(
        r["doc_id"]
        for r in sampling.weighted_sample(
            df.repartition(17), 20, "w", key_cols=["doc_id"]
        ).collect()
    )
    assert again == got


def test_weighted_sample_zero_and_null_weights_excluded(spark):
    rows = [(1, 0.0), (2, None), (3, -1.0), (4, 2.0), (5, 1.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = {r["doc_id"] for r in sampling.weighted_sample(df, 10, "w").collect()}
    assert got == {4, 5}


def test_weighted_sample_monotone_in_weight(spark):
    """A-ES with fixed uniforms: raising one row's weight can only lower
    its race key — a selected row stays selected as its weight grows."""
    base = [(i, 1.0) for i in range(100)]
    df = spark.createDataFrame(base, ["doc_id", "w"])
    sel = {
        r["doc_id"]
        for r in sampling.weighted_sample(df, 10, "w", key_cols=["doc_id"]).collect()
    }
    target = sorted(sel)[0]
    boosted = [(i, 50.0 if i == target else w) for i, w in base]
    df2 = spark.createDataFrame(boosted, ["doc_id", "w"])
    sel2 = {
        r["doc_id"]
        for r in sampling.weighted_sample(df2, 10, "w", key_cols=["doc_id"]).collect()
    }
    assert target in sel2


def test_weighted_sample_favors_heavy_rows(spark):
    """With weights 1000 vs 1, the heavy rows should dominate the sample
    (deterministic, but the proportionality shows through)."""
    rows = [(i, 1000.0 if i < 20 else 1.0) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = [
        r["doc_id"]
        for r in sampling.weighted_sample(df, 20, "w", key_cols=["doc_id"]).collect()
    ]
    heavy = sum(1 for i in got if i < 20)
    assert heavy >= 15  # 20 heavy rows carry 1000:1 odds per slot


def test_weighted_stratified_sample_quota_and_mirror(spark):
    rows = [(i, "en" if i % 3 else "de", float(1 + i % 5)) for i in range(150)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "w"])
    got = sampling.weighted_stratified_sample(
        df, ["lang"], 7, "w", key_cols=["doc_id"]
    ).collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert {k: len(v) for k, v in by_lang.items()} == {"en": 7, "de": 7}
    for lang, ids in by_lang.items():
        stratum = [(i, w) for i, lg, w in rows if lg == lang]
        exp = [i for i, w in sorted(stratum, key=lambda t: _py_race(t[0], t[1]))[:7]]
        assert sorted(ids) == sorted(exp)


# ---------------------------------------------------------------------------
# bigram LM scoring
# ---------------------------------------------------------------------------

def _py_bigram_nll(rows, k=0.5):
    from collections import Counter

    def toks(t):
        return t.strip().lower().split()

    bgs = {i: [" ".join(p) for p in zip(toks(t), toks(t)[1:])] for i, t in rows}
    freq = Counter(b for bs in bgs.values() for b in bs)
    ctx = Counter()
    for b, c in freq.items():
        ctx[b.split(" ")[0]] += c
    vocab = len({w for _, t in rows for w in toks(t)})
    out = {}
    for i, bs in bgs.items():
        if not bs:
            continue
        nll = [
            -math.log((freq[b] + k) / (ctx[b.split(" ")[0]] + k * vocab))
            for b in bs
        ]
        out[i] = (len(bs), round(sum(nll) / len(nll), 6))
    return out


def test_bigram_logprob_matches_mirror(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the mat"),
        (3, "mat the on sat cat the"),   # shuffled word order
        (4, "single"),                    # no bigrams: absent from output
        (5, "the cat sat on the mat again"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: (r["n_bigrams"], r["avg_nll"])
        for r in termstats.bigram_logprob(df).collect()
    }
    exp = _py_bigram_nll(rows)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i][0] == exp[i][0]
        assert abs(got[i][1] - exp[i][1]) < 1e-6
    # word order matters: the shuffled doc scores worse than the fluent one
    assert got[3][1] > got[1][1]
