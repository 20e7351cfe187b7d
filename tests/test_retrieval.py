"""BM25 vs a pure-Python mirror (Lucene idf variant)."""

from __future__ import annotations

import math
import re
import random

import pytest

from osmgraphing_spark.operators import retrieval

K1, B = 1.2, 0.75


def _toks(text):
    return re.split(r"\s+", text.strip().lower())


def _bm25_py(docs, queries, k1=K1, b=B):
    postings = {}
    dl = {}
    for did, text in docs:
        t = _toks(text)
        dl[did] = len(t)
        tf = {}
        for tok in t:
            tf[tok] = tf.get(tok, 0) + 1
        postings[did] = tf
    n = len(docs)
    avgdl = sum(dl.values()) / n
    df = {}
    for tf in postings.values():
        for tok in tf:
            df[tok] = df.get(tok, 0) + 1
    out = {}
    for qid, qtext in queries:
        qtf = {}
        for tok in _toks(qtext):
            qtf[tok] = qtf.get(tok, 0) + 1
        for did, tf in postings.items():
            s = 0.0
            for tok, qn in qtf.items():
                if tok not in tf:
                    continue
                idf = math.log((n - df[tok] + 0.5) / (df[tok] + 0.5) + 1.0)
                s += qn * idf * (tf[tok] * (k1 + 1)) / (
                    tf[tok] + k1 * (1 - b + b * dl[did] / avgdl)
                )
            if s > 0:
                out[(qid, did)] = round(s, 6)
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(43)
    vocab = ["spark", "join", "scan", "sort", "merge", "row", "key", "data"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(5, 15))))
        for i in range(25)
    ]
    queries = [(0, "spark join"), (1, "sort merge join"), (2, "zzz_absent")]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(queries, "query_id long, text string")
    return docs, queries, ddf, qdf


def test_bm25_scores_match_mirror(spark, corpus):
    docs, queries, ddf, qdf = corpus
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in retrieval.bm25_scores(ddf, qdf, k1=K1, b=B).collect()
    }
    want = _bm25_py(docs, queries)
    assert set(got) == set(want)
    for key in want:
        assert abs(got[key] - want[key]) < 2e-6, key
    # the absent-term query matches nothing
    assert not any(q == 2 for q, _ in got)


def test_bm25_topk_order_and_ties(spark, corpus):
    docs, queries, ddf, qdf = corpus
    k = 5
    got = [
        (r["query_id"], r["doc_id"], r["rk"])
        for r in retrieval.bm25_topk(ddf, qdf, k=k)
        .orderBy("query_id", "rk")
        .collect()
    ]
    want_scores = _bm25_py(docs, queries)
    for qid in (0, 1):
        ranked = sorted(
            ((did, s) for (q, did), s in want_scores.items() if q == qid),
            key=lambda t: (-t[1], t[0]),
        )[:k]
        got_q = [(d, rk) for q, d, rk in got if q == qid]
        assert got_q == [(d, i + 1) for i, (d, _) in enumerate(ranked)]


def test_bm25_prefers_rare_term_doc(spark):
    ddf = spark.createDataFrame(
        [
            (1, "common common common"),
            (2, "common rareterm"),
            (3, "common common"),
        ],
        "doc_id long, text string",
    )
    qdf = spark.createDataFrame([(0, "rareterm")], "query_id long, text string")
    rows = retrieval.bm25_topk(ddf, qdf, k=3).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 2


def test_rrf_fuse_matches_mirror(spark):
    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3), (1, 20, 1)],
        "query_id long, doc_id long, rk int",
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2), (1, 20, 1), (1, 21, 2)],
        "query_id long, doc_id long, rk int",
    )
    got = [
        (r["query_id"], r["doc_id"], r["rrf"], r["rk"])
        for r in retrieval.rrf_fuse(a, b, k=60, topn=3)
        .orderBy("query_id", "rk")
        .collect()
    ]

    def rrf(*ranks):
        return round(sum(1.0 / (60 + r) for r in ranks), 6)

    # q0: 11 in both (ranks 2,1) beats 10 (rank 1 once)
    assert got[0] == (0, 11, rrf(2, 1), 1)
    assert got[1] == (0, 10, rrf(1), 2)
    # 12 (rank 3) vs 13 (rank 2): 13 wins
    assert got[2] == (0, 13, rrf(2), 3)
    # q1: 20 in both
    assert [g for g in got if g[0] == 1][0] == (1, 20, rrf(1, 1), 1)


def test_rrf_tie_breaks_to_lowest_doc(spark):
    a = spark.createDataFrame([(0, 5, 1), (0, 3, 1)],
                              "query_id long, doc_id long, rk int")
    b = spark.createDataFrame([], "query_id long, doc_id long, rk int")
    rows = retrieval.rrf_fuse(a, b, topn=2).collect()
    assert [r["doc_id"] for r in sorted(rows, key=lambda r: r["rk"])] == [3, 5]
