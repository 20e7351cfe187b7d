"""Repetition-quality stats and PII scrubbing vs python oracles."""

from __future__ import annotations

import collections
import re

from pyspark.sql import functions as F

from osmgraphing_spark.functions import text as X
from osmgraphing_spark.operators import repetition as rep

DOCS = [
    (0, "the cat sat on the mat the cat sat again"),
    (1, "a b a b a b a b"),            # top bigram "a b" dominates
    (2, "unique tokens only here now"),
    (3, "solo"),                       # <2 tokens: absent from ngram stats
    (4, ""),                           # empty: absent from ngram stats
    (5, "tie tie bird bird"),          # count tie -> lexicographic min
    (6, "Mixed CASE mixed case MIXED"),
]


def _py_top_bigram(text: str):
    toks = text.lower().strip().split()
    if len(toks) < 2:
        return None
    grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    cnt = collections.Counter(grams)
    top = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    return top[0], top[1], len(grams)


def test_top_ngram_stats_matches_python(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["top_ngram"], r["top_ngram_cnt"], r["n_ngrams"])
        for r in rep.top_ngram_stats(df, n=2).collect()
    }
    want = {
        i: _py_top_bigram(t) for i, t in DOCS if _py_top_bigram(t) is not None
    }
    assert got == want
    # tie-break pinned: "bird bird" < "tie bird" < "tie tie"
    assert got[5][0] == "bird bird"


def test_top_trigram_and_short_docs(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in rep.top_ngram_stats(df, n=3).collect()}
    assert 3 not in out and 4 not in out
    assert 1 in out and out[1]["top_ngram"] == "a b a"
    assert out[1]["n_ngrams"] == 6


def test_dup_token_fraction(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["f"]
        for r in df.select(
            "doc_id", X.dup_token_fraction(F.col("text")).alias("f")
        ).collect()
    }
    for i, t in DOCS:
        toks = t.lower().strip().split()
        want = 0.0 if not toks else round(1.0 - len(set(toks)) / len(toks), 6)
        assert abs(got[i] - want) < 1e-9, (i, got[i], want)
    assert got[2] == 0.0 and got[1] > 0.7


PII_DOCS = [
    (0, "reach me at alice.smith+work@example.co.uk or 192.168.0.1 today"),
    (1, "no pii here at all"),
    (2, "a@b.io b@c.net 10.0.0.255 999.999.999.999"),  # 2 emails, 2 "IPs"
    (3, "version 1.2.3 is not an ip, 1.2.3.4 is"),
]


def test_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(PII_DOCS, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            X.count_emails(F.col("text")).alias("ne"),
            X.count_ipv4(F.col("text")).alias("ni"),
            X.redact_pii(F.col("text")).alias("red"),
        ).collect()
    }
    assert [out[i]["ne"] for i in range(4)] == [1, 0, 2, 0]
    assert [out[i]["ni"] for i in range(4)] == [1, 0, 2, 1]
    assert out[0]["red"] == "reach me at <EMAIL> or <IP> today"
    assert out[2]["red"] == "<EMAIL> <EMAIL> <IP> <IP>"
    assert out[3]["red"] == "version 1.2.3 is not an ip, <IP> is"
    # python-re cross-check on every row (same patterns, same semantics)
    for i, t in PII_DOCS:
        assert out[i]["ne"] == len(re.findall(X.EMAIL_PATTERN, t))
        assert out[i]["ni"] == len(re.findall(X.IPV4_PATTERN, t))


def test_pii_redaction_order(spark):
    # digit-TLD "email" is not an email by our pattern; the IP pass gets it.
    # A real email with an IP-like prefix is taken whole by the email pass.
    df = spark.createDataFrame(
        [(0, "x user@1.2.3.4 y"), (1, "x 1.2.3.4@mail.com y")],
        ["doc_id", "text"],
    )
    red = {
        r["doc_id"]: r["r"]
        for r in df.select(
            "doc_id", X.redact_pii(F.col("text")).alias("r")
        ).collect()
    }
    assert red[0] == "x user@<IP> y"
    assert red[1] == "x <EMAIL> y"
