"""Multinomial Naive Bayes vs a pure-Python mirror + recovery check."""

from __future__ import annotations

import math
import random
import re

import pytest

from osmgraphing_spark.operators import nbayes


def _toks(t):
    return re.split(r"\s+", t.strip().lower())


def _nb_py(train, test, k=1.0):
    nd = len(train)
    by_c = {}
    for _, y, t in train:
        by_c.setdefault(y, []).append(t)
    counts, totals = {}, {}
    vocab = set()
    for y, texts in by_c.items():
        c = {}
        for t in texts:
            for tok in _toks(t):
                c[tok] = c.get(tok, 0) + 1
                vocab.add(tok)
        counts[y] = c
        totals[y] = sum(c.values())
    v = len(vocab)
    out = {}
    for did, text in test:
        best = None
        for y in sorted(by_c):
            s = math.log(len(by_c[y]) / nd)
            for tok in _toks(text):
                if tok not in vocab:
                    continue
                s += math.log(
                    (counts[y].get(tok, 0) + k) / (totals[y] + k * v)
                )
            s = round(s, 6)
            if best is None or s > best[1] or (s == best[1] and y < best[0]):
                best = (y, s)
        out[did] = best
    return out


@pytest.fixture(scope="module")
def data(spark):
    rng = random.Random(73)
    spam_v = ["buy", "cheap", "now", "offer", "click"]
    ham_v = ["meeting", "report", "spark", "review", "plan"]
    train = []
    for i in range(40):
        y = "spam" if i % 2 else "ham"
        v = spam_v if y == "spam" else ham_v
        noise = ["the", "a"]
        train.append(
            (i, y, " ".join(rng.choice(v + noise) for _ in range(10)))
        )
    test = [
        (100, "cheap offer click now"),
        (101, "spark review meeting plan"),
        (102, "zzz unknown tokens only"),
        (103, "the a the a"),
    ]
    tr = spark.createDataFrame(train, "doc_id long, lang string, text string")
    te = spark.createDataFrame(test, "doc_id long, text string")
    return train, test, tr, te


def test_nb_matches_mirror(spark, data):
    train, test, tr, te = data
    priors, lik = nbayes.train_nb(tr, "lang")
    got = {
        r["doc_id"]: (r["label"], r["score"])
        for r in nbayes.classify_nb(te, priors, lik).collect()
    }
    want = _nb_py([(i, y, t) for i, y, t in train], test)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], d
        assert abs(got[d][1] - want[d][1]) < 2e-6

    # the classifier recovers the planted classes
    assert got[100][0] == "spam" and got[101][0] == "ham"


def test_nb_dense_likelihood_table(spark, data):
    train, _, tr, _ = data
    priors, lik = nbayes.train_nb(tr, "lang")
    n_labels = priors.count()
    vocab = lik.select("tok").distinct().count()
    assert lik.count() == n_labels * vocab  # dense: every (class, token)
