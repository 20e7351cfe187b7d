"""BPE tokenizer training vs a pure-Python reference implementation."""

from __future__ import annotations

from collections import Counter

import pytest

from osmgraphing_spark.operators import bpe

from .conftest import spark  # noqa: F401


# ---------------------------------------------------------------------------
# python mirror (classic Sennrich-style word-level BPE)
# ---------------------------------------------------------------------------

def _py_hist(rows):
    import re

    c = Counter()
    for _, t in rows:
        for w in t.strip().lower().split():
            if re.fullmatch("[a-z]+", w):
                c[w] += 1
    return c


def _py_pairs(hist):
    c = Counter()
    for syms, freq in hist.items():
        for a, b in zip(syms, syms[1:]):
            c[(a, b)] += freq
    return c


def _py_apply(syms, lhs, rhs):
    out = []
    for x in syms:
        if out and out[-1] == lhs and x == rhs:
            out[-1] = lhs + rhs
        else:
            out.append(x)
    return tuple(out)


def _py_train(rows, k):
    hist = {tuple(w): f for w, f in _py_hist(rows).items()}
    merges = []
    for r in range(1, k + 1):
        pairs = _py_pairs(hist)
        if not pairs:
            break
        (lhs, rhs), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((r, lhs, rhs, lhs + rhs, cnt))
        nxt = {}
        for s, f in hist.items():
            ns = _py_apply(s, lhs, rhs)
            nxt[ns] = nxt.get(ns, 0) + f
        hist = nxt
    return merges


def _py_tokens(rows, merges):
    import re

    out = {}
    for i, t in rows:
        n_words = n_tokens = 0
        for w in t.strip().lower().split():
            if not re.fullmatch("[a-z]+", w):
                continue
            syms = tuple(w)
            for _, lhs, rhs, _, _ in merges:
                syms = _py_apply(syms, lhs, rhs)
            n_words += 1
            n_tokens += len(syms)
        if n_words:
            out[i] = (n_words, n_tokens)
    return out


ROWS = [
    (1, "lower lowest low low lower newer newest new"),
    (2, "wider wide widest new newer lower"),
    (3, "aaa aa aaaa banana bananas"),
    (4, "the cat the mat the hat"),
]


def test_train_matches_mirror(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = bpe.train_bpe(df, merges=8)
    exp = _py_train(ROWS, 8)
    assert got == exp


def test_overlapping_pair_is_leftmost_nonoverlapping(spark):
    # 'aaaa' with winning pair (a,a) must become (aa)(aa), not (aa)(a)(a)
    rows = [(1, "aaaa aaaa aaaa")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = bpe.train_bpe(df, merges=2)
    exp = _py_train(rows, 2)
    assert got == exp
    # first merge (a,a) sees 3 adjacent pairs per word (overlap counted)
    assert got[0][1:] == ("a", "a", "aa", 9)
    # second merge is (aa,aa): leftmost-nonoverlap left exactly [aa, aa]
    assert got[1][1:] == ("aa", "aa", "aaaa", 3)


def test_early_stop_when_no_pairs(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    got = bpe.train_bpe(df, merges=5)
    assert got == []  # single-char words: no adjacent pairs at all


def test_token_counts_match_mirror(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    merges = bpe.train_bpe(df, merges=6)
    got = {
        r["id"]: (r["n_words"], r["n_tokens"])
        for r in bpe.bpe_token_counts(df, merges).collect()
    }
    assert got == _py_tokens(ROWS, merges)
    # merges never expand, and compress the corpus overall (docs whose
    # words hit no merge — e.g. doc 4 — legitimately stay at 1 tok/char)
    chars = {i: sum(len(w) for w in t.split()) for i, t in ROWS}
    assert all(got[i][1] <= chars[i] for i in got)
    assert sum(t for _, t in got.values()) < sum(chars[i] for i in got)


def test_partition_invariance(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    a = bpe.train_bpe(df.repartition(1), merges=5)
    b = bpe.train_bpe(df.repartition(7), merges=5)
    assert a == b
