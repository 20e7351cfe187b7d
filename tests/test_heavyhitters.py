"""Heavy hitters — python Counter/md5 mirrors pin exact counts, sketch
cells (portability), the CMS overestimate guarantee, and the
sketch-then-verify composition's exactness."""

from __future__ import annotations

import hashlib
import random
from collections import Counter

import pytest


def _py_terms(rows, n=1):
    """Mirror of heavyhitters.terms_of: lowercase whitespace n-grams."""
    out = []
    for _id, text in rows:
        toks = text.strip().lower().split()
        if not toks:
            toks = [""]  # split('') semantics: one empty token
        if n == 1:
            out.extend(toks)
        else:
            out.extend(
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            )
    return out


def _py_hash_pair(term):
    h = hashlib.md5(term.encode()).hexdigest()
    return int(h[:14], 16), int(h[14:28], 16)


def _py_sketch(terms, depth, width):
    cells = Counter()
    for t in terms:
        u, v = _py_hash_pair(t)
        for r in range(depth):
            cells[(r, (u + r * v) % width)] += 1
    return cells


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "a cat and a dog and a bird"),
    (4, "the the the tokenizer stress test"),
    (5, "  leading and trailing   spaces  "),
]


def test_top_terms_matches_counter(spark):
    from osmgraphing_spark.operators import heavyhitters as hh

    got = {
        (r["term"], r["cnt"], r["rank"])
        for r in hh.top_terms(_docs_df(spark, DOCS), k=5).collect()
    }
    cnt = Counter(_py_terms(DOCS))
    exp_order = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    exp = {(t, c, i + 1) for i, (t, c) in enumerate(exp_order)}
    assert got == exp


def test_bigram_counts_match_mirror(spark):
    from osmgraphing_spark.operators import heavyhitters as hh

    got = {
        (r["term"], r["cnt"])
        for r in hh.term_counts(_docs_df(spark, DOCS), n=2).collect()
    }
    assert got == set(Counter(_py_terms(DOCS, n=2)).items())


def test_cms_sketch_portable_cells(spark):
    """Every sketch cell equals the python md5 recomputation — the same
    portability contract as MinHash, and what the SQL oracle relies on."""
    from osmgraphing_spark.operators import heavyhitters as hh

    depth, width = 3, 64
    got = {
        (r["r"], r["c"]): r["cnt"]
        for r in hh.cms_sketch(_docs_df(spark, DOCS), depth, width).collect()
    }
    exp = _py_sketch(_py_terms(DOCS), depth, width)
    assert got == dict(exp)


@pytest.mark.parametrize("width", [16, 4096])
def test_cms_estimate_overestimates_and_converges(spark, width):
    """est ≥ true always; with width ≫ vocabulary the estimate is exact."""
    from osmgraphing_spark.operators import heavyhitters as hh

    docs = _docs_df(spark, DOCS)
    true = Counter(_py_terms(DOCS))
    terms = docs.sparkSession.createDataFrame(
        [(t,) for t in true], "term string"
    )
    sketch = hh.cms_sketch(docs, depth=4, width=width)
    est = {r["term"]: r["est"] for r in hh.cms_estimate(sketch, terms, 4, width).collect()}
    assert set(est) == set(true)
    for t, c in true.items():
        assert est[t] >= c
    if width == 4096:
        assert est == dict(true)


@pytest.mark.parametrize("seed,min_count,width", [(1, 3, 512), (7, 5, 64)])
def test_frequent_terms_exact(spark, seed, min_count, width):
    """Sketch→verify returns EXACTLY the true ≥min_count set with exact
    counts — even with a narrow (collision-heavy) sketch, because CMS
    never underestimates and the verify pass is exact."""
    from osmgraphing_spark.operators import heavyhitters as hh

    rng = random.Random(seed)
    vocab = [f"w{i:02d}" for i in range(40)]
    rows = [
        (i, " ".join(rng.choices(vocab, weights=range(1, 41), k=30)))
        for i in range(25)
    ]
    got = {
        (r["term"], r["cnt"])
        for r in hh.frequent_terms(
            _docs_df(spark, rows), min_count, depth=4, width=width
        ).collect()
    }
    true = Counter(_py_terms(rows))
    exp = {(t, c) for t, c in true.items() if c >= min_count}
    assert got == exp
