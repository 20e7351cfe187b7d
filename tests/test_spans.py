"""Substring-level dedup (operators/spans): hand-built golden corpus with a
known shared passage — the per-span analogue of the reference's build-time
dedup goldens (/root/reference/tests/small/parsing.rs edge-dedup counts)."""

from __future__ import annotations

import pytest

from osmgraphing_spark.operators import spans as sp

# Docs 1 and 2 share the 6-token passage "p q r s t u" verbatim; doc 3 is
# unrelated; doc 4 shares a shorter (4-token) overlap with doc 1 that must
# NOT appear at k=5. Tokens are single letters so positions are easy to
# count by hand.
DOCS = [
    (1, "a b c p q r s t u d e"),  # passage at tokens 4..9
    (2, "p q r s t u x y z"),  # passage at tokens 1..6
    (3, "m n o v w aa bb cc dd"),
    (4, "b c p q zz yy xx ww vv"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_window_fingerprints_positions(spark, docs_df):
    wf = sp.window_fingerprints(docs_df, k=5)
    rows = {(r.doc_id, r.pos): r.fp for r in wf.collect()}
    # doc 1 has 11 tokens → 7 windows; doc 2 has 9 → 5 windows
    assert sum(1 for (d, _p) in rows if d == 1) == 7
    assert sum(1 for (d, _p) in rows if d == 2) == 5
    # the shared passage aligns: doc1 window at pos 4 ("p q r s t") equals
    # doc2 window at pos 1; doc1 pos 5 equals doc2 pos 2
    assert rows[(1, 4)] == rows[(2, 1)]
    assert rows[(1, 5)] == rows[(2, 2)]
    # non-shared windows differ
    assert rows[(1, 1)] != rows[(2, 1)]


def test_duplicated_spans_golden(spark, docs_df):
    out = sp.duplicated_spans(docs_df, k=5, min_docs=2)
    got = {
        (r.doc_id, r.start_tok, r.end_tok, r.n_windows, r.max_docs)
        for r in out.collect()
    }
    # the 6-token passage yields 2 shared windows per doc, merged into ONE
    # maximal span covering exactly the passage: doc1 tokens 4..9,
    # doc2 tokens 1..6 — and nothing else anywhere.
    assert got == {(1, 4, 9, 2, 2), (2, 1, 6, 2, 2)}


def test_short_docs_and_k_guard(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "a b c")], "doc_id long, text string")
    assert sp.duplicated_spans(df, k=5).count() == 0  # both too short
    with pytest.raises(ValueError):
        sp.window_fingerprints(df, k=1)


def test_max_df_drops_boilerplate(spark):
    # the same 5-token line in every doc → df = 4 > max_df = 3 → no spans
    df = spark.createDataFrame(
        [(i, "l i c e n") for i in range(4)], "doc_id long, text string"
    )
    assert sp.duplicated_spans(df, k=5, max_df=3).count() == 0
    assert sp.duplicated_spans(df, k=5).count() == 4


def test_span_dedup_stats(spark, docs_df):
    spans = sp.duplicated_spans(docs_df, k=5, min_docs=2)
    stats = {r.doc_id: r for r in sp.span_dedup_stats(spans, docs_df, k=5).collect()}
    assert set(stats) == {1, 2, 3, 4}
    assert stats[1].dup_tokens == 6 and stats[1].total_tokens == 11
    assert stats[2].dup_tokens == 6 and stats[2].total_tokens == 9
    assert stats[3].dup_tokens == 0 and stats[3].dup_frac == 0.0
    assert abs(stats[2].dup_frac - round(6 / 9, 6)) < 1e-12


def test_spans_disjoint_per_doc(spark, docs_df):
    """Maximal-merge invariant: per doc, reported spans never overlap."""
    rows = sp.duplicated_spans(docs_df, k=5, min_docs=2).collect()
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.start_tok, r.end_tok))
    for ranges in by_doc.values():
        ranges.sort()
        for (s1, e1), (s2, _e2) in zip(ranges, ranges[1:]):
            assert e1 < s2


def test_scrub_removes_golden_passage(spark):
    from osmgraphing_spark.operators.spans import scrub_duplicated_spans

    shared = " ".join(f"dup{i}" for i in range(10))
    rows = [
        (0, f"alpha beta {shared} gamma delta", "en"),
        (1, f"one two three {shared} four", "en"),
        (2, "totally unique text with plenty of its own words here", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r["doc_id"]: (r["n_tokens_before"], r["n_tokens_after"], r["text"])
        for r in scrub_duplicated_spans(df, k=8, min_docs=2).collect()
    }
    # the shared passage disappears from both carriers
    for did in (0, 1):
        assert "dup0" not in out[did][2] and "dup9" not in out[did][2]
        assert out[did][1] < out[did][0]
    assert out[0][2].startswith("alpha beta") and out[0][2].endswith("gamma delta")
    # the clean doc passes through intact (modulo whitespace normalization)
    assert out[2][2] == rows[2][1]
    assert out[2][0] == out[2][1]
    # non-text columns survive
    assert set(
        scrub_duplicated_spans(df, k=8, min_docs=2).columns
    ) == {"doc_id", "lang", "n_tokens_before", "n_tokens_after", "text"}


def test_scrub_counts_match_span_table(spark):
    from osmgraphing_spark.operators.spans import (
        duplicated_spans,
        scrub_duplicated_spans,
    )

    shared = " ".join(f"x{i}" for i in range(12))
    df = spark.createDataFrame(
        [(0, f"{shared} tail words here"), (1, f"head {shared}")],
        "doc_id long, text string",
    )
    spans = {
        (r["doc_id"]): (r["start_tok"], r["end_tok"])
        for r in duplicated_spans(df, k=8, min_docs=2).collect()
    }
    out = {
        r["doc_id"]: (r["n_tokens_before"], r["n_tokens_after"])
        for r in scrub_duplicated_spans(df, k=8, min_docs=2).collect()
    }
    for did, (s, e) in spans.items():
        before, after = out[did]
        assert before - after == e - s + 1


def _winnow_py(text, k, w):
    import hashlib

    toks = text.strip().split()
    if len(toks) < k:
        return set()
    fps = [
        (i + 1, hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest())
        for i in range(len(toks) - k + 1)
    ]
    sel = set()
    for i in range(len(fps)):
        win = fps[i : i + w]
        mfp = min(fp for _, fp in win)
        pos = max(p for p, fp in win if fp == mfp)  # rightmost min
        sel.add((pos, mfp))
    return sel


def test_winnowing_matches_mirror_and_density(spark):
    import random

    from osmgraphing_spark.operators.spans import (
        window_fingerprints,
        winnowed_fingerprints,
    )

    rng = random.Random(79)
    rows = [
        (i, " ".join(f"t{rng.randrange(40)}" for _ in range(rng.randrange(10, 60))))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    k, w = 5, 4
    got = {
        (r["doc_id"], r["pos"], r["fp"])
        for r in winnowed_fingerprints(df, k=k, w=w).collect()
    }
    want = {
        (d, p, fp) for d, t in rows for p, fp in _winnow_py(t, k, w)
    }
    assert got == want
    raw = window_fingerprints(df, k=k).count()
    assert len(got) < raw  # density actually drops


def test_winnowing_guarantee_shared_substring(spark):
    from osmgraphing_spark.operators.spans import winnowed_fingerprints

    k, w = 5, 4
    shared = " ".join(f"s{i}" for i in range(k + w - 1))  # exactly k+w-1
    df = spark.createDataFrame(
        [
            (0, "aa bb cc " + shared + " dd ee"),
            (1, "xx " + shared + " yy zz qq rr"),
        ],
        "doc_id long, text string",
    )
    sel = winnowed_fingerprints(df, k=k, w=w)
    a = {r["fp"] for r in sel.where("doc_id = 0").collect()}
    b = {r["fp"] for r in sel.where("doc_id = 1").collect()}
    assert a & b  # at least one shared fingerprint survives winnowing


def test_winnowed_span_dedup_finds_long_passage(spark):
    from osmgraphing_spark.operators.spans import duplicated_spans

    k, w = 8, 4
    n_shared = 20  # >= k + w - 1 = 11: the winnowing guarantee applies
    shared = " ".join(f"p{i}" for i in range(n_shared))
    pre0, pre1 = "a0 a1 a2", "b0 b1 b2 b3 b4"
    df = spark.createDataFrame(
        [
            (0, f"{pre0} {shared} c0 c1"),
            (1, f"{pre1} {shared} d0 d1 d2"),
            (2, "nothing in common with the others at all here ok"),
        ],
        "doc_id long, text string",
    )
    spans = {
        r["doc_id"]: (r["start_tok"], r["end_tok"])
        for r in duplicated_spans(df, k=k, min_docs=2, winnow_w=w).collect()
    }
    assert set(spans) == {0, 1}
    # doc 0: passage occupies tokens [4, 23]; selected windows must sit
    # inside it (start >= 4, end <= 23)
    s0, e0 = spans[0]
    assert 4 <= s0 <= 4 + (w - 1)          # first selected window near start
    assert 23 - (w - 1) <= e0 <= 23        # last coverage near the end
    s1, e1 = spans[1]
    assert 6 <= s1 <= 6 + (w - 1) and 25 - (w - 1) <= e1 <= 25
