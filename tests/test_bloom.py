"""Bloom filter vs a pure-python bit mirror: no false negatives ever,
bounded false positives, cell-exact filter words, merge = union."""

from __future__ import annotations

import hashlib

import pytest

from osmgraphing_spark.operators import bloom

M, K = 4096, 5


def _probes(value, m=M, k=K, salt="bloom:"):
    hx = hashlib.md5((salt + str(value)).encode()).hexdigest()
    h1 = int(hx[:15], 16) % m
    h2 = int(hx[15:30], 16) % m
    return [(h1 + i * h2) % m for i in range(k)]


def _mirror_words(values):
    words = {}
    for v in values:
        for pos in _probes(v):
            w, b = divmod(pos, bloom.WORD_BITS)
            words[w] = words.get(w, 0) | (1 << b)
    return words


def _mirror_contains(words, v):
    return all(
        words.get(pos // bloom.WORD_BITS, 0) >> (pos % bloom.WORD_BITS) & 1
        for pos in _probes(v)
    )


@pytest.fixture(scope="module")
def built(spark):
    members = [f"key{i}" for i in range(300)]
    kdf = spark.createDataFrame([(m,) for m in members], "x string")
    flt = bloom.bloom_build(kdf, "x", M, K)
    return members, flt


def test_filter_words_match_mirror(spark, built):
    members, flt = built
    got = {r["word"]: r["bits"] for r in flt.collect()}
    assert got == _mirror_words(members)


def test_no_false_negatives_and_bounded_fp(spark, built):
    members, flt = built
    probes = members + [f"other{i}" for i in range(500)]
    pdf = spark.createDataFrame([(p,) for p in probes], "x string")
    got = {
        r["x"]: r["might_contain"]
        for r in bloom.bloom_hits(pdf, "x", flt, M, K).collect()
    }
    assert all(got[m] for m in members), "false negative!"
    words = _mirror_words(members)
    for p in probes:
        assert got[p] == _mirror_contains(words, p)
    # fpp sanity: n=300 keys in m=4096 bits, k=5 → expected fp ≈ 2.4 %
    fp = sum(got[f"other{i}"] for i in range(500)) / 500
    assert fp < 0.15


def test_filter_new_drops_exactly_nonflagged(spark, built):
    members, flt = built
    probes = members[:50] + [f"fresh{i}" for i in range(100)]
    pdf = spark.createDataFrame([(p,) for p in probes], "x string")
    new = {r["x"] for r in bloom.bloom_filter_new(pdf, "x", flt, M, K).collect()}
    words = _mirror_words(members)
    want = {p for p in probes if not _mirror_contains(words, p)}
    assert new == want
    assert not (new & set(members[:50]))


def test_merge_equals_build_of_union(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(80)], "x string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(80)], "x string")
    fa = bloom.bloom_build(a, "x", M, K)
    fb = bloom.bloom_build(b, "x", M, K)
    merged = {
        (r["word"], r["bits"]) for r in bloom.bloom_merge(fa, fb).collect()
    }
    union = {
        (r["word"], r["bits"])
        for r in bloom.bloom_build(a.unionByName(b), "x", M, K).collect()
    }
    assert merged == union


def test_bloom_params_sizing():
    m, k = bloom.bloom_params(1000, 0.01)
    assert 9000 <= m <= 10000 and 6 <= k <= 8
    with pytest.raises(ValueError):
        bloom.bloom_params(10, 1.5)
