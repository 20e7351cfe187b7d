"""DSIR importance resampling pinned against a pure-Python mirror of the
smoothed-LM log ratios and the md5-Gumbel race."""

from __future__ import annotations

import hashlib
import math
import random
import re

import pytest

from osmgraphing_spark.operators import dsir

K = 0.5


def _toks(text):
    # F.split(lower(trim(text)), r"\s+") semantics: empty text -> [""]
    return re.split(r"\s+", text.strip().lower())


def _log_weights_py(raw_rows, target_rows, k=K):
    t_cnt, r_cnt = {}, {}
    for _, text in target_rows:
        for t in _toks(text):
            t_cnt[t] = t_cnt.get(t, 0) + 1
    for _, text in raw_rows:
        for t in _toks(text):
            r_cnt[t] = r_cnt.get(t, 0) + 1
    v = len(set(t_cnt) | set(r_cnt))
    t_total, r_total = sum(t_cnt.values()), sum(r_cnt.values())
    out = {}
    for did, text in raw_rows:
        toks = _toks(text)
        lr = 0.0
        for t in toks:
            lr += math.log((t_cnt.get(t, 0) + k) / (t_total + k * v))
            lr -= math.log((r_cnt[t] + k) / (r_total + k * v))
        out[did] = (len(toks), round(lr, 6))
    return out


def _gumbel_py(did, lr6):
    u48 = int(hashlib.md5(str(did).encode()).hexdigest()[:12], 16)
    u = (u48 + 0.5) / float(1 << 48)
    return round(lr6 - math.log(-math.log(u)), 6)


@pytest.fixture(scope="module")
def corpora(spark):
    rng = random.Random(23)
    targety = ["spark", "shuffle", "join", "plan", "executor"]
    other = ["apple", "river", "stone", "cloud", "light", "zebra"]
    raw = []
    for i in range(40):
        vocab = targety if i % 3 == 0 else other
        raw.append(
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(4, 12))))
        )
    target = [
        (100 + j, " ".join(rng.choice(targety) for _ in range(8))) for j in range(6)
    ]
    raw_df = spark.createDataFrame(raw, "doc_id long, text string")
    tgt_df = spark.createDataFrame(target, "doc_id long, text string")
    return raw, target, raw_df, tgt_df


def test_log_weights_match_mirror(spark, corpora):
    raw, target, raw_df, tgt_df = corpora
    got = {
        r["id"]: (r["n_tokens"], r["log_ratio"])
        for r in dsir.dsir_log_weights(raw_df, tgt_df, k=K).collect()
    }
    want = _log_weights_py(raw, target)
    assert set(got) == set(want)
    for did in want:
        assert got[did][0] == want[did][0]
        assert abs(got[did][1] - want[did][1]) < 2e-6, did
    # docs written in the target vocabulary must outscore the others
    t_mean = sum(want[d][1] for d in want if d % 3 == 0) / len(
        [d for d in want if d % 3 == 0]
    )
    o_mean = sum(want[d][1] for d in want if d % 3) / len(
        [d for d in want if d % 3]
    )
    assert t_mean > o_mean


def test_sample_is_gumbel_topn(spark, corpora):
    raw, target, raw_df, tgt_df = corpora
    n = 10
    got = [
        (r["id"], r["gumbel"])
        for r in dsir.dsir_sample(raw_df, tgt_df, n=n, k=K).collect()
    ]
    weights = _log_weights_py(raw, target)
    ranked = sorted(
        ((did, _gumbel_py(did, lr)) for did, (_, lr) in weights.items()),
        key=lambda t: (-t[1], hashlib.md5(str(t[0]).encode()).hexdigest()),
    )
    assert [d for d, _ in got] == [d for d, _ in ranked[:n]]
    for (gd, gg), (wd, wg) in zip(got, ranked[:n]):
        assert abs(gg - wg) < 2e-6

    # resampling must skew toward the target-vocabulary documents
    frac_target = sum(1 for d, _ in got if d % 3 == 0) / n
    assert frac_target >= 0.7


def test_sample_n_validation(spark, corpora):
    _, _, raw_df, tgt_df = corpora
    with pytest.raises(ValueError):
        dsir.dsir_sample(raw_df, tgt_df, n=0)
