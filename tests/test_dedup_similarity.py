"""Unit tests for the training-data operators: dedup suite, similarity
search, text functions, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmgraphing_spark.functions import multimodal as mm
from osmgraphing_spark.functions import text as X
from osmgraphing_spark.operators import dedup as dd
from osmgraphing_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the lazy dog", "en"),     # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat", "en"),     # near dup of 0
        (3, "der schnelle braune fuchs springt und ist nicht faul", "de"),
        (4, "completely unrelated text about spark engines and data", "en"),
        (5, "", "en"),
        (6, "une phrase pour le test est dans la ligne", "fr"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_duplicates(spark, docs):
    dups = dd.exact_duplicates(docs).collect()
    assert len(dups) == 1
    assert dups[0]["keep_id"] == 0 and dups[0]["n_copies"] == 2
    kept = dd.drop_exact_duplicates(docs)
    assert kept.count() == 6
    assert kept.where(F.col("doc_id") == 1).count() == 0


def test_shingles_short_doc_empty(spark):
    d = spark.createDataFrame([(0, "one two"), (1, "a b c d")], "doc_id long, text string")
    sh = dd.shingles(d, n=3).collect()
    ids = {r["id"] for r in sh}
    assert ids == {1}  # doc 0 has < 3 tokens → no shingles
    assert {r["shingle"] for r in sh} == {"a b c", "b c d"}


def test_jaccard_pairs_finds_near_dup(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in dd.jaccard_pairs(docs, 0.5).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert all(a in (0, 1, 2) and b in (0, 1, 2) for a, b in pairs)


def test_minhash_lsh_agrees_with_jaccard(spark, docs):
    """LSH candidates must include every high-Jaccard pair (recall side of
    the s-curve) on this tiny corpus."""
    true_pairs = {
        (r["id_a"], r["id_b"]) for r in dd.jaccard_pairs(docs, 0.8).collect()
    }
    cand = {(r["id_a"], r["id_b"]) for r in dd.lsh_candidate_pairs(docs, 16, 4).collect()}
    assert true_pairs <= cand


def test_simhash_exact_dup_distance_zero(spark, docs):
    sigs = {r["id"]: r["simhash"] for r in dd.simhash64(docs).collect()}
    assert sigs[0] == sigs[1]
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in dd.simhash_near_pairs(docs, 10).collect()}
    assert pairs.get((0, 1)) == 0


def test_text_functions(spark, docs):
    out = docs.select(
        "doc_id",
        X.token_count(F.col("text")).alias("n"),
        X.lang_id(F.col("text")).alias("lg"),
        X.quality_score(F.col("text")).alias("q"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["n"] == 9
    assert by_id[5]["n"] == 0
    assert by_id[0]["lg"] == "en"
    assert by_id[3]["lg"] == "de"
    assert by_id[6]["lg"] == "fr"
    assert by_id[5]["lg"] == "unknown"
    assert 0.0 <= by_id[0]["q"] <= 1.0


def _random_vectors(spark, n=60, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    rows = [(i, mat[i].tolist(), 0) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int"),
        mat,
    )


def test_brute_force_topk_matches_numpy(spark):
    df, mat = _random_vectors(spark)
    queries = df.where(F.col("vec_id") < 3)
    got = sim.brute_force_topk(df, queries, k=4).collect()
    m = mat.astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = m @ m.T
    for q in range(3):
        order = [
            i for i in np.lexsort((np.arange(len(m)), -cos[q])) if i != q
        ][:4]
        got_q = sorted(
            [r for r in got if r["query_id"] == q], key=lambda r: r["rk"]
        )
        assert [r["neighbor_id"] for r in got_q] == order


def test_ann_recall_reasonable(spark):
    df, mat = _random_vectors(spark, n=120, dim=16)
    queries = df.where(F.col("vec_id") < 10)
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.brute_force_topk(df, queries, k=3).collect()
    }
    ann = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.ann_topk(df, queries, dim=16, k=3, n_planes=6, n_tables=8).collect()
    }
    recall = len(brute & ann) / len(brute)
    assert recall >= 0.5, f"ANN recall too low: {recall}"


def test_ivf_topk_recall_and_shape(spark):
    """Portable IVF search: recall vs brute force with generous probing,
    and every hit must come from a probed cell (subset property)."""
    df, mat = _random_vectors(spark, n=120, dim=16)
    queries = df.where(F.col("vec_id") < 10)
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.brute_force_topk(df, queries, k=3).collect()
    }
    got = sim.ivf_topk_portable(
        df, queries, dim=16, k=3, n_cells=6, nprobe=4
    ).collect()
    ivf = {(r["query_id"], r["neighbor_id"]) for r in got}
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # per-query ranks are 1..k' without gaps and scores non-increasing
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
        assert all(a["score"] >= b["score"] for a, b in zip(rows, rows[1:]))


def test_ivf_assign_covers_all(spark):
    df, _ = _random_vectors(spark, n=80, dim=8)
    assigned, centroids = sim.ivf_assign(df, n_cells=4)
    rows = assigned.collect()
    assert len(rows) == 80
    assert {r["cell"] for r in rows} <= set(range(4))
    assert centroids.shape == (4, 8)


def test_multimodal_image_features(spark):
    media = mm.synth_media(spark, n=12)
    feats = mm.image_features(media, out_w=4, out_h=4).collect()
    assert len(feats) == 4  # every 3rd row is an image
    for r in feats:
        assert len(r["feature"]) == 16
    # deterministic: same input → same features
    again = mm.image_features(mm.synth_media(spark, n=12), out_w=4, out_h=4).collect()
    assert sorted((r["media_id"], tuple(r["feature"])) for r in feats) == sorted(
        (r["media_id"], tuple(r["feature"])) for r in again
    )


def test_multimodal_strict_mode_raises(spark):
    # a non-PPM image payload (PNG magic) has no lib-free decode: strict
    # mode must raise instead of silently faking
    media = spark.createDataFrame(
        [(0, "image", bytearray(b"\x89PNG----"), {
            "width": 4, "height": 4, "channels": 3, "sample_rate": None,
            "n_frames": None, "format": "png"})],
        mm.MEDIA_SCHEMA,
    )
    mm.STRICT = True
    try:
        with pytest.raises(Exception):
            mm.image_features(media).collect()
    finally:
        mm.STRICT = False


def test_ppm_roundtrip_exact():
    import numpy as np

    img = (np.arange(5 * 7 * 3, dtype=np.uint8) % 251).reshape(5, 7, 3)
    assert (mm._decode_ppm(mm.encode_ppm(img)) == img).all()
    # comments + multi-whitespace headers parse too
    hdr = b"P6\n# a comment\n7  5\n255\n" + img.tobytes()
    assert (mm._decode_ppm(hdr) == img).all()


def test_image_features_real_ppm_values(spark):
    """Decode is REAL for PPM: features equal the numpy-computed channel
    means of the known gradient image — not a hash-fake."""
    import numpy as np

    media = mm.synth_media(spark, n=12)
    feats = {r["media_id"]: r["feature"] for r in
             mm.image_features(media, out_w=4, out_h=4).collect()}
    i = 0  # media_id 0 is an image
    w, h = 16 + (i % 4) * 8, 16 + (i % 3) * 8
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(xx * (i + 1)) % 256, (yy * (i + 2)) % 256, (xx + yy + i) % 256],
        axis=-1,
    ).astype(np.uint8)
    small = mm._resize_impl(img, 4, 4)
    expect = small.mean(axis=2).astype(np.float32).ravel()
    assert np.allclose(feats[0], expect)


def test_wav_roundtrip_and_audio_features(spark):
    import numpy as np

    x = np.sin(2 * np.pi * 440.0 * np.arange(4000) / 16000)
    dec, rate = mm._decode_audio_impl(mm.encode_wav(x, 16000))
    assert rate == 16000
    assert np.allclose(dec[:, 0], x, atol=1e-4)  # PCM16 quantization

    media = mm.synth_media(spark, n=12)
    rows = {r["media_id"]: r for r in mm.audio_features(media).collect()}
    assert set(rows) == {1, 4, 7, 10}  # every 3rd row starting at 1
    for mid, r in rows.items():
        # pure sine: rms = 1/sqrt(2), duration 250 ms
        assert abs(r["rms"] - 1 / np.sqrt(2)) < 1e-3
        assert abs(r["duration_s"] - 0.25) < 1e-9
    # zcr rises with frequency (freq = 110 * (1 + id % 8))
    assert rows[1]["zcr"] < rows[10]["zcr"]


def test_frame_sample(spark):
    media = mm.synth_media(spark, n=9)
    frames = mm.frame_sample(media, every_n=25).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    for mid, idxs in by_media.items():
        assert idxs == sorted(idxs)
        assert idxs[0] == 0 and all(i % 25 == 0 for i in idxs)


def test_quantize_np_matches_spark_round_expression(spark):
    """The Arrow fast path (_quantize_np) must agree with the Spark
    column-expression formulation (_quantized: round(x*1024, 0) HALF_UP)
    bit-for-bit — including .5 ties (away from zero, where np.rint would
    round to even) and negatives. This equivalence is what keeps the
    DuckDB oracle value-checking the whole portable-LSH/IVF path after the
    bucketing moved to a vectorized matmul."""
    vals = np.array(
        [0.0, 0.5 / 1024, -0.5 / 1024, 1.5 / 1024, -1.5 / 1024,
         2.5 / 1024, -2.5 / 1024, 0.25, -0.25, 0.999, -0.999, 1.0, -1.0],
        dtype=np.float32,
    )
    df = spark.createDataFrame(
        [(0, [float(v) for v in vals])], "vec_id long, embedding array<float>"
    )
    expr = df.select(sim._quantized(F.col("embedding")).alias("q")).collect()[0]["q"]
    fast = sim._quantize_np(vals.reshape(1, -1))[0]
    assert list(expr) == [int(x) for x in fast]


def test_portable_bucket_ids_one_scan_per_input(spark):
    """Bucketing for all hash tables comes out of ONE pass over the
    vectors (one mapInPandas), not an n_tables-way union of scans."""
    df, _ = _random_vectors(spark, n=40, dim=8)
    planes = sim.int_hyperplanes(8, n_planes=4, n_tables=3)
    b = sim.portable_bucket_ids(df, planes)
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1, plan
    rows = b.collect()
    assert len(rows) == 40 * 3
    assert {r["table"] for r in rows} == {0, 1, 2}


def test_near_dup_pairs_subset_of_brute_force(spark):
    """Every reported near-dup pair must appear in the brute-force pair
    set at the same threshold with the same score (LSH only loses pairs,
    never invents or mis-scores them), and recall should be substantial
    with a recall-leaning table count."""
    df, mat = _random_vectors(spark, n=150, dim=16)
    got = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in sim.near_dup_pairs(
            df, dim=16, threshold=0.5, n_planes=3, n_tables=10
        ).collect()
    }
    m = mat.astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = np.round(m @ m.T, 6)
    brute = {
        (a, b): cos[a, b]
        for a in range(len(m))
        for b in range(a + 1, len(m))
        if cos[a, b] >= 0.5
    }
    assert brute, "test corpus must contain qualifying pairs"
    for pair, score in got.items():
        assert pair in brute
        assert abs(score - brute[pair]) < 1e-9
    recall = len(got) / len(brute)
    assert recall >= 0.5, f"near-dup recall too low: {recall}"


def test_near_dup_pairs_max_bucket_prunes(spark):
    """max_bucket only ever removes pairs (the hot-bucket guard), and the
    survivors keep identical scores."""
    df, _ = _random_vectors(spark, n=120, dim=16)
    full = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in sim.near_dup_pairs(
            df, dim=16, threshold=0.4, n_planes=3, n_tables=6
        ).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in sim.near_dup_pairs(
            df, dim=16, threshold=0.4, n_planes=3, n_tables=6, max_bucket=20
        ).collect()
    }
    assert set(capped) <= set(full)
    for pair, score in capped.items():
        assert score == full[pair]


def test_dup_clusters_transitive(spark):
    """A≈B, B≈C chain must land in ONE cluster labeled min(doc id), even
    when jaccard(A, C) is below the threshold (transitivity via CC over the
    verified pair graph); unrelated docs never appear in the output."""
    rows = [
        (10, "alpha beta gamma delta epsilon zeta eta theta"),
        (11, "alpha beta gamma delta epsilon zeta eta iota"),     # ≈ 10
        (12, "alpha beta gamma delta epsilon zeta kappa iota"),   # ≈ 11, farther from 10
        (13, "totally different words about engines and planes"),
        (14, "alpha beta gamma delta epsilon zeta eta theta"),    # exact dup of 10
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cl = {r["id"]: r["cluster"] for r in
          dd.dup_clusters(docs, threshold=0.5, num_hashes=16, bands=8).collect()}
    assert cl.get(10) == 10 and cl.get(14) == 10 and cl.get(11) == 10
    assert 13 not in cl
    # chain member 12 joins via 11 iff its pair verified; with n=3 shingles
    # jaccard(11,12) is high enough at τ=0.5
    assert cl.get(12) == 10


def test_drop_near_duplicates_keeps_min_and_singletons(spark):
    rows = [
        (20, "one two three four five six seven eight nine ten"),
        (21, "one two three four five six seven eight nine eleven"),  # ≈ 20
        (22, "completely different content that stands alone here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(
        r["doc_id"]
        for r in dd.drop_near_duplicates(
            docs, threshold=0.5, num_hashes=16, bands=8
        ).collect()
    )
    assert kept == [20, 22]


def test_keep_best_per_cluster(spark):
    """Quality-aware dedup keeps the HIGHEST-score member per cluster
    (tie: min id), not the min id; singletons pass through untouched."""
    rows = [
        (20, "one two three four five six seven eight nine ten", 10),
        (21, "one two three four five six seven eight nine eleven", 50),  # ≈20, longer
        (22, "completely different content that stands alone here now", 7),
        (23, "one two three four five six seven eight nine ten", 50),     # ≈20, ties 21
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    kept = sorted(
        r["doc_id"]
        for r in dd.keep_best_per_cluster(
            docs, "n_chars", threshold=0.5, num_hashes=16, bands=8
        ).collect()
    )
    # cluster {20,21,23}: best score 50 shared by 21 and 23 -> min id 21
    assert kept == [21, 22]


def test_components_of_pairs_empty_and_chain(spark):
    from osmgraphing_spark.operators import cc as cc_op

    empty = spark.createDataFrame([], "src long, dst long")
    assert cc_op.components_of_pairs(empty).count() == 0
    pairs = spark.createDataFrame(
        [(5, 9), (9, 7), (2, 3)], "src long, dst long"
    )
    comp = {r["id"]: r["component"] for r in cc_op.components_of_pairs(pairs).collect()}
    assert comp == {5: 5, 9: 5, 7: 5, 2: 2, 3: 2}


def test_containment_catches_inclusion_jaccard_misses(spark):
    short = "alpha beta gamma delta epsilon zeta"
    long_ = short + " " + " ".join(f"filler{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, short), (2, long_), (3, "unrelated words entirely different here")],
        "doc_id long, text string",
    )
    # jaccard misses the inclusion (|A|/|B| ≈ 0.09)
    assert dd.jaccard_pairs(docs, threshold=0.5).count() == 0
    rows = dd.containment_pairs(docs, threshold=0.9).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["containment"] == 1.0 and r["jaccard"] < 0.2


def test_sample_rows_deterministic_and_partition_invariant(spark):
    from osmgraphing_spark.operators import sampling

    df = spark.range(10_000).select(
        F.col("id").alias("src"), (F.col("id") * 7 % 999).alias("dst")
    )
    a = {tuple(r) for r in sampling.sample_edges(df, 0.1).collect()}
    b = {tuple(r) for r in sampling.sample_edges(df.repartition(17), 0.1).collect()}
    assert a == b                      # partitioning-invariant
    assert 0.07 < len(a) / 10_000 < 0.13  # ~fraction
    assert sampling.sample_edges(df, 0.0).count() == 0
    assert sampling.sample_edges(df, 1.0).count() == 10_000


def test_incremental_exact_and_lsh_against(spark, docs):
    """Incremental tiers: new batch {1, 2, 4} vs corpus {0, 3, 5, 6} —
    doc 1 is a verbatim copy of corpus doc 0, doc 2 a near-dup of it,
    doc 4 unrelated."""
    new = docs.where(F.col("doc_id").isin(1, 2, 4))
    corpus = docs.where(~F.col("doc_id").isin(1, 2, 4))

    exact = {(r["id"], r["corpus_id"]) for r in
             dd.exact_duplicates_against(new, corpus).collect()}
    assert exact == {(1, 0)}

    near = {(r["id"], r["corpus_id"]) for r in
            dd.lsh_candidates_against(new, corpus, num_hashes=8, bands=4).collect()}
    assert (1, 0) in near          # exact copy always shares every band
    assert all(i in (1, 2, 4) and c not in (1, 2, 4) for i, c in near)

    survivors = {r["doc_id"] for r in
                 dd.filter_new_against(new, corpus, num_hashes=8, bands=4).collect()}
    assert 1 not in survivors      # verbatim dup gated
    assert 4 in survivors          # unrelated text passes


def test_incremental_agrees_with_symmetric_lsh(spark, docs):
    """new-vs-corpus candidates must be exactly the symmetric LSH pairs
    that cross the split (same hash family, same banding)."""
    new_ids = {1, 2, 4}
    pairs = dd.lsh_candidate_pairs(docs, num_hashes=8, bands=4).collect()
    want = set()
    for r in pairs:
        a, b = r["id_a"], r["id_b"]
        if (a in new_ids) != (b in new_ids):
            n, c = (a, b) if a in new_ids else (b, a)
            want.add((n, c))
    new = docs.where(F.col("doc_id").isin(*new_ids))
    corpus = docs.where(~F.col("doc_id").isin(*new_ids))
    got = {(r["id"], r["corpus_id"]) for r in
           dd.lsh_candidates_against(new, corpus, num_hashes=8, bands=4).collect()}
    assert got == want


def _random_noisy_docs(seed, n_docs=40):
    """Corpus with planted near-dup pairs and heavy stop-shingle overlap
    (every doc shares the same preamble) — the hot-token case prefix
    filtering exists for."""
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(n_docs):
        body = [rng.choice(vocab) for _ in range(rng.randrange(6, 18))]
        rows.append((i, "common start here " + " ".join(body)))
        if rng.random() < 0.3:  # planted near-dup: mutate one token
            mut = list(body)
            mut[rng.randrange(len(mut))] = rng.choice(vocab)
            rows.append((1000 + i, "common start here " + " ".join(mut)))
    return rows


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8, 1.0])
def test_prefix_jaccard_matches_unfiltered(spark, threshold):
    """Prefix filtering is lossless: same pairs and values as the plain
    inverted-index join with no max_df cut, at every threshold."""
    docs = spark.createDataFrame(
        _random_noisy_docs(17), "doc_id long, text string"
    )
    want = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.jaccard_pairs(docs, threshold=threshold, n=2).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.prefix_jaccard_pairs(docs, threshold=threshold, n=2).collect()
    }
    assert got == want
    if threshold <= 0.5:
        assert want  # the corpus must actually exercise the join


def test_prefix_jaccard_exact_dup_and_short_docs(spark):
    d = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "alpha beta gamma delta"),   # exact dup -> jaccard 1.0
            (2, "alpha"),                    # < n tokens: no shingles
            (3, "zeta eta theta iota"),
        ],
        "doc_id long, text string",
    )
    rows = dd.prefix_jaccard_pairs(d, threshold=0.9, n=3).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in rows] == [(0, 1, 1.0)]


def test_contrastive_triplets_vs_brute(spark):
    import itertools
    import math
    import random

    rng = random.Random(53)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(20)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    anchors = df.where(F.col("vec_id") < 5)
    neg_max = 0.3
    got = {
        r["anchor_id"]: (r["pos_id"], r["pos_score"], r["neg_id"], r["neg_score"])
        for r in sim.contrastive_triplets(df, anchors, neg_max=neg_max).collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    vd = dict(vecs)
    for aid in range(5):
        scored = sorted(
            ((round(cos(vd[aid], vd[c]), 6), -c) for c in vd if c != aid),
            reverse=True,
        )
        pos_s, pos_c = scored[0][0], -scored[0][1]
        negs = [(s, c) for s, c in scored if s < neg_max]
        assert aid in got
        gp, gps, gn, gns = got[aid]
        assert (gp, gps) == (pos_c, pos_s)
        assert (gns, -gn) == negs[0]
        assert gns < neg_max <= gps  # the triplet brackets the band


def test_contrastive_triplets_drop_when_no_negative(spark):
    # two identical + one near-identical vector: every candidate scores
    # >= neg_max, so no triplet row for those anchors
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.99, 0.01])],
        "vec_id long, embedding array<double>",
    )
    rows = sim.contrastive_triplets(df, df, neg_max=0.5).collect()
    assert rows == []


def test_components_incremental_equals_full_recompute(spark):
    """Warm-started CC on a grown edge set must be bit-identical to the
    full recompute — including when new edges MERGE two old components and
    when a brand-new component appears."""
    import random

    from osmgraphing_spark.operators import cc

    rng = random.Random(17)
    old = sorted({(rng.randrange(40), rng.randrange(40)) for _ in range(45)})
    added = [(1, 38), (50, 51), (51, 52)]  # bridge + fresh component
    new = sorted(set(old) | set(added))
    odf = spark.createDataFrame(old, "src long, dst long")
    ndf = spark.createDataFrame(new, "src long, dst long")

    prior = cc.components_of_pairs(odf)
    got = {
        (r["id"], r["component"])
        for r in cc.components_incremental(ndf, prior).collect()
    }
    want = {
        (r["id"], r["component"])
        for r in cc.components_of_pairs(ndf).collect()
    }
    assert got == want and len(got) > 0


def test_lsh_max_bucket_guard(spark):
    """max_bucket drops only oversize same-signature buckets: a 6-doc
    identical-text template cluster vanishes under cap 5 (its pairs are the
    exact-dup tier's job), while a genuine 2-doc near-pair survives; with
    no cap the default stays exact and includes both."""
    tmpl = "the same boilerplate template text repeated verbatim here"
    rows = [(i, tmpl) for i in range(6)]
    rows += [(10, "a unique document about graph engines and spark plans"),
             (11, "a unique document about graph engines and spark plan")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in dd.lsh_candidate_pairs(docs, num_hashes=8, bands=4).collect()
    }
    assert (10, 11) in uncapped
    assert sum(1 for a, b in uncapped if a < 6 and b < 6) == 15  # C(6,2)
    capped = {
        (r["id_a"], r["id_b"])
        for r in dd.lsh_candidate_pairs(
            docs, num_hashes=8, bands=4, max_bucket=5
        ).collect()
    }
    assert (10, 11) in capped
    assert not any(a < 6 and b < 6 for a, b in capped)
