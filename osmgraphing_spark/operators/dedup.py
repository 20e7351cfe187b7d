"""Deduplication operators for training-data pipelines over ``documents``.

The reference dedups edges by exact key + 1e-6-approx metrics at build time
(/root/reference/src/network/graph/building.rs:503-573); a 100 TB document
pipeline needs the same idea at several strengths:

- exact            — hash-groupBy on the content digest (zero false pos.)
- ngram Jaccard    — word-shingle inverted index → pair join → threshold
- MinHash + LSH    — sketch per doc, band-bucket join → candidate pairs
                     (the scale path: no all-pairs join ever materializes)
- SimHash          — 64-bit near-dup signature, Hamming-bucket join

Scale notes: every operator is shuffle-bounded by the inverted index /
bucket join, never by a cross join. The shingle → doc index is the skew
point (stop-shingles appear in every doc); ``max_df`` drops shingles whose
document frequency exceeds a cap before the pair join — the same
hot-key-removal role salting plays for PageRank hubs.

MinHash uses a *portable* hash (md5 prefix as uint, computable identically
in DuckDB SQL) so the driver's SQL oracle can verify the sketch pipeline
value-for-value, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import EphemeralTruncator


def _materialize(df: DataFrame, tag: str) -> DataFrame:
    """Parquet round-trip for a frame consumed by several downstream scans:
    same reuse as persist() but leaves no executor-storage blocks behind
    (loop-scoped persists leaked blocks across long sessions — ADVICE r1)."""
    return EphemeralTruncator(df.sparkSession, tag).truncate(df)

# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """→ (digest, keep_id, n_copies) for every content group with >1 copy;
    keep_id = min id (deterministic survivor)."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col).alias("id"))
        .groupBy("digest")
        .agg(F.min("id").alias("keep_id"), F.count("*").alias("n_copies"))
        .where(F.col("n_copies") > 1)
    )


def drop_exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    keep = (
        docs.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col).alias(id_col))
        .groupBy("digest")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return docs.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# word n-gram shingles + Jaccard
# ---------------------------------------------------------------------------

def shingles(docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """→ (id, shingle) distinct word-n-gram shingles per document.
    Built entirely from array functions (no UDF): sliding windows from
    the functions.text.sliding_ngrams zip_with shift chain (4.9× the
    per-index transform+slice form this used through round 3). Dedup is
    PER DOCUMENT, so it happens row-locally with ``array_distinct``
    before the explode — zero shuffle (an earlier revision used
    ``.distinct()`` on the exploded stream, which shuffled the entire
    corpus's shingles just to dedup within rows)."""
    from ..functions.text import sliding_ngrams

    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(sliding_ngrams(toks, n))).alias("shingle"),
    )


def _pair_stats(
    docs: DataFrame,
    n: int,
    id_col: str,
    text_col: str,
    max_df: int | None,
    tag: str,
) -> DataFrame:
    """Shared inverted-index machinery for Jaccard AND containment:
    → (id_a, id_b, common, sz_a, sz_b) for every pair sharing ≥1 kept
    shingle, id_a < id_b. Cost is Σ_shingle df² — bounded by ``max_df``
    (drop shingles more frequent than the cap; a pair of near-dups still
    shares many rarer shingles)."""
    sh = _materialize(shingles(docs, n=n, id_col=id_col, text_col=text_col), tag)
    if max_df is not None:
        hot = sh.groupBy("shingle").count().where(F.col("count") > max_df).select("shingle")
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """All document pairs with shingle-set Jaccard ≥ threshold:
    → (id_a, id_b, jaccard) with id_a < id_b. Inverted-index join via
    `_pair_stats` (one scan, one pair aggregate, `max_df` hot-shingle
    cut)."""
    return (
        _pair_stats(docs, n, id_col, text_col, max_df, "jaccard")
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def prefix_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT all-pairs Jaccard join via prefix filtering (Bayardo et al.
    WWW'07 / PPJoin, VLDB'11 problem setting): → (id_a, id_b, jaccard)
    with id_a < id_b and shingle-set Jaccard ≥ ``threshold`` — the SAME
    answer as `jaccard_pairs(max_df=None)` but without ever joining on a
    hot shingle. Lossless: if J(r, s) ≥ t then under ANY global token
    order the first ``|r| - ceil(t*|r|) + 1`` tokens of r and of s share
    at least one token, so joining on rarest-first prefixes misses no
    qualifying pair.

    Scale contract (100 TB): candidate cost is Σ df² over PREFIX
    occurrences only — tokens are ordered rarest-first (global df asc),
    so stop-shingles sit at the tail and almost never enter a prefix;
    the hot-key problem `max_df` papers over in `jaccard_pairs` is
    removed structurally, with zero recall loss. Verification fetches the
    two per-doc sorted shingle arrays (bounded by doc length) for the
    surviving candidates only and intersects row-locally. Size filter
    ceil(t*sz_a) ≤ sz_b prunes before the pair distinct.

    Reference parity: the exact-dedup role of
    /root/reference/src/network/graph/building.rs:503-573 at document
    granularity, threshold semantics per SURVEY §2.6 D3."""
    sh = shingles(docs, n=n, id_col=id_col, text_col=text_col)
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    # per-doc shingle array in global rarest-first (df asc, shingle asc)
    # order; array_sort on (df, shingle) structs gives exactly that.
    per_doc = _materialize(
        sh.join(dfreq, "shingle")
        .groupBy("id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("df"), F.col("shingle")))
            ).alias("ordered")
        )
        .select(
            "id",
            F.transform(F.col("ordered"), lambda s: s["shingle"]).alias("toks"),
            F.size("ordered").alias("sz"),
        ),
        "ppj_docs",
    )
    # prefix length |r| - ceil(t*|r|) + 1 (≥ 1 whenever the doc has tokens)
    plen = F.col("sz") - F.ceil(F.lit(float(threshold)) * F.col("sz")).cast("int") + 1
    prefix = per_doc.select(
        "id", "sz", F.explode(F.slice(F.col("toks"), 1, plen)).alias("tok")
    )
    a = prefix.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"), "tok")
    b = prefix.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"), "tok")
    cands = (
        a.join(b, "tok")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("sz_b") >= F.ceil(F.lit(float(threshold)) * F.col("sz_a")))
            & (F.col("sz_a") >= F.ceil(F.lit(float(threshold)) * F.col("sz_b")))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    docs_a = per_doc.select(
        F.col("id").alias("id_a"), F.col("toks").alias("toks_a"), F.col("sz").alias("sz_a")
    )
    docs_b = per_doc.select(
        F.col("id").alias("id_b"), F.col("toks").alias("toks_b"), F.col("sz").alias("sz_b")
    )
    return (
        cands.join(docs_a, "id_a")
        .join(docs_b, "id_b")
        .withColumn("common", F.size(F.array_intersect("toks_a", "toks_b")))
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

#: Mersenne prime 2^61 - 1: (u + i*v) stays < 2^61 for u, v < 2^56, i < 32,
#: so the double-hash family below never overflows a signed 64-bit int —
#: in Spark OR in the DuckDB oracle, which must reproduce it bit-for-bit.
_MH_PRIME = (1 << 61) - 1


def _portable_hash_pair(col):
    """(u, v): two independent 56-bit slices of ONE md5(value) — the base of
    a Kirsch-Mitzenmacher double-hash family h_i = (u + i*v) mod p. One md5
    per shingle total, vs one per (shingle, hash function): at k=16 hashes
    that is 16x less digest work on the full corpus scan, the dominant
    MinHash cost at 100 TB. Identical in DuckDB via
    CAST(concat('0x', substr(md5(v), ...)) AS BIGINT), so the SQL oracle
    reproduces sketches exactly."""
    h = F.md5(col)
    u = F.conv(F.substring(h, 1, 14), 16, 10).cast("long")
    v = F.conv(F.substring(h, 15, 14), 16, 10).cast("long")
    return u, v


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """→ (id, mh_0 … mh_{k-1}): per-doc minimum of k portable hash functions
    over its shingle set. One md5 + k add-mod-mults per shingle, one shuffle
    (groupBy id), k mins computed map-side in a single pass.

    `shingles_df` lets a caller that also needs the shingle sets (e.g.
    `dup_clusters`' exact-Jaccard verification) scan the corpus ONCE and
    share the materialized (id, shingle) frame."""
    sh = shingles_df if shingles_df is not None else shingles(
        docs, n=n, id_col=id_col, text_col=text_col
    )
    u, v = _portable_hash_pair(F.col("shingle"))
    aggs = [
        F.min((u + F.lit(i) * v) % F.lit(_MH_PRIME)).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def _band_buckets(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """Signature frame → (id, band, bucket): one row per LSH band, bucket =
    md5 over that band's minhash rows; a single projection + explode, no
    re-derivation of the signature plan per band."""
    rows_per_band = num_hashes // bands
    band_structs = []
    for b in range(bands):
        cols = [
            F.col(f"mh_{i}").cast("string")
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        band_structs.append(
            F.struct(
                F.lit(b).alias("band"), F.md5(F.concat_ws("|", *cols)).alias("bucket")
            )
        )
    return sig.select("id", F.explode(F.array(*band_structs)).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingles_df: DataFrame | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash-LSH: docs agreeing on ALL rows of ≥1 band become candidate
    pairs → (id_a, id_b). bands=4 × rows=4 over 16 hashes ⇒ s-curve
    threshold ≈ 0.47^(1/4) ≈ 0.72 Jaccard.

    The signature frame is materialized ONCE (parquet round-trip), then each
    row explodes into its `bands` (band, bucket) keys in a single projection
    — round 1 unioned `bands` re-derivations of the signature plan, which
    re-ran the full corpus scan + shuffle per band (per join side): the
    dominant cost at 100 TB, and pure waste.

    ``max_bucket`` is the self-join's skew guard (the `max_df` analogue of
    the shingle tier): a bucket of B same-signature docs emits B² pairs, so
    one boilerplate-heavy template cluster can dominate the whole job. With
    the cap, buckets larger than ``max_bucket`` are DROPPED — explicitly
    lossy (such clusters are better handled by the exact-duplicate tier,
    which is linear in B) and NOT applied by default, so the oracle-checked
    default stays exact."""
    sig = _materialize(
        minhash_signatures(docs, num_hashes, n, id_col, text_col, shingles_df),
        "lsh_sig",
    )
    all_buckets = _band_buckets(sig, num_hashes, bands)
    if max_bucket is not None:
        big = (
            all_buckets.groupBy("band", "bucket")
            .count()
            .where(F.col("count") > max_bucket)
            .select("band", "bucket")
        )
        all_buckets = all_buckets.join(big, ["band", "bucket"], "left_anti")
    a = all_buckets.select("band", "bucket", F.col("id").alias("id_a"))
    b_ = all_buckets.select("band", "bucket", F.col("id").alias("id_b"))
    return (
        a.join(b_, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


# ---------------------------------------------------------------------------
# incremental dedup: a NEW batch against an existing corpus
# ---------------------------------------------------------------------------
#
# The production shape of dedup at 100 TB is rarely corpus × corpus — it is
# "this week's crawl against everything already ingested". Both tiers below
# join new-side keys against corpus-side keys ONLY, so the quadratic
# corpus-internal term (already paid when the corpus was built) never
# reappears: cost is O(|new| + matching corpus buckets), not O(|corpus|²).


def exact_duplicates_against(
    new_docs: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id, corpus_id): new docs whose text already exists verbatim in
    the corpus; corpus_id = the smallest matching corpus id (deterministic
    witness). One digest groupBy on the corpus side, one hash join."""
    nd = new_docs.select(
        F.md5(F.col(text_col)).alias("digest"), F.col(id_col).alias("id")
    )
    cd = (
        corpus.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col).alias("cid"))
        .groupBy("digest")
        .agg(F.min("cid").alias("corpus_id"))
    )
    return nd.join(cd, "digest").select("id", "corpus_id")


def lsh_candidates_against(
    new_docs: DataFrame,
    corpus: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash-LSH near-dup candidates of the new batch AGAINST the corpus
    → (id, corpus_id): new doc shares ≥1 full band with the corpus doc.
    Signatures use the same portable hash family as `lsh_candidate_pairs`,
    so a persisted corpus signature/bucket table keeps working across
    ingest batches (recompute here is only for self-containedness). Each
    side is scanned once; the join is new-buckets ⨝ corpus-buckets — never
    corpus ⨝ corpus."""
    sig_new = _materialize(
        minhash_signatures(new_docs, num_hashes, n, id_col, text_col), "inc_sig_new"
    )
    sig_cor = _materialize(
        minhash_signatures(corpus, num_hashes, n, id_col, text_col), "inc_sig_cor"
    )
    nb = _band_buckets(sig_new, num_hashes, bands)
    cb = _band_buckets(sig_cor, num_hashes, bands).select(
        "band", "bucket", F.col("id").alias("corpus_id")
    )
    return (
        nb.join(cb, ["band", "bucket"])
        .select("id", "corpus_id")
        .distinct()
    )


def filter_new_against(
    new_docs: DataFrame,
    corpus: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The ingest gate: new docs surviving BOTH tiers (no verbatim copy in
    the corpus, no shared LSH band) — two anti-joins on the id."""
    exact = exact_duplicates_against(new_docs, corpus, id_col, text_col)
    near = lsh_candidates_against(
        new_docs, corpus, num_hashes, bands, n, id_col, text_col
    )
    hits = exact.select("id").unionByName(near.select("id")).distinct()
    return new_docs.join(
        hits.withColumnRenamed("id", id_col), id_col, "left_anti"
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _chunk_spans(n_chunks: int) -> list[tuple[int, int]]:
    """Split the 64 signature bits into n contiguous (start, width) spans,
    widths as even as possible."""
    base, rem = divmod(64, n_chunks)
    spans, s = [], 0
    for i in range(n_chunks):
        w = base + (1 if i < rem else 0)
        spans.append((s, w))
        s += w
    return spans


def _extract_span(hi, lo, start: int, width: int):
    """Bits [start, start+width) of the 64-bit (hi:32 | lo:32) signature —
    every intermediate stays < 2^32, so the SAME arithmetic runs in DuckDB
    (which errors on 64-bit shift overflow) for the SQL oracle."""
    mask = (1 << width) - 1
    if start >= 32:
        return F.shiftright(hi, start - 32).bitwiseAND(F.lit(mask))
    if start + width <= 32:
        return F.shiftright(lo, start).bitwiseAND(F.lit(mask))
    low_w = 32 - start
    low_part = F.shiftright(lo, start).bitwiseAND(F.lit((1 << low_w) - 1))
    high_part = hi.bitwiseAND(F.lit((1 << (width - low_w)) - 1))
    return low_part.bitwiseOR(F.shiftleft(high_part, low_w))


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """→ (id, sig_hi, sig_lo, simhash): 64-bit SimHash over whitespace
    tokens, carried as two 32-bit halves plus the combined long.

    Per-bit majority vote expressed as built-in aggregations: explode
    tokens → *portable* md5-derived 64-bit hash (two 32-bit hex slices —
    reproducible bit-for-bit in DuckDB, so the driver's SQL oracle verifies
    signatures by value) → for each bit b, sum(±1) → sign bit. The 64 sums
    are one groupBy with 64 algebraic aggregates (map-side combinable, one
    shuffle of 64-column partials — no UDF, no per-row Python)."""
    toks = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
        )
        .withColumn("md5", F.md5("tok"))
        .withColumn("h_hi", F.conv(F.substring("md5", 1, 8), 16, 10).cast("long"))
        .withColumn("h_lo", F.conv(F.substring("md5", 9, 8), 16, 10).cast("long"))
    )
    aggs = []
    for b in range(64):
        src, off = ("h_lo", b) if b < 32 else ("h_hi", b - 32)
        aggs.append(
            F.sum(
                F.when(
                    F.shiftright(F.col(src), off).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"b{b}")
        )
    sums = toks.groupBy("id").agg(*aggs)

    def _half(bit_range):
        sig = F.lit(0).cast("long")
        for i, b in enumerate(bit_range):
            sig = sig.bitwiseOR(
                F.when(F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                    F.lit(0).cast("long")
                )
            )
        return sig

    sig_lo = _half(range(32))
    sig_hi = _half(range(32, 64))
    return sums.select(
        "id",
        sig_hi.alias("sig_hi"),
        sig_lo.alias("sig_lo"),
        (F.shiftleft(sig_hi, 32).bitwiseOR(sig_lo)).alias("simhash"),
    )


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup candidates by SimHash: block on ``max_hamming + 1``
    contiguous bit chunks — by pigeonhole ANY pair within Hamming distance
    ≤ max_hamming agrees exactly on ≥1 chunk (round-1 used a fixed 4 chunks,
    silently dropping pairs when max_hamming > 3) — then verify the exact
    Hamming distance on candidates. → (id_a, id_b, hamming).

    Scale note: chunk width is 64/(max_hamming+1) bits; wider max_hamming ⇒
    narrower chunks ⇒ exponentially bigger buckets. Keep max_hamming ≤ 3
    (16-bit chunks) on web-scale corpora; the verify step keeps precision
    exact either way."""
    sig = _materialize(simhash64(docs, id_col, text_col), "simhash")
    return signature_near_pairs(sig, max_hamming)


def signature_near_pairs(sig: DataFrame, max_hamming: int) -> DataFrame:
    """Generic 64-bit-signature near-pair search over (id, sig_hi,
    sig_lo) rows — the pigeonhole chunk blocking + exact-Hamming verify
    that backs `simhash_near_pairs`, factored out so OTHER signature
    families (e.g. perceptual image dHash, functions/multimodal
    .image_near_dups) reuse the identical scale machinery.
    → (id_a, id_b, hamming)."""
    n_chunks = max_hamming + 1
    chunk_structs = [
        F.struct(
            F.lit(c).alias("chunk"),
            _extract_span(F.col("sig_hi"), F.col("sig_lo"), start, width).alias("key"),
        )
        for c, (start, width) in enumerate(_chunk_spans(n_chunks))
    ]
    chunks = sig.select(
        "id", "sig_hi", "sig_lo", F.explode(F.array(*chunk_structs)).alias("ck")
    ).select(
        "id",
        F.col("ck.chunk").alias("chunk"),
        F.col("ck.key").alias("key"),
        "sig_hi",
        "sig_lo",
    )
    a = chunks.select(
        "chunk", "key", F.col("id").alias("id_a"),
        F.col("sig_hi").alias("hi_a"), F.col("sig_lo").alias("lo_a"),
    )
    b = chunks.select(
        "chunk", "key", F.col("id").alias("id_b"),
        F.col("sig_hi").alias("hi_b"), F.col("sig_lo").alias("lo_b"),
    )
    cand = (
        a.join(b, ["chunk", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "hi_a", "lo_a", "hi_b", "lo_b")
        .distinct()
    )
    ham = F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b"))) + F.bit_count(
        F.col("lo_a").bitwiseXOR(F.col("lo_b"))
    )
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Dup clustering — the 100 TB dedup endgame (pairs → clusters → keep-one)
# ---------------------------------------------------------------------------

def verified_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash-LSH candidates verified by EXACT shingle Jaccard ≥ threshold
    → (id_a, id_b, jaccard), id_a < id_b.

    The scale contract: exact Jaccard is computed ONLY for the candidate
    pairs the banding surfaced (|cand| ≪ all-pairs), so the expensive
    verification join is proportional to the near-dup mass, not the corpus
    squared. The (id, shingle) frame is scanned once and shared with the
    signature derivation (`shingles_df` pass-through)."""
    sh = _materialize(shingles(docs, n=n, id_col=id_col, text_col=text_col), "dupc")
    cand = lsh_candidate_pairs(
        docs, num_hashes, bands, n, id_col, text_col, shingles_df=sh
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    common = (
        cand.join(sh.select(F.col("id").alias("id_a"), "shingle"), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), "shingle"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def dup_clusters(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup CLUSTERS: verified LSH pairs → connected components over the
    pair graph → (id, cluster), cluster = min doc id of the group. Only docs
    that belong to a ≥2-member cluster are returned (every other doc is its
    own singleton cluster by definition — at 100 TB that is ~the whole
    corpus, and emitting it would dwarf the actual dedup signal).

    Transitivity is the point: A≈B and B≈C put A,C in one cluster even when
    jaccard(A,C) < threshold — keep-one-per-cluster is the semantics every
    production dedup pipeline (and the near-dup literature) uses, and it is
    what `drop_near_duplicates` enforces."""
    from .cc import components_of_pairs

    pairs = verified_lsh_pairs(docs, threshold, num_hashes, bands, n, id_col, text_col)
    return components_of_pairs(pairs, "id_a", "id_b").select(
        "id", F.col("component").alias("cluster")
    )


def drop_near_duplicates(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep ONE representative (the min doc id) per near-dup cluster; all
    singleton docs pass through. The anti-join is on doc id — the corpus
    rows never shuffle, only the (id, cluster) table does."""
    clusters = dup_clusters(docs, threshold, num_hashes, bands, n, id_col, text_col)
    losers = clusters.where(F.col("id") != F.col("cluster")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def keep_best_per_cluster(
    docs: DataFrame,
    score_col: str,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quality-aware near-dedup: within each near-dup cluster keep the
    single HIGHEST-``score_col`` document (ties: min id); singletons pass
    through. `drop_near_duplicates` keeps the min-id representative —
    cheap but arbitrary; production pipelines usually keep the best
    (longest / highest-quality) copy so dedup never downgrades content.

    Use an integer score (e.g. ``n_chars``) when the keep set must be
    engine-reproducible: float scores can differ in the last ulp across
    engines and flip an argmax; integers cannot.

    Scale: one `dup_clusters` pass (bounded LSH machinery), then two
    algebraic aggregates (per-cluster max score, then min id among the
    tied best) over the (id, cluster, score) rows of the ≥2-member
    clusters only — the corpus never shuffles; the keep decision joins
    back by doc id (left-semi). Works for string doc ids and NULL
    scores (an all-NULL cluster still keeps its min-id member)."""
    clusters = dup_clusters(docs, threshold, num_hashes, bands, n, id_col, text_col)
    member = docs.select(id_col, score_col).join(
        clusters.withColumnRenamed("id", id_col), id_col, "inner"
    )
    # argmax in two algebraic passes over the slim member frame: per-cluster
    # max score (F.max skips NULLs; an all-NULL cluster still keeps a
    # member via eqNullSafe), then min id among the tied best. Works for
    # string doc ids too — no numeric negation trick.
    mx = member.groupBy("cluster").agg(F.max(score_col).alias("_ms"))
    best = (
        member.join(mx, "cluster")
        .where(F.col(score_col).eqNullSafe(F.col("_ms")))
        .groupBy("cluster")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    losers = clusters.select(F.col("id").alias(id_col)).join(
        best, id_col, "left_anti"
    )
    return docs.join(losers, id_col, "left_anti")


def containment_pairs(
    docs: DataFrame,
    threshold: float = 0.9,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Pairs where one doc's shingle set is ≥ threshold CONTAINED in the
    other's: containment(a⊆b) = |A∩B| / |A|. The long-document case
    Jaccard structurally misses — when |B| ≫ |A|, |A∩B|/|A∪B| ≈ |A|/|B|
    → 0 even for verbatim inclusion (a training-data corpus is full of
    quote-and-extend copies). → (id_a, id_b, containment, jaccard),
    id_a < id_b, containment = max of the two directions.

    Same inverted-index join + `max_df` hot-shingle cut as jaccard_pairs
    (shared `_pair_stats`, one scan, one pair aggregate); only the
    threshold predicate differs.
    """
    c = F.col("common").cast("double")
    return (
        _pair_stats(docs, n, id_col, text_col, max_df, "containment")
        .withColumn("containment", F.greatest(c / F.col("sz_a"), c / F.col("sz_b")))
        .where(F.col("containment") >= threshold)
        .select(
            "id_a",
            "id_b",
            F.round("containment", 6).alias("containment"),
            F.round(
                c / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("double"), 6
            ).alias("jaccard"),
        )
    )
