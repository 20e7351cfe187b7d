"""Text-analysis functions for training-data pipelines over ``documents``.

All of these are pure built-in column expressions (JVM-side, whole-stage
codegen) — the reference's scalar-function layer re-imagined
(unit conversions and derived metrics,
/root/reference/src/configs/parsing/edges/metrics.rs:93-175,
/root/reference/src/network/graph/building.rs:1130-1318): cheap per-row
derivations declared once and fused into the scan.

Every expression here is written with constructs DuckDB evaluates
identically (regexp_replace / regexp_extract_all / split / length), so the
driver's SQL-oracle comparison can hash-match values exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# language-marker stopwords for the n-gram/lexicon language-ID heuristic;
# the classifier role of the reference's ~200-arm highway-tag matcher
# (/root/reference/src/defaults.rs:613-783): a fixed dictionary driving a
# per-row categorical decision.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "es", "y", "no", "una", "por", "con", "para"],
}


def token_count(text: Column) -> Column:
    """Whitespace tokens (empty string → 0)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: runs of letters, runs of digits, or single
    punctuation — a deterministic proxy for BPE token counts."""
    return F.size(
        F.regexp_extract_all(text, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), F.lit(1))
    ).cast("long")


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation (of .,!?;:)."""
    n = F.length(text)
    p = F.length(F.regexp_replace(text, r"[^.,!?;:]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p.cast("double") / n.cast("double"))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of whitespace tokens that are language-marker stopwords."""
    markers = "|".join(LANG_MARKERS[lang])
    hits = F.size(
        F.regexp_extract_all(
            F.lower(text), F.lit(rf"\b({markers})\b"), F.lit(1)
        )
    )
    total = token_count(text)
    return F.when(total == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / total.cast("double")
    )


def quality_score(text: Column) -> Column:
    """Composite document-quality heuristic in [0,1]:
    length factor × (1 − punctuation excess) × stopword presence."""
    n_tok = token_count(text)
    len_factor = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    stop_ok = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    return F.round(len_factor * punct_ok * (F.lit(0.5) + F.lit(0.5) * stop_ok), 6)


def marker_hits(text: Column, lang: str) -> Column:
    markers = "|".join(LANG_MARKERS[lang])
    return F.size(
        F.regexp_extract_all(F.lower(text), F.lit(rf"\b({markers})\b"), F.lit(1))
    )


def lang_id(text: Column) -> Column:
    """Argmax of per-language marker hits; ties break in fixed language
    order (en, de, fr, es); no hits at all → 'unknown'."""
    langs = list(LANG_MARKERS)
    hits = [marker_hits(text, lg) for lg in langs]
    best = F.greatest(*hits)
    expr = F.lit("unknown")
    for lg, h in reversed(list(zip(langs, hits))):
        expr = F.when((best > 0) & (h == best), F.lit(lg)).otherwise(expr)
    return expr


def doc_fingerprint(text: Column) -> Column:
    """Deterministic 64-bit document fingerprint (content-defined): xxhash64
    of the normalized token stream — the rolling-hash fingerprint role."""
    normalized = F.array_join(F.split(F.lower(F.trim(text)), r"\s+"), " ")
    return F.xxhash64(normalized)


def dup_token_fraction(text: Column) -> Column:
    """Gopher-style repetition signal: fraction of whitespace tokens that
    are repeats of an earlier token (1 − distinct/total; empty text → 0).
    Pure column expression — fused into the scan, no shuffle."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    n = F.size(toks)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(toks)).cast("double") / n.cast("double"),
            6,
        )
    )


# PII patterns restricted to syntax RE2 (DuckDB) and java.util.regex (Spark)
# interpret identically — no lookaround, no backrefs — so the driver's SQL
# oracle reproduces detection and redaction byte-for-byte.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def count_pattern(text: Column, pattern: str) -> Column:
    """Number of non-overlapping matches of ``pattern`` (whole match)."""
    return F.size(
        F.regexp_extract_all(text, F.lit(pattern), F.lit(0))
    ).cast("long")


def count_emails(text: Column) -> Column:
    return count_pattern(text, EMAIL_PATTERN)


def count_ipv4(text: Column) -> Column:
    return count_pattern(text, IPV4_PATTERN)


def redact_pii(text: Column) -> Column:
    """Mask emails then IPv4 addresses with typed placeholder tokens —
    the scrubbing pass a training-data pipeline runs before tokenization.
    Email masking runs first so an address's host part can never be
    half-eaten by the IP pass."""
    no_mail = F.regexp_replace(text, EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(no_mail, IPV4_PATTERN, "<IP>")


def sliding_ngrams(toks: Column, n: int, sep: str = " ") -> Column:
    """All n-token windows of a token ARRAY as array<string>, built from a
    zip_with shift chain: window i = toks[i] ⊕ toks[i+1] ⊕ … ⊕ toks[i+n−1].

    The naive per-index form — transform(sequence(...), i →
    array_join(slice(toks, i, n))) — copies an n-slice per window inside
    an interpreted higher-order lambda: O(len·n) allocations per row, and
    measured 4.9× slower on the sf0.1 shingle scan (2.72 s → 0.56 s
    warm). The shift chain does n−1 interpreted passes total and stays
    entirely JVM-side (no Arrow boundary), so it scales with executors.

    zip_with pads the shorter side with NULL and concat_ws skips NULLs,
    so trailing entries are short grams — the final slice drops them.
    Arrays shorter than n yield an empty array (never a reversed
    sequence)."""
    acc = toks
    for k in range(1, n):
        # length 2e9, NOT INT_MAX: Spark computes start+length in int32,
        # so INT_MAX overflows to an empty slice for any start > 0
        acc = F.zip_with(
            acc,
            F.slice(toks, k + 1, 2_000_000_000),
            lambda a, b: F.concat_ws(sep, a, b),
        )
    return F.when(
        F.size(toks) >= n, F.slice(acc, 1, F.size(toks) - n + 1)
    ).otherwise(F.array().cast("array<string>"))
