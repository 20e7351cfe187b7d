"""Exact substring (span-level) deduplication over ``documents``.

The dedup family in ``operators/dedup`` decides duplicate-or-not per whole
document (the reference's build-time edge dedup discipline,
/root/reference/src/network/graph/building.rs:503-573, lifted to docs).
Web-scale training corpora also need the finer tier: the SAME k-token
passage pasted into otherwise-different documents (license boilerplate,
vendored code, quoted posts). This module flags every maximal duplicated
span, the "dedup repeated substrings, not documents" pass of production
LLM-data pipelines.

Pipeline (all built-in column expressions — JVM-side, codegen):

1. tokenize each doc (whitespace), emit one fingerprint per k-token
   sliding window: ``md5(concat_ws(' ', tokens[i .. i+k-1]))`` — md5 is
   the portable hash, so a DuckDB SQL oracle reproduces every value.
2. groupBy fingerprint → document frequency; keep fingerprints shared by
   ``>= min_docs`` distinct docs (map-side combine bounds hot keys).
3. join hits back, merge runs of consecutive window positions per doc
   into maximal spans (a window over only the *duplicated* windows).

Scale notes: step 1 explodes to O(total tokens) rows — the same tier as
n-gram shingling, and the scan is a single pass fused with the split. The
fingerprint groupBy is the only corpus-sized shuffle. Boilerplate that
appears in millions of docs is the skew point: ``max_df`` caps the
document frequency a fingerprint may have before the hit join (same role
as dedup.jaccard_pairs' max_df) — spans above the cap are better handled
by the global-boilerplate path (operators/termstats). The run-merge
window shuffles ONLY the duplicated windows (post-join survivors), a tiny
fraction of the corpus, partitioned by doc — no giant per-key state.

Removal policy (which copy survives, whether to cut or keep the span) is
a downstream decision over this table; the operator is deliberately
side-effect-free, like dedup.exact_duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def window_fingerprints(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, pos long, fp string): one md5 fingerprint per k-token
    sliding window, pos = 1-based token index of the window start. Docs
    shorter than k tokens emit nothing (they are whole-doc dedup's job)."""
    if k < 2:
        raise ValueError(f"window k must be >= 2, got {k}")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks")).where(
        F.size("toks") >= k
    )
    # per-index slice+join, NOT the functions.text.sliding_ngrams
    # zip_with chain: the chain wins 4.9× at n=3 (shingles) but rebuilds
    # progressively longer strings once per extra token, so by k=8 it is
    # measurably SLOWER (A/B at sf0.1: 0.83 s here vs 0.95 s chain, warm)
    wins = F.transform(
        F.sequence(F.lit(1), F.size("toks") - k + 1),
        lambda i: F.struct(
            i.cast("long").alias("pos"),
            F.md5(F.concat_ws(" ", F.slice(F.col("toks"), i, k))).alias("fp"),
        ),
    )
    return base.select("doc_id", F.explode(wins).alias("w")).select(
        "doc_id", F.col("w.pos").alias("pos"), F.col("w.fp").alias("fp")
    )


def duplicated_spans(
    docs: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    winnow_w: int | None = None,
) -> DataFrame:
    """Maximal duplicated spans → (doc_id, start_tok, end_tok, n_windows,
    max_docs): token range [start_tok, end_tok] (1-based, inclusive) is
    covered by k-token windows each shared with >= min_docs distinct docs;
    n_windows = windows merged into the span, max_docs = the widest
    sharing count among them. Windows whose token coverage overlaps or
    touches (start gap <= merge gap) merge into one maximal span.
    ``max_df`` (document-frequency cap) drops ubiquitous-boilerplate
    fingerprints before the hit join.

    ``winnow_w``: the SCALE path — build the index from
    `winnowed_fingerprints` instead of every k-gram, shrinking the
    fingerprint groupBy/join volume to ~2/(w+1) of the raw stream. The
    detection guarantee weakens from ≥ k tokens to ≥ k + w − 1 tokens
    (winnowing's bound), the run-merge gap widens to k + w − 1
    (selected positions may sit up to w−1 apart inside one duplicated
    region), and span boundaries are the SELECTED windows' coverage (a
    shared region's first/last few tokens may fall outside); n_windows
    counts selected fingerprints only."""
    if winnow_w is not None:
        wf = winnowed_fingerprints(
            docs, k=k, w=winnow_w, id_col=id_col, text_col=text_col
        )
        gap = k + winnow_w - 1
    else:
        wf = window_fingerprints(docs, k=k, id_col=id_col, text_col=text_col)
        gap = k
    dup = (
        wf.groupBy("fp")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )
    if max_df is not None:
        dup = dup.where(F.col("n_docs") <= max_df)
    hits = wf.join(dup, "fp").select("doc_id", "pos", "n_docs")

    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = hits.withColumn(
        "brk",
        F.when(F.col("pos") - F.lag("pos").over(w) <= gap, F.lit(0)).otherwise(F.lit(1)),
    ).withColumn(
        "run",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        runs.groupBy("doc_id", "run")
        .agg(
            F.min("pos").alias("start_tok"),
            (F.max("pos") + F.lit(k - 1)).cast("long").alias("end_tok"),
            F.count("*").alias("n_windows"),
            F.max("n_docs").alias("max_docs"),
        )
        .select("doc_id", "start_tok", "end_tok", "n_windows", "max_docs")
    )


def span_dedup_stats(spans: DataFrame, docs: DataFrame, k: int = 8) -> DataFrame:
    """Per-doc summary → (doc_id, dup_tokens, total_tokens, dup_frac):
    how much of each doc is inside duplicated spans — the per-doc signal a
    keep/drop/trim policy thresholds on. Docs with no duplicated span get
    dup_tokens = 0. One corpus scan + a broadcastable-or-shuffle join on
    doc_id against the (small) span table."""
    per_doc = spans.groupBy("doc_id").agg(
        F.sum(F.col("end_tok") - F.col("start_tok") + 1).alias("dup_tokens")
    )
    totals = docs.select(
        F.col("doc_id"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("total_tokens"),
    )
    return (
        totals.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
            "total_tokens",
            F.round(
                F.coalesce(F.col("dup_tokens"), F.lit(0)) / F.col("total_tokens"), 6
            ).alias("dup_frac"),
        )
    )


def scrub_duplicated_spans(
    docs: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The REMOVAL counterpart of `duplicated_spans` (RefinedWeb-style
    boilerplate scrubbing): → the input docs with every duplicated span's
    tokens cut out of ``text_col``, plus (n_tokens_before,
    n_tokens_after). Documents with no duplicated span pass through with
    their text re-joined on single spaces (the tokenizer's whitespace
    normalization — the only change for clean docs).

    Scale contract (100 TB): span detection is `duplicated_spans`
    unchanged; removal joins each doc to ITS OWN span list (bounded by
    doc length), then one pure higher-order filter drops tokens whose
    1-based index falls inside any span — row-local, no UDF, no extra
    corpus shuffle beyond the detection join."""
    spans = duplicated_spans(
        docs, k=k, min_docs=min_docs, max_df=max_df,
        id_col=id_col, text_col=text_col,
    )
    ranges = spans.groupBy(F.col("doc_id").alias(id_col)).agg(
        F.collect_list(F.struct("start_tok", "end_tok")).alias("_spans")
    )
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    covered = lambda tok, i: F.exists(  # noqa: E731 — HOF lambda pair
        F.col("_spans"),
        lambda r: (i + 1 >= r["start_tok"]) & (i + 1 <= r["end_tok"]),
    )
    kept = F.filter(toks, lambda tok, i: ~covered(tok, i))
    out_cols = [c for c in docs.columns if c != text_col]
    return (
        docs.join(ranges, id_col, "left")
        .withColumn("_spans", F.coalesce(F.col("_spans"), F.array()))
        .select(
            *out_cols,
            F.size(toks).alias("n_tokens_before"),
            F.size(kept).alias("n_tokens_after"),
            F.array_join(kept, " ").alias(text_col),
        )
    )


def winnowed_fingerprints(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): from each window of ``w``
    consecutive k-gram hashes keep the MINIMUM (ties → rightmost, the
    paper's robust variant), dedup per document → (doc_id, pos, fp).

    Guarantee: any shared substring of ≥ k + w − 1 tokens yields at
    least one shared selected fingerprint, while expected density drops
    to 2/(w+1) of the raw k-gram stream — the principled way to shrink
    the span-dedup index ~w/2× without losing long matches (plain
    sampling has no such guarantee).

    Scale contract (100 TB): the raw hash stream never leaves the row —
    selection is a per-doc WINDOW MIN over a w-row frame (partitions
    bounded by doc length), then a row-local distinct. Index volume into
    the downstream groupBy/join drops by the density factor; everything
    else in `duplicated_spans` composes unchanged on the winnowed
    table. Hash order is md5-lexicographic — identical in any engine,
    so the selected set is value-checkable."""
    if w < 1:
        raise ValueError(f"winnow window w must be >= 1, got {w}")
    raw = window_fingerprints(docs, k=k, id_col=id_col, text_col=text_col)
    frame = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, w - 1)
    )
    # rightmost minimum of the window: max pos among rows achieving the
    # min fp — encode as min(struct(fp, -pos)) then flip
    sel = raw.withColumn(
        "_m",
        F.min(F.struct(F.col("fp"), (-F.col("pos")).alias("np"))).over(frame),
    ).select(
        "doc_id",
        (-F.col("_m.np")).alias("pos"),
        F.col("_m.fp").alias("fp"),
    )
    return sel.distinct()
