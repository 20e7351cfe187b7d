"""Edge extraction: source-file content → directed reference edges.

The Spark re-expression of the reference's two-pass parse
(ways → proto-edges, /root/reference/src/io/parsing/network/graph/pbf.rs:71-172;
nodes referenced by edges only, pbf.rs:174-199):

1. **per-row invariant** — recompute ``sha2(content, 256)`` and verify it
   equals the sidecar reference hash for every row (fail the job on any
   mismatch, *before* the graph is polluted). The check is FUSED into the
   extraction projection (``assert_true`` guarding the ref-extraction
   expression), so the 100 TB ``content`` column is scanned exactly ONCE —
   hashing and parsing happen in the same stage, and the first corrupt row
   aborts the job from inside it;
2. **vectorized extraction** — ONE Arrow-batched pandas UDF over
   (lang, content) pulls the list of ``(target_stem, weight)`` references
   per file (regex per language; python ``import X  # w=F`` and
   c ``#include "X"``). No per-row Python: the UDF is Series→Series and the
   regex work is pandas ``str.extractall`` — columnar end to end;
3. **explode + resolve** — references resolve to concrete files by
   (repo, stem) first, then by globally-unique stem (cross-repo reference
   edges). Unresolved references are dropped, like the reference drops ways
   whose highway tag is unusable (pbf.rs:96-101).

Output: raw edge table ``(src_key, dst_key, weight)`` with
``key = repo || '::' || path`` — still with duplicates; dedup happens in
``build`` (mirroring the reference, which dedups during finalize,
/root/reference/src/network/graph/building.rs:503-573).

Scale notes: the UDF stage is embarrassingly parallel over input splits
(no shuffle); both resolution joins broadcast when the file-stem dictionary
is small, else they're plain shuffled equi-joins on (repo, stem) — at
10^12-file scale that dictionary is huge, so the join must shuffle, and it
shuffles on a high-cardinality key (no skew: stems are ~unique).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, StringType, StructField, StructType

REF_TYPE = ArrayType(
    StructType(
        [
            StructField("target", StringType()),
            StructField("weight", DoubleType()),
        ]
    )
)

_PY_IMPORT = re.compile(
    r"^\s*import\s+([A-Za-z_][\w.]*)\s*(?:#\s*w=([0-9]+(?:\.[0-9]+)?))?\s*$",
    re.MULTILINE,
)
_C_INCLUDE = re.compile(r'^\s*#include\s+"([^"]+)"\s*(?://\s*w=([0-9]+(?:\.[0-9]+)?))?\s*$', re.MULTILINE)

_LANG_PATTERNS = {"python": _PY_IMPORT, "c": _C_INCLUDE}


def _extract_refs_batch(lang: pd.Series, content: pd.Series) -> pd.Series:
    """Columnar reference extraction for one Arrow batch.

    The regex work (the hot loop) is one vectorized ``str.extractall`` per
    language over the whole batch slice; the residual Python is O(#matches)
    list assembly, not O(rows) parsing.
    """
    import numpy as np

    results: list[list] = [[] for _ in range(len(content))]
    lang_np = lang.to_numpy()
    for lg, pat in _LANG_PATTERNS.items():
        idx = np.flatnonzero(lang_np == lg)
        if len(idx) == 0:
            continue
        sub = content.iloc[idx].reset_index(drop=True)
        matches = sub.str.extractall(pat)  # index: (position-in-sub, match#)
        if matches.empty:
            continue
        matches.columns = ["target", "weight"]
        weights = pd.to_numeric(matches["weight"], errors="coerce").fillna(1.0)
        targets = matches["target"]
        if lg == "c":
            targets = targets.str.replace(r"^.*/", "", regex=True)
            targets = targets.str.replace(r"\.[^.]*$", "", regex=True)
        rows = matches.index.get_level_values(0).to_numpy()
        for pos, tgt, w in zip(rows, targets.to_numpy(), weights.to_numpy()):
            results[idx[pos]].append((tgt, float(w)))
    return pd.Series(results, dtype=object)


extract_refs = F.pandas_udf(_extract_refs_batch, REF_TYPE)


class Sha256MismatchError(RuntimeError):
    pass


def verify_content_hashes(corpus: DataFrame, reference: DataFrame) -> None:
    """Standalone audit variant of the per-row invariant (one EXTRA full
    scan of ``content`` — use only to audit a corpus without extracting;
    ``extract_edges(verify=True)`` fuses the same check into its single
    extraction scan instead). Raises on: hash mismatch, or corpus rows
    missing from the reference table.
    """
    joined = (
        corpus.select(
            "repo",
            "path",
            "commit",
            F.sha2(F.col("content"), 256).alias("engine_sha256"),
        )
        .join(reference, ["repo", "path", "commit"], "left")
        .where(
            F.col("content_sha256").isNull()
            | (F.col("content_sha256") != F.col("engine_sha256"))
        )
    )
    bad = joined.limit(5).collect()
    if bad:
        raise Sha256MismatchError(
            f"content sha256 invariant violated for {len(bad)}+ rows, e.g. "
            + ", ".join(f"{r.repo}/{r.path}" for r in bad)
        )


def stem_of_path(col):
    """'src/b.py' → 'b' (the import-able module stem)."""
    return F.regexp_replace(F.element_at(F.split(col, "/"), -1), r"\.[^.]*$", "")


def vertex_key(repo_col, path_col):
    return F.concat_ws("::", repo_col, path_col)


def extract_edges(
    corpus: DataFrame,
    reference: DataFrame | None = None,
    verify: bool = True,
) -> DataFrame:
    """corpus (repo,path,commit,lang,content) → raw edges (src_key, dst_key, weight).

    With ``verify=True`` and a reference table, the sha256 per-row invariant
    is checked INSIDE the extraction projection: ``assert_true`` guards the
    ref-extraction expression, so hashing and parsing share one scan of the
    (huge) ``content`` column and any mismatch (or row missing from the
    reference) aborts the job at that row. The check fires when the edges
    are materialized (Spark is lazy) — the graph can never be built from a
    corrupted corpus. The reference join is an equi-join on
    (repo, path, commit): unique keys on both sides, no skew.
    """
    parse_src = corpus
    guarded_refs = extract_refs(F.col("lang"), F.col("content"))
    if verify and reference is not None:
        parse_src = corpus.join(
            reference.select(
                "repo", "path", "commit", F.col("content_sha256").alias("_ref_sha")
            ),
            ["repo", "path", "commit"],
            "left",
        )
        chk = F.assert_true(
            F.col("_ref_sha").isNotNull()
            & (F.col("_ref_sha") == F.sha2(F.col("content"), 256)),
            F.concat(
                F.lit("content sha256 invariant violated at "),
                F.col("repo"),
                F.lit("/"),
                F.col("path"),
            ),
        )
        # chk is NULL (and side-effect-checked) for every valid row; the
        # when() makes the assertion part of the SAME projection as the
        # extraction UDF — one pass over content, no second scan
        guarded_refs = F.when(chk.isNull(), guarded_refs)

    refs = (
        parse_src.select(
            "repo",
            "path",
            guarded_refs.alias("refs"),
        )
        .where(F.size("refs") > 0)
        .select("repo", "path", F.explode("refs").alias("ref"))
        .select(
            "repo",
            "path",
            F.col("ref.target").alias("target_stem"),
            F.col("ref.weight").alias("weight"),
        )
    )

    # resolution dictionary: every file, keyed by (repo, stem)
    files = corpus.select(
        "repo", "path", stem_of_path(F.col("path")).alias("stem")
    )
    # stems that are globally unique → cross-repo fallback resolution
    global_unique = (
        files.groupBy("stem")
        .agg(F.count("*").alias("n"), F.first("repo").alias("g_repo"), F.first("path").alias("g_path"))
        .where(F.col("n") == 1)
        .select("stem", "g_repo", "g_path")
    )

    local = files.select(
        F.col("repo").alias("l_repo"),
        F.col("stem").alias("l_stem"),
        F.col("path").alias("l_path"),
    )
    resolved = (
        refs.join(
            local,
            (refs["repo"] == local["l_repo"]) & (refs["target_stem"] == local["l_stem"]),
            "left",
        )
        .join(global_unique, refs["target_stem"] == global_unique["stem"], "left")
        .select(
            "repo",
            "path",
            "weight",
            F.coalesce(F.col("l_repo"), F.col("g_repo")).alias("dst_repo"),
            F.coalesce(F.col("l_path"), F.col("g_path")).alias("dst_path"),
        )
        .where(F.col("dst_path").isNotNull())
    )
    return resolved.select(
        vertex_key(F.col("repo"), F.col("path")).alias("src_key"),
        vertex_key(F.col("dst_repo"), F.col("dst_path")).alias("dst_key"),
        F.col("weight").cast("double").alias("weight"),
    )
