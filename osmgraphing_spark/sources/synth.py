"""Deterministic synthetic source-code corpus (the engine's input table).

Input shape per BASELINE.json input_hint:
    (repo: string, path: string, commit: string, lang: string, content: string)
plus the sidecar reference-hash table
    (repo, path, commit, content_sha256)
which plays the role of the reference parse the engine must agree with
per row (sha256 equality — the "per-row invariant").

Fixture topologies are lifted from the reference's handcrafted test maps so
our golden tests assert the same structures its tests do:

- ``small``      8 vertices / 19 raw → 16 deduped edges
                 (/root/reference/resources/small/graph.fmi,
                  /root/reference/tests/small/parsing.rs:39-131)
- ``bait``       5-vertex adversarial ring
                 (/root/reference/resources/bidirectional_bait/graph.fmi:16-31)
- ``stuttgart``  6 vertices, 13 weighted edges, one dangling sink ``dea``
                 (/root/reference/resources/simple_stuttgart/graph.fmi)
- ``twocc``      small ∪ a disjoint 3-cycle in a second repo
- ``powerlaw``   scaled skew corpus, generated fully distributed (no
                 driver-side loop) — the 100 TB path.

Edge encoding: a ``python`` file emits one directed edge per
``import <stem>  # w=<float>`` line; a ``c`` file per ``#include "<path>"``
line. Weight defaults to 1.0.

Everything is seed-42 deterministic (the reference's global SEED,
/root/reference/src/defaults.rs:1) and — for powerlaw — computed from pure
column expressions over ``spark.range``, so the same (n, m, seed) yields the
same corpus at any parallelism.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import SEED

COMMIT0 = "a" * 40  # constant 40-hex commit per fixture (deterministic)

SCHEMA = "repo string, path string, commit string, lang string, content string"

# ---------------------------------------------------------------------------
# Fixture edge lists (vertex stems; weight): straight from FIXTURES.md §3 /
# the reference resources.
# ---------------------------------------------------------------------------

# small: raw edges INCLUDING duplicates (b→a ×3, f→e ×2) to exercise dedup,
# as the reference fixture marks duplicate lines in resources/small/graph.fmi.
SMALL_RAW_EDGES = [
    ("b", "a", 1.0), ("b", "a", 1.0), ("b", "a", 1.0),
    ("b", "c", 1.0),
    ("c", "a", 1.0), ("c", "b", 1.0),
    ("d", "b", 1.0), ("d", "e", 2.0), ("d", "h", 1.0),
    ("e", "d", 2.0), ("e", "f", 1.0),
    ("f", "e", 1.0), ("f", "e", 1.0),
    ("f", "h", 1.0),
    ("g", "e", 1.0), ("g", "f", 1.0),
    ("h", "c", 4.0), ("h", "d", 1.0), ("h", "f", 1.0),
]
SMALL_VERTICES = list("abcdefgh")

BAIT_VERTICES = ["ll", "bb", "rr", "tr", "tl"]
_BAIT_ONE_WAY = [
    ("ll", "bb", 5.0), ("bb", "rr", 5.0),
    ("ll", "tl", 3.0), ("tl", "tr", 3.0), ("tr", "rr", 3.0),
]
BAIT_RAW_EDGES = _BAIT_ONE_WAY + [(b, a, w) for (a, b, w) in _BAIT_ONE_WAY]

STUTTGART_VERTICES = ["opp", "bac", "dea", "end", "wai", "stu"]
_STU_BIDIR = [
    ("opp", "bac", 8000.0), ("bac", "wai", 23000.0), ("bac", "end", 22000.0),
    ("end", "wai", 8000.0), ("end", "stu", 21000.0), ("wai", "stu", 17000.0),
]
STUTTGART_RAW_EDGES = (
    _STU_BIDIR + [(b, a, w) for (a, b, w) in _STU_BIDIR] + [("bac", "dea", 1069.0)]
)

TWOCC_EXTRA = {  # second repo: disjoint 3-cycle
    "vertices": ["x", "y", "z"],
    "edges": [("x", "y", 1.0), ("y", "z", 1.0), ("z", "x", 1.0)],
}

FIXTURES: dict[str, dict] = {
    "small": {"vertices": SMALL_VERTICES, "edges": SMALL_RAW_EDGES},
    "bait": {"vertices": BAIT_VERTICES, "edges": BAIT_RAW_EDGES},
    "stuttgart": {"vertices": STUTTGART_VERTICES, "edges": STUTTGART_RAW_EDGES},
}


def _render_python_file(stem: str, imports: list[tuple[str, float]]) -> str:
    lines = [f'"""module {stem} (synthetic)."""']
    for tgt, w in imports:
        if w == 1.0:
            lines.append(f"import {tgt}")
        else:
            lines.append(f"import {tgt}  # w={w}")
    lines.append(f"NAME = {stem!r}")
    return "\n".join(lines) + "\n"


def _fixture_rows(repo: str, vertices: list[str], edges: list[tuple[str, str, float]]):
    by_src: dict[str, list[tuple[str, float]]] = {v: [] for v in vertices}
    for s, d, w in edges:
        by_src[s].append((d, w))
    for v in vertices:
        content = _render_python_file(v, by_src[v])
        yield (repo, f"src/{v}.py", COMMIT0, "python", content)


def fixture_corpus(spark: SparkSession, names: tuple[str, ...] = ("small", "bait", "stuttgart")) -> DataFrame:
    """Golden-fixture corpus: one repo per topology, plus twocc's extra repo."""
    rows = []
    for name in names:
        if name == "twocc":
            rows += list(_fixture_rows("fixtures/small", **FIXTURES["small"]))
            rows += list(
                _fixture_rows("fixtures/cycle3", TWOCC_EXTRA["vertices"], TWOCC_EXTRA["edges"])
            )
        else:
            rows += list(_fixture_rows(f"fixtures/{name}", **FIXTURES[name]))
    # drop exact-duplicate file rows (twocc reuses small's repo)
    seen, uniq = set(), []
    for r in rows:
        if (r[0], r[1]) not in seen:
            seen.add((r[0], r[1]))
            uniq.append(r)
    return spark.createDataFrame(uniq, schema=SCHEMA)


def reference_hashes(corpus: DataFrame) -> DataFrame:
    """The sidecar 'reference parse' table: (repo, path, commit, content_sha256).

    Computed independently of the extraction stage (the extraction stage
    re-derives sha2(content, 256) and must match this per row).
    """
    return corpus.select(
        "repo", "path", "commit", F.sha2(F.col("content"), 256).alias("content_sha256")
    )


def reference_hashes_local(rows: list[tuple]) -> list[tuple]:
    """Driver-side oracle for tests: hashlib sha256 of the same rows."""
    return [
        (repo, path, commit, hashlib.sha256(content.encode("utf-8")).hexdigest())
        for (repo, path, commit, lang, content) in rows
    ]


# ---------------------------------------------------------------------------
# powerlaw — distributed skew corpus
# ---------------------------------------------------------------------------

def powerlaw_corpus(
    spark: SparkSession,
    n_files: int,
    m: int = 4,
    n_repos: int = 10,
    seed: int = SEED,
    repo_prefix: str = "powerlaw",
) -> DataFrame:
    """Deterministic power-law (preferential-attachment-like) corpus.

    File ``i`` imports ``m`` earlier files; target ``t = floor(u^2 * i)``
    with ``u`` a per-(i, j) hash-derived uniform. ``u^2`` biases toward low
    indices, yielding a power-law in-degree with hub files at small ``i`` —
    the skew the salting path must handle (north rule).

    Fully distributed: ``spark.range`` → column expressions → one string
    aggregation per file. No driver-side loops, no Python RNG — identical
    output at any parallelism, which is what makes the local[8]-vs-local[32]
    scaling evidence apples-to-apples.
    """
    files = spark.range(0, n_files).withColumnRenamed("id", "fid")
    imports = (
        files.where(F.col("fid") > 0)
        .select("fid", F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("j"))
        # xxhash64 → uniform in [0,1): deterministic, partition-independent
        .withColumn(
            "u",
            (F.abs(F.xxhash64(F.col("fid"), F.col("j"), F.lit(seed))) % F.lit(1 << 30))
            / F.lit(float(1 << 30)),
        )
        .withColumn("target", F.floor(F.col("u") * F.col("u") * F.col("fid")).cast("long"))
        .where(F.col("target") < F.col("fid"))  # strictly earlier file
        .select("fid", "target")
        .dropDuplicates(["fid", "target"])
    )
    import_lines = imports.groupBy("fid").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("target")),
                lambda t: F.concat(F.lit("import f"), t.cast("string")),
            ),
            "\n",
        ).alias("imports_block")
    )
    corpus = (
        files.join(import_lines, "fid", "left")
        .select(
            F.concat(
                F.lit(repo_prefix + "/r"), (F.col("fid") % n_repos).cast("string")
            ).alias("repo"),
            F.concat(F.lit("src/f"), F.col("fid").cast("string"), F.lit(".py")).alias("path"),
            F.lit(COMMIT0).alias("commit"),
            F.lit("python").alias("lang"),
            F.concat(
                F.lit('"""module f'),
                F.col("fid").cast("string"),
                F.lit(' (synthetic)."""\n'),
                F.coalesce(F.col("imports_block"), F.lit("")),
                F.lit("\n"),
            ).alias("content"),
        )
    )
    return corpus


# ---------------------------------------------------------------------------
# skewed — hub-SOURCE edge table (the salting path's target shape)
# ---------------------------------------------------------------------------

def skewed_raw_edges(
    spark: SparkSession,
    n_vertices: int,
    n_edges: int,
    hub_share: float = 0.25,
    n_hubs: int = 2,
    seed: int = SEED,
    distinct_weights: bool = False,
) -> DataFrame:
    """Deterministic raw edge table with hub SOURCES → (src_key, dst_key,
    weight).

    ``n_hubs`` sources own ``hub_share`` of all raw edges — OUT-degree skew,
    the shape that defeats a hash(src) resting layout (a single source's
    block cannot be split by adding partitions; the hub task stragglers
    every superstep barrier until the salted (src, hash(dst) % k) layout
    splits it). In-degree skew, by contrast, is already absorbed by
    map-side partial aggregation.

    Pure column expressions over ``spark.range`` (xxhash64-derived
    uniforms): identical output at any parallelism, like powerlaw_corpus.
    Duplicate (src, dst, weight) triples collapse in build_graph's dedup,
    so with the default constant weight a hub's out-degree saturates near
    n_vertices — size n_vertices accordingly. ``distinct_weights=True``
    spreads weights over a 10^6-value 1e-6 grid instead, so parallel
    (src, dst) edges survive dedup as legitimate distinct-weight
    multigraph edges and the hub block stays at RAW scale — the shape for
    demonstrating straggler mitigation, where the hub block must dominate
    total edge work, not merely exceed the partition target.
    """
    e = spark.range(0, n_edges).withColumnRenamed("id", "eid")
    u = (
        F.abs(F.xxhash64(F.col("eid"), F.lit(seed))) % F.lit(1 << 30)
    ) / F.lit(float(1 << 30))
    hub_src = F.pmod(F.xxhash64(F.col("eid"), F.lit(seed + 1)), F.lit(n_hubs))
    cold_src = F.pmod(
        F.xxhash64(F.col("eid"), F.lit(seed + 2)), F.lit(n_vertices)
    )
    dst = F.pmod(F.xxhash64(F.col("eid"), F.lit(seed + 3)), F.lit(n_vertices))
    if distinct_weights:
        weight = F.lit(1.0) + F.pmod(
            F.xxhash64(F.col("eid"), F.lit(seed + 4)), F.lit(1_000_000)
        ).cast("double") * F.lit(1e-6)
    else:
        weight = F.lit(1.0)
    return e.select(
        F.format_string(
            "v%010d",
            F.when(u < F.lit(float(hub_share)), hub_src).otherwise(cold_src),
        ).alias("src_key"),
        F.format_string("v%010d", dst).alias("dst_key"),
        weight.alias("weight"),
    )
