"""Iterative proportional fitting (raking) — two-margin mixture balancing.

LLM-data-pipeline extension: a training mixture usually has TARGETS on two
attributes at once — e.g. per-language mass (flatten the English head) and
per-source mass (cap any one crawl) — but the corpus's joint (lang ×
source) distribution can't hit both by scaling either margin alone.
Raking (Deming & Stephan 1940) alternately rescales the joint cell masses
to each margin; after a few rounds the cell masses match both margins
(exactly in the limit, geometrically fast in practice), giving each
document a deterministic sampling weight `cell_mass / cell_count`.

Scale design: the corpus is touched exactly ONCE — a groupBy(row, col)
count. The cell matrix is bounded by |rows| × |cols| (languages ×
sources: thousands, not corpus-sized), so the IPF rounds run on the
collected matrix driver-side — the same bounded-aggregate-to-driver
discipline as the IVF coarse quantizer's seeded sample (similarity.py):
what is collected is an AGGREGATE whose size is data-scale-independent.
Weights return as a broadcast join; the corpus is never shuffled.

Determinism: cell counts are exact, targets are caller-fixed, and the
round arithmetic is plain IEEE double — the same unrolled computation
replays bit-for-bit in SQL (see the ``doc_rake_weights`` oracle in
``__spark_entry__``), mod 1e-6 rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rake_cells(
    df: DataFrame,
    row_col: str,
    col_col: str,
    row_targets: dict[str, float] | None = None,
    col_targets: dict[str, float] | None = None,
    rounds: int = 3,
) -> DataFrame:
    """→ (row_col, col_col, n long, mass double, weight double): raked
    cell mass after ``rounds`` IPF rounds (row-scale then column-scale per
    round) and the per-document sampling weight ``mass / n``.

    ``row_targets`` / ``col_targets`` map margin value → target mass; when
    None, the margin's target is UNIFORM with total mass = len(df) (the
    "equal share per language / per source" default). Margin values absent
    from an explicit target map get target 0 — their documents rake to
    weight 0 (excluded), matching survey-statistics practice.
    """
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    cells = (
        df.groupBy(row_col, col_col)
        .agg(F.count("*").alias("n"))
        .collect()
    )
    # null-last ordering: real corpora carry NULL lang/source margins, and
    # a mixed None/str set breaks plain sorted() under Python 3. A NULL
    # margin is a legitimate cell (uniform default gives it an equal
    # share; explicit target maps address it with a None key).
    _margin_key = lambda v: (v is None, str(v))  # noqa: E731
    rows = sorted({r[row_col] for r in cells}, key=_margin_key)
    cols = sorted({r[col_col] for r in cells}, key=_margin_key)
    total = float(sum(r["n"] for r in cells))
    rt = (
        {v: total / len(rows) for v in rows}
        if row_targets is None
        else {v: float(row_targets.get(v, 0.0)) for v in rows}
    )
    ct = (
        {v: total / len(cols) for v in cols}
        if col_targets is None
        else {v: float(col_targets.get(v, 0.0)) for v in cols}
    )

    # accumulate margin sums in sorted cell order so the arithmetic is
    # run-to-run deterministic regardless of collect() partition order
    mass = {(r[row_col], r[col_col]): float(r["n"]) for r in cells}
    keys = sorted(mass, key=lambda k: (str(k[0]), str(k[1])))
    for _ in range(rounds):
        rsum: dict = {}
        for rv, cv in keys:
            rsum[rv] = rsum.get(rv, 0.0) + mass[(rv, cv)]
        mass = {
            (rv, cv): (
                mass[(rv, cv)] * rt[rv] / rsum[rv] if rsum[rv] > 0 else 0.0
            )
            for rv, cv in keys
        }
        csum: dict = {}
        for rv, cv in keys:
            csum[cv] = csum.get(cv, 0.0) + mass[(rv, cv)]
        mass = {
            (rv, cv): (
                mass[(rv, cv)] * ct[cv] / csum[cv] if csum[cv] > 0 else 0.0
            )
            for rv, cv in keys
        }

    spark = df.sparkSession
    data = sorted(
        (
            (
                r[row_col],
                r[col_col],
                int(r["n"]),
                mass[(r[row_col], r[col_col])],
                mass[(r[row_col], r[col_col])] / float(r["n"]),
            )
            for r in cells
        ),
        key=lambda t: (str(t[0]), str(t[1])),
    )
    # margin column types come from the input schema (an int year or a
    # region key must round-trip as itself, or the broadcast join back in
    # rake_weights silently mismatches on a string-cast key)
    field = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    return spark.createDataFrame(
        data,
        f"{row_col} {field[row_col]}, {col_col} {field[col_col]}, "
        "n long, mass double, weight double",
    )


def rake_weights(
    df: DataFrame,
    row_col: str,
    col_col: str,
    row_targets: dict[str, float] | None = None,
    col_targets: dict[str, float] | None = None,
    rounds: int = 3,
) -> DataFrame:
    """Attach the raked per-document sampling weight to every row of
    ``df`` (broadcast join on the bounded cell matrix; single corpus
    scan beyond rake_cells' count)."""
    cells = rake_cells(df, row_col, col_col, row_targets, col_targets, rounds)
    w = cells.select(
        F.col(row_col).alias("_rk_r"),
        F.col(col_col).alias("_rk_c"),
        "weight",
    )
    # null-safe equality: a NULL margin is a real raked cell (rake_cells
    # keeps it), and a plain equi-join would silently drop those rows
    cond = df[row_col].eqNullSafe(w["_rk_r"]) & df[col_col].eqNullSafe(w["_rk_c"])
    return (
        df.join(F.broadcast(w), cond, "left")
        .drop("_rk_r", "_rk_c")
        .fillna({"weight": 0.0})
    )
