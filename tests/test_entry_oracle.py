"""Replicates the driver's correctness gate locally: every __spark_entry__
query with an oracle is run through Spark AND DuckDB on the same parquet and
compared (row count, column names, order-insensitive values)."""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v):
    """Driver-faithful canonicalization: TYPE-TAGGED so an oracle that
    degrades a BIGINT to float64 (DuckDB HUGEINT through pandas — the r2
    link_butterflies red row) FAILS here instead of sliding through
    python's int == float equality."""
    tn = type(v).__name__
    if tn in ("int64", "int32", "int16", "uint64", "uint32"):
        v = int(v)
    elif tn in ("float64", "float32"):
        v = float(v)
    elif tn == "bool_":
        v = bool(v)
    elif tn == "ndarray":
        v = list(v)
    if v is None:
        return ("n",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        # exact compare (the driver hashes exact values); queries are
        # responsible for rounding away cross-engine fp noise themselves
        return ("f", repr(v + 0.0))  # normalizes -0.0
    if isinstance(v, datetime.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, (list, tuple)):
        return ("a", tuple(_canon(x) for x in v))
    return ("s", str(v))


def _rowset(rows):
    return sorted(tuple(_canon(v) for v in r) for r in rows)


QUERIES = entry.queries()
ORACLES = entry.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    qdf = QUERIES[name](spark, SF_DIR)
    spark_cols = qdf.columns
    spark_rows = [tuple(r) for r in qdf.collect()]

    con = _duck(SF_DIR)
    res = con.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    # pandas fetch, NOT fetchall(): the driver compares through a
    # dataframe, where DuckDB HUGEINT degrades to float64 — fetchall()
    # returns python ints and masks exactly that wrong-dtype class
    ddf = res.df()
    duck_rows = [
        tuple(None if v is None or (isinstance(v, float) and math.isnan(v)) else v
              for v in t)
        for t in ddf.itertuples(index=False, name=None)
    ]

    assert spark_cols == duck_cols, f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    assert _rowset(spark_rows) == _rowset(duck_rows), f"{name}: value mismatch"


def test_entry_smoke(spark):
    """The driver's smoke check: entry(spark) runs and yields rows."""
    df = entry.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"node_id", "rank"}


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_oracle_less_query_runs(spark, name):
    """Rows-only check for non-SQL-expressible queries (mirrors the driver's
    weaker gate)."""
    qdf = QUERIES[name](spark, SF_DIR)
    assert qdf.count() >= 0
    assert len(qdf.columns) > 0
