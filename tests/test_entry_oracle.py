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
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # exact compare (the driver hashes exact values); queries are
        # responsible for rounding away cross-engine fp noise themselves
        return v + 0.0  # normalizes -0.0
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, int):
        return int(v)
    return v


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
    duck_rows = res.fetchall()

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
