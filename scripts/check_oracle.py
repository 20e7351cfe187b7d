#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run each
`__spark_entry__.queries()` entry on Spark AND its `oracle_sql()` SQL on
DuckDB over the same parquet tables, then compare row count, sorted
schema, and a value hash (columns sorted by name, rows sorted, values
rounded like the driver).

    python scripts/check_oracle.py [--sf DIR] [query ...]

With no query names, checks every query that has an oracle entry.
Exit code 1 if any check fails.
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return "\0"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def fingerprint(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb
    import __spark_entry__ as entry
    from osmgraphing_spark.session import get_spark

    spark = get_spark(app_name="check_oracle")
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = args.names or [k for k in qs if k in oracles]

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failed = []
    for name in names:
        if name not in qs:
            print(f"{name}: UNKNOWN query")
            failed.append(name)
            continue
        try:
            sdf = qs[name](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"{name}: rows-only ({len(srows)} rows, no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            # Fetch through pandas, NOT fetchall(): the driver's compare
            # goes through a dataframe, so a DuckDB HUGEINT (e.g. an
            # uncast SUM over BIGINT) degrades to float64 there and
            # fingerprints as "2523.000000" vs Spark's long "2523".
            # fetchall() returns Python ints and masks exactly that class
            # of wrong-dtype oracle (the r2 link_butterflies red row).
            odf = res.df()
            orows = [
                tuple(
                    None if v is None or (isinstance(v, float) and math.isnan(v))
                    else bool(v) if type(v).__name__ == "bool_"
                    else v
                    for v in t
                )
                for t in odf.itertuples(index=False, name=None)
            ]
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {type(e).__name__}: {e}")
            failed.append(name)
            continue
        rows_ok = len(srows) == len(orows)
        schema_ok = sorted(scols) == sorted(ocols)
        hash_ok = schema_ok and fingerprint(scols, srows) == fingerprint(ocols, orows)
        ok = rows_ok and schema_ok and hash_ok
        status = "OK" if ok else "FAIL"
        print(
            f"{name}: {status} rows={len(srows)}/{len(orows)} "
            f"schema={'ok' if schema_ok else f'{sorted(scols)} vs {sorted(ocols)}'} "
            f"hash={'ok' if hash_ok else 'MISMATCH'}"
        )
        if not ok:
            failed.append(name)

    print(f"\n{len(names) - len(failed)}/{len(names)} green")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
