#!/usr/bin/env python
"""Build the spark-submit --py-files artifact (north rule: 'ships via
spark-submit --py-files to multi-executor clusters'):

    python scripts/make_pyfiles_zip.py [out.zip]
    spark-submit --py-files osmgraphing_spark.zip your_job.py

Zips the package sources only (no tests, no caches), deterministically
ordered."""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    pkg = os.path.join(REPO, "osmgraphing_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in sorted(os.walk(pkg)):
            dirs[:] = sorted(d for d in dirs if d != "__pycache__")
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "osmgraphing_spark.zip")
    print(build(out))
