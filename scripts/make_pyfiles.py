"""Build dist/cianparser_spark.zip for spark-submit --py-files.

Usage:
    python scripts/make_pyfiles.py
    spark-submit --py-files dist/cianparser_spark.zip your_job.py

The zip contains the pure-Python package only (no tests, no caches);
every executor-side import (corpus, semantics, engine.stage, ops) is
reachable from it, which is what lets the Arrow UDF batches run on a
real multi-executor cluster exactly as they do on local[N].
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "dist", "cianparser_spark.zip")


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    n = 0
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(os.path.join(ROOT, "cianparser_spark")):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, ROOT))
                    n += 1
    print(f"wrote {OUT} ({n} modules)")


if __name__ == "__main__":
    main()
