#!/usr/bin/env python
"""Build the spark-submit artifact: glug_spark.zip (--py-files payload).

The engine is pure-Python modules over pyspark — the whole deployment
story is one zip on the driver plus the entry script:

    python tools/package.py                       # writes dist/glug_spark.zip
    spark-submit --py-files dist/glug_spark.zip \\
        --master <cluster> glug_spark/cli.py build \\
        --input <iceberg-or-parquet> --output <index-dir>

Only source modules ship (no tests/tools/caches); the zip is
zipimport-clean (verified by tests/test_package.py).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "glug_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    src_root = os.path.join(REPO, "glug_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(src_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for name in sorted(filenames):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(dirpath, name)
                rel = os.path.relpath(full, REPO)
                z.write(full, rel)
    return out_path


if __name__ == "__main__":
    path = build_zip(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
