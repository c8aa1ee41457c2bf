#!/usr/bin/env python
"""Build dist/hemera_indexer_spark.zip for spark-submit --py-files."""

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "dist", "hemera_indexer_spark.zip")

os.makedirs(os.path.dirname(OUT), exist_ok=True)
with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
    pkg = os.path.join(ROOT, "hemera_indexer_spark")
    for dirpath, _, files in os.walk(pkg):
        if "__pycache__" in dirpath:
            continue
        for fn in files:
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                z.write(full, os.path.relpath(full, ROOT))
print(OUT)
