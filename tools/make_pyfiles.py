"""Package the engine for ``spark-submit --py-files`` (north-rule ship
shape): zips ``elasticsearch_spark/`` into ``dist/elasticsearch_spark.zip``.

Usage:
    python tools/make_pyfiles.py
    spark-submit --py-files dist/elasticsearch_spark.zip \\
        tools/submit_build.py <input_parquet> <index_dir> [lang]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_zip(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "elasticsearch_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "elasticsearch_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    print(make_zip(sys.argv[1] if len(sys.argv) > 1 else None))
