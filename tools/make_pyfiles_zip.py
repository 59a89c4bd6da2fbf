"""Build smatchpp_spark.zip for spark-submit --py-files deployment.

Usage: python tools/make_pyfiles_zip.py [out.zip]

Zips the smatchpp_spark package (source only, no caches) so a cluster
job runs as:

  spark-submit --py-files smatchpp_spark.zip jobs/linkgraph.py ...
  spark-submit --py-files smatchpp_spark.zip jobs/score_corpus.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> int:
    n = 0
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "smatchpp_spark")
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
                n += 1
    return n


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "smatchpp_spark.zip")
    n = build(out)
    print(f"{out}: {n} files")
