"""Package the engine for spark-submit --py-files.

Produces dist/landscape_spark.zip containing the landscape_spark package —
the artifact every executor's Python worker imports from. Pure stdlib; run
from anywhere:

    python deploy/make_pyfiles.py
    spark-submit --py-files dist/landscape_spark.zip deploy/run_cluster.py ...
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_dir: str | None = None) -> str:
    out_dir = out_dir or os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "landscape_spark.zip")
    pkg = os.path.join(REPO, "landscape_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    print(build())
