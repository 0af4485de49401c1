"""Package the engine for ``spark-submit --py-files`` (north_rule packaging).

Produces dist/modernsearchengines_spark.zip containing the package; submit
with:

    spark-submit --master local[32] \
        --py-files dist/modernsearchengines_spark.zip \
        tools/submit_index_job.py <docs.parquet> <out_dir>

On a real cluster the same artifact ships to every executor.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "modernsearchengines_spark.zip")
    pkg = os.path.join(REPO, "modernsearchengines_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for name in files:
                if name.endswith(".py"):
                    full = os.path.join(root, name)
                    zf.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
