"""Package dachshund_spark for `spark-submit --py-files`.

Writes a deterministic zip of the pure-Python package (no compiled
artifacts, pycache excluded) — the cluster-launch artifact named by the
north rule.  Usage:

    python tools/make_pyfiles_zip.py [out.zip]
    spark-submit --py-files dachshund_spark.zip your_job.py
"""

from __future__ import annotations

import os
import sys
import zipfile


def make_zip(out_path: str) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "dachshund_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = sorted(d for d in dirs if d != "__pycache__")
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                arc = os.path.relpath(full, repo)
                zf.write(full, arc)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dachshund_spark.zip"
    print(make_zip(out))
