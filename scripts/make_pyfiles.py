"""Build the --py-files archive for cluster submission.

The north rule runs the engine "via spark-submit --py-files on a
multi-executor cluster": executors import `geomesa_spark` from a zip on
their PYTHONPATH, so the package must be importable from an archive with
no setup step.  This script produces that archive (pure-Python package,
nothing to compile):

    python scripts/make_pyfiles.py [out.zip]
    spark-submit --py-files geomesa_spark.zip scripts/submit_job.py ...

Only source files ship — tests, caches, and checkpoints stay out so the
archive stays small enough to broadcast to every executor quickly.
"""
from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    pkg = os.path.join(REPO, "geomesa_spark")
    # deterministic archive: sorted walk + zeroed timestamps, so re-builds
    # of the same tree are byte-identical (content-addressable deploys)
    entries = []
    for root, dirs, files in os.walk(pkg):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            full = os.path.join(root, f)
            entries.append((full, os.path.relpath(full, REPO)))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for full, rel in entries:
            info = zipfile.ZipInfo(rel, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(full, "rb") as fh:
                z.writestr(info, fh.read(), zipfile.ZIP_DEFLATED)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(REPO, "geomesa_spark.zip")
    print(build(out))
