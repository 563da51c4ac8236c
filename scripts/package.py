"""Build dist/stats_spark.zip for ``spark-submit --py-files``.

Deterministic: fixed timestamps, sorted entries, __pycache__ excluded —
the same tree always zips to the same bytes (reproducible deploys).

Usage: python scripts/package.py [dest_zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(dest: str | None = None) -> str:
    dest = dest or os.path.join(REPO, "dist", "stats_spark.zip")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    pkg = os.path.join(REPO, "stats_spark")
    entries = []
    for root, dirs, files in os.walk(pkg):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith((".pyc", ".pyo")):
                continue
            full = os.path.join(root, f)
            entries.append((os.path.relpath(full, REPO), full))
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        for arc, full in sorted(entries):
            with open(full, "rb") as fh:
                info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
                info.compress_type = zipfile.ZIP_DEFLATED
                z.writestr(info, fh.read())
    return dest


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
