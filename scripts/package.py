"""Build the spark-submit --py-files artifact: a deterministic zip of
the hnormalise_spark package (sorted entries, fixed timestamp, so the
artifact hash is reproducible across builds).

    python scripts/package.py [dist_dir]
    spark-submit --py-files dist/hnormalise_spark.zip \
        hnormalise_spark/run.py --input ... --output ...

tests/test_submit.py exercises exactly this path: it builds the zip,
launches a REAL `spark-submit --py-files` subprocess from a directory
where the package is importable only from the zip, and checks the
routed sink counts.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXED_DATE = (2020, 1, 1, 0, 0, 0)  # reproducible artifact


def build(dist_dir: str) -> str:
    os.makedirs(dist_dir, exist_ok=True)
    out = os.path.join(dist_dir, "hnormalise_spark.zip")
    pkg = os.path.join(REPO, "hnormalise_spark")
    entries = []
    for root, _dirs, files in os.walk(pkg):
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                entries.append((os.path.relpath(full, REPO), full))
    entries.sort()
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in entries:
            info = zipfile.ZipInfo(arcname, date_time=FIXED_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(full, "rb") as fh:
                z.writestr(info, fh.read())
    return out


if __name__ == "__main__":
    dest = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist")
    print(build(dest))
