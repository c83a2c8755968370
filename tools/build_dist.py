"""Build the spark-submit artifact: zip the package for --py-files.

Usage: python tools/build_dist.py
Writes dist/dibbs_ecr_refiner_spark.zip deterministically (sorted entries,
fixed timestamps) so the artifact is reproducible and diffs are meaningful.
tests/test_contract.py::test_dist_zip_matches_source pins freshness.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "dibbs_ecr_refiner_spark")
OUT = os.path.join(REPO, "dist", "dibbs_ecr_refiner_spark.zip")

FIXED_DATE = (2026, 1, 1, 0, 0, 0)


def source_files() -> list[str]:
    out = []
    for dirpath, dirnames, filenames in os.walk(PKG):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                out.append(os.path.join(dirpath, fn))
    return out


def build() -> str:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as zf:
        for path in source_files():
            arcname = os.path.relpath(path, REPO)
            info = zipfile.ZipInfo(arcname, date_time=FIXED_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(path, "rb") as f:
                zf.writestr(info, f.read())
    return OUT


if __name__ == "__main__":
    print(build())
