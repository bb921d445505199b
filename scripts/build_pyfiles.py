"""Build the spark-submit --py-files artifact from the CURRENT source tree.

The zip is generated, never committed: a committed binary drifts from HEAD
(a driver importing local source while executors unpickle two-commits-old
closures from the zip fails on any renamed helper, or — worse — silently
runs stale code).  Reproducible output: entries are sorted, timestamps
fixed, caches excluded — rebuilding from the same tree yields the same
bytes.

Usage: python scripts/build_pyfiles.py [out.zip]   (default
dist/goscrape_spark.zip)

Ship it:  spark-submit --py-files dist/goscrape_spark.zip your_driver.py
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "goscrape_spark"


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    entries = []
    pkg_root = os.path.join(REPO, PACKAGE)
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            full = os.path.join(dirpath, fn)
            entries.append((os.path.relpath(full, REPO), full))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in sorted(entries):
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arcname, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(REPO, "dist", PACKAGE + ".zip")
    print(build(out))
