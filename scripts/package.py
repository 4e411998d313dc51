"""Build the --py-files archive for cluster deployment.

    python scripts/package.py [dest.zip]      # default dist/cdap_geo_spark.zip

Plain stdlib zip of the ``cdap_geo_spark`` package (sources only, no
caches), written deterministically (sorted entries, fixed timestamps)
so repeated builds are byte-identical and cluster-side caches stay
valid. Prints the spark-submit command to use it.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "cdap_geo_spark")


def build(dest: str) -> str:
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    entries = []
    for dirpath, dirnames, filenames in os.walk(PKG):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((full, os.path.relpath(full, REPO)))
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in entries:
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(full, "rb") as f:
                zf.writestr(info, f.read(), zipfile.ZIP_DEFLATED)
    return dest


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    dest = argv[0] if argv else os.path.join(REPO, "dist",
                                             "cdap_geo_spark.zip")
    path = build(dest)
    n = len(zipfile.ZipFile(path).namelist())
    print(f"built {path} ({n} modules)")
    print("submit with:\n"
          f"  spark-submit --master <cluster> --py-files {path} \\\n"
          f"      {os.path.join(REPO, 'scripts', 'submit_sjoin_tile.py')} \\\n"
          "      --docs <parquet> --regions <parquet> --out <dir>")
    return 0


if __name__ == "__main__":
    sys.exit(main())
