"""Package the engine for spark-submit --py-files.

Usage: python scripts/make_pyfiles_zip.py [dist/instageo_e2e_geospatial_ml_spark.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "instageo_e2e_geospatial_ml_spark"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "dist", f"{PKG}.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(os.path.join(ROOT, PKG)):
            if "__pycache__" in dirpath:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, ROOT))
    print(out)


if __name__ == "__main__":
    main()
