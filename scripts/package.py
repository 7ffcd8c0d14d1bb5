"""Build dist/engine.zip for spark-submit --py-files.

Bundles the pure-Python engine + Spark layer + fixtures (fixtures are
included so smoke jobs can synthesize their own corpus on any
cluster).  Usage: python scripts/package.py
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "engine.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for pkg in ("pdf_parser_spark", "fixtures"):
            for root, _dirs, files in os.walk(os.path.join(REPO, pkg)):
                if "__pycache__" in root:
                    continue
                for f in sorted(files):
                    # .dat/.txt: vendored public data files (the full
                    # public-suffix list + its official test vectors)
                    if f.endswith((".py", ".dat", ".txt")):
                        full = os.path.join(root, f)
                        z.write(full, os.path.relpath(full, REPO))
    print(out)


if __name__ == "__main__":
    main()
