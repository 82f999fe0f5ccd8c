"""Package miru_spark/ into a --py-files zip for spark-submit."""

from __future__ import annotations

import os
import sys
import zipfile


def main(out: str = "dist/miru_spark.zip") -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(repo, os.path.dirname(out)), exist_ok=True)
    dest = os.path.join(repo, out)
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(repo, "miru_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, repo))
    print(dest)


if __name__ == "__main__":
    main(*sys.argv[1:])
