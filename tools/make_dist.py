"""Package the engine for spark-submit --py-files:

    python tools/make_dist.py   # -> dist/engine.zip

The zip contains only the pure-Python package (no tests/fixtures), which
is exactly what executors need; jobs/* stay outside as driver scripts:

    spark-submit --py-files dist/engine.zip jobs/build_index.py ...
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "cs_search_engine_architecture_spark"


def main() -> str:
    out_dir = os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "engine.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
