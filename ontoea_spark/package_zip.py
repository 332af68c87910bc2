"""Build the --py-files zip for spark-submit cluster runs.

Usage: ``python -m ontoea_spark.package_zip /tmp/ontoea_spark.zip``
"""

from __future__ import annotations

import os
import sys
import zipfile


def build_zip(out_path: str) -> str:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    with zipfile.ZipFile(out_path, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return out_path


if __name__ == "__main__":
    print(build_zip(sys.argv[1]))
