"""Build ilogtail_spark.zip for spark-submit --py-files.

Usage:
    python tools/package.py [out.zip]
    spark-submit --py-files ilogtail_spark.zip your_job.py
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "ilogtail_spark.zip")
    pkg = os.path.join(REPO, "ilogtail_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
