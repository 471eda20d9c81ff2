"""Build the --py-files artifact for cluster submission (north rule:
"ships via spark-submit --py-files to multi-executor clusters").

    python tools/make_pyfiles.py            # → dist/py_sema_spark.zip

Submit example (any Spark 4.x cluster; no extra deps beyond pandas /
pyarrow / jinja2 / yaml on the executors):

    spark-submit \
      --master spark://head:7077 \
      --py-files dist/py_sema_spark.zip \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.sql.execution.arrow.pyspark.enabled=true \
      your_job.py

Everything under py_sema_spark/ is self-contained pure Python, so the
zip is the whole deployment: driver-side code builds plans, executors
import the same zip inside pandas-UDF workers.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "py_sema_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(ROOT, "py_sema_spark")
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, ROOT))
    size = os.path.getsize(out)
    print(f"wrote {out} ({size/1024:.0f} KiB)")


if __name__ == "__main__":
    main()
