"""Ship this package to executor python workers.

The probe operators (`mapInPandas` closures) reference module-level kernels,
which cloudpickle serializes *by reference* — executor workers must be able
to import ``duckdb_annsearch_spark``. On a real cluster the package would be
submitted with ``--py-files``; for library use we self-ship: zip the package
once per SparkContext and ``addPyFile`` it.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_ATTR = "_duckdb_annsearch_spark_shipped"


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    fd, zip_path = tempfile.mkstemp(suffix=".zip", prefix="duckdb_annsearch_spark_")
    os.close(fd)
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith((".pyc", ".pyo")) or "__pycache__" in root:
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(
                    "duckdb_annsearch_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    sc.addPyFile(zip_path)
    # NOT unlinked here: local-mode executors re-verify fetched dependencies
    # against the original path and fail on a missing/different file.
    # Clean up at interpreter exit instead.
    import atexit

    atexit.register(lambda p=zip_path: os.path.exists(p) and os.unlink(p))
    setattr(sc, _SHIPPED_ATTR, True)
