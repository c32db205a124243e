"""Ship this package to Python workers.

Operators built on pandas UDFs / mapInPandas pickle their closures by
reference to this package, so every Python WORKER must be able to
``import flytemosaic_spark`` — true when the driver's cwd is the repo
root, false for an arbitrary harness that imported us via a sys.path
entry (workers don't inherit driver sys.path mutations). The fix is
Spark's own mechanism: zip the package once and ``addPyFile`` it, so
workers everywhere (local or a 1000-executor cluster) get it on their
sys.path. Idempotent per SparkContext; called from the table loader
and the session factory so any entry path covers it."""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession

_ZIP_PATH = "/tmp/flytemosaic_spark_pkg.zip"


def ship_package(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, "_flytemosaic_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if not os.path.exists(_ZIP_PATH) or os.path.getmtime(
        _ZIP_PATH
    ) < max(
        os.path.getmtime(os.path.join(root, f))
        for root, _, files in os.walk(pkg_dir)
        for f in files
        if f.endswith(".py")
    ):
        tmp = _ZIP_PATH + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for root, _, files in os.walk(pkg_dir):
                for f in files:
                    if not f.endswith(".py"):
                        continue
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
        os.replace(tmp, _ZIP_PATH)
    sc.addPyFile(_ZIP_PATH)
    sc._flytemosaic_shipped = True
