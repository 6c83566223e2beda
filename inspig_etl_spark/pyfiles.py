"""Ship this package to Python workers (addPyFile).

Expression-only queries never need this — they run entirely in the JVM.
But Pandas-UDF / mapInPandas / applyInPandasWithState closures are
unpickled on PYTHON WORKERS, which import referenced module-level functions
by name. When the driving session was created outside the repo (the
external driver contract), workers have no ``inspig_etl_spark`` on their
path — so any query entering Python-worker territory must call
:func:`ensure_shipped` first.
"""

from __future__ import annotations

import os
import threading
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()  # app ids already carrying the zip
# Serialize the whole check-build-add sequence: two threads building
# queries concurrently (guide §2.6 overlapped jobs; the r17 bulk parity
# sweeps) would otherwise both write the zip — zip entries embed mtimes,
# so the second write produces DIFFERENT bytes and every executor fetch
# fails with "exists and does not match contents of" (observed r17).
_LOCK = threading.Lock()


def ensure_shipped(spark: SparkSession) -> None:
    with _LOCK:
        app_id = spark.sparkContext.applicationId
        if app_id in _SHIPPED:
            return
        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        zip_path = os.path.join("/tmp", f"inspig_etl_spark_pyfiles_{os.getpid()}.zip")
        if not os.path.exists(zip_path):
            tmp_path = f"{zip_path}.tmp-{threading.get_ident()}"
            with zipfile.ZipFile(tmp_path, "w") as zf:
                for root, _dirs, files in os.walk(pkg_dir):
                    for f in files:
                        if not f.endswith(".py"):
                            continue
                        full = os.path.join(root, f)
                        rel = os.path.join(
                            "inspig_etl_spark", os.path.relpath(full, pkg_dir)
                        )
                        zf.write(full, rel)
            os.replace(tmp_path, zip_path)  # atomic: readers never see a partial zip
        spark.sparkContext.addPyFile(zip_path)
        _SHIPPED.add(app_id)
