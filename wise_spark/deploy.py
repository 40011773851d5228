"""Packaging for executor shipment — the `spark-submit --py-files` story.

The north_rule mandates running via ``spark-submit --py-files`` on
multi-executor clusters; this module builds the zip artifact once per
session and registers it with ``sc.addPyFile`` so Python workers can import
``wise_spark`` regardless of driver CWD or deploy mode.
"""

from __future__ import annotations

import os
import tempfile
import zipfile


def package_zip(dest: str | None = None) -> str:
    """Zip the wise_spark package (sources only, deterministic order)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    if dest is None:
        dest = os.path.join(tempfile.gettempdir(), "wise_spark_pkg.zip")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in sorted(os.walk(pkg_dir)):
            dirnames.sort()
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, root))
    return dest


def ship_package(spark) -> str:
    """Make wise_spark importable on executors (idempotent per session).

    Under ``spark-submit --py-files wise_spark_pkg.zip`` the artifact is
    already registered before user code runs; re-adding a freshly built zip
    with the same basename would fail (zip member mtimes make the two files
    byte-different, and Spark rejects same-name-different-content addFile).
    ``_python_includes`` holds the basenames of every registered py-file
    (both --py-files and addPyFile), so an existing entry means executors
    can already import wise_spark and there is nothing to do."""
    path = package_zip()
    base = os.path.basename(path)
    included = getattr(spark.sparkContext, "_python_includes", None) or []
    if base in included:
        return path
    spark.sparkContext.addPyFile(path)
    return path
