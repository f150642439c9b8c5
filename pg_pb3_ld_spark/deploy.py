"""Cluster deployment packaging (north rule: ``spark-submit
--py-files`` on multi-executor clusters).

``build_pyfiles_zip`` packages the engine into a single zip suitable
for ``spark-submit --py-files engine.zip job.py`` — executors unpack
it onto their PYTHONPATH, so the mapInArrow/mapInPandas stages import
``pg_pb3_ld_spark`` remotely.  No data files, no tests, just the
package; deterministic member order so repeated builds are
byte-stable (rsync/cache friendly on a 1000-executor push).

The smoke test (tests/test_spark_submit.py) actually runs
``spark-submit --py-files`` end-to-end in local mode — the same
command line a cluster submit uses.
"""

from __future__ import annotations

import os
import zipfile


def build_pyfiles_zip(out_path: str, package_root: str | None = None) -> str:
    """Zip the ``pg_pb3_ld_spark`` package for ``--py-files``.

    Returns ``out_path``.  Members are stored with a fixed timestamp
    and sorted paths so the archive is byte-reproducible.
    """
    if package_root is None:
        package_root = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(package_root)
    members: list[tuple[str, str]] = []
    for dirpath, dirnames, filenames in os.walk(package_root):
        dirnames[:] = sorted(
            d for d in dirnames if d != "__pycache__"
        )
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            full = os.path.join(dirpath, fn)
            rel = os.path.join(
                pkg_name, os.path.relpath(full, package_root)
            )
            members.append((full, rel))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, rel in members:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(rel, date_time=(2020, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_path
