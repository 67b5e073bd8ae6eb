"""Package maga_spark for ``spark-submit --py-files`` (BASELINE.json north
rule: "run via spark-submit --py-files on a multi-executor cluster").

Builds a deterministic zip of the package source: fixed timestamps and
sorted entries, so the same tree always yields byte-identical artifacts
(content-addressable deploys, reproducible CI).

Usage: ``python tools/make_pyfiles.py [out.zip]`` (default
``dist/maga_spark.zip``), or import ``build_zip``.
"""

from __future__ import annotations

import os
import sys
import zipfile

_EPOCH = (1980, 1, 1, 0, 0, 0)  # zip format's minimum timestamp


def build_zip(out_path: str | None = None, repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = out_path or os.path.join(root, "dist", "maga_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(root, "maga_spark")
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith((".pyc", ".pyo")):
                continue
            full = os.path.join(dirpath, fn)
            entries.append((os.path.relpath(full, root), full))
    tmp = out + ".tmp"
    with zipfile.ZipFile(tmp, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in entries:
            info = zipfile.ZipInfo(arcname.replace(os.sep, "/"), date_time=_EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(full, "rb") as f:
                zf.writestr(info, f.read())
    os.replace(tmp, out)  # atomic, like the snapstore commits
    return out


if __name__ == "__main__":
    print(build_zip(sys.argv[1] if len(sys.argv) > 1 else None))
