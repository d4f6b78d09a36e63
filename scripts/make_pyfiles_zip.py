"""Build the --py-files artifact for cluster submission.

The north rule requires the pipeline to run via ``spark-submit --py-files``
on a multi-executor cluster: the driver and every executor's Python workers
import the package from a shipped zip, not from a checked-out repo. This
builds that zip deterministically (sorted entries, fixed timestamps, no
__pycache__), so the artifact hash is stable for a given source tree and a
redeploy with identical code is a byte-identical upload.

Usage: python scripts/make_pyfiles_zip.py [out_dir]
Prints the artifact path and its sha256.
"""

from __future__ import annotations

import hashlib
import os
import sys
import zipfile

PKG = "productbert_intermediate_spark"


def build_zip(out_dir: str, repo_root: str | None = None) -> str:
    """Zip the package for --py-files; returns the artifact path."""
    root = repo_root or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    pkg_dir = os.path.join(root, PKG)
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"{PKG}.zip")

    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg_dir):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith((".pyc", ".pyo")):
                continue
            full = os.path.join(dirpath, fn)
            entries.append((os.path.relpath(full, root), full))
    entries.sort()

    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in entries:
            # Fixed timestamp => deterministic artifact for identical source.
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(full, "rb") as f:
                zf.writestr(info, f.read())
    return out_path


def sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


if __name__ == "__main__":  # pragma: no cover - CLI entry
    out = sys.argv[1] if len(sys.argv) > 1 else "dist"
    p = build_zip(out)
    print(f"{p}  sha256={sha256(p)}")
