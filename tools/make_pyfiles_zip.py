"""Package simages_spark into a deterministic --py-files zip.

The north rule's run mode is `spark-submit --py-files simages_spark.zip`.
This builds that artifact: every .py in the package, stored with a fixed
timestamp and sorted member order so the zip bytes are a pure function
of the source tree (same property as the engine's deterministic outputs
— rebuilding on any machine yields a byte-identical artifact, which is
what makes "the cluster runs the code I tested" auditable).

Usage:
    python tools/make_pyfiles_zip.py [out_path]       # default dist/simages_spark.zip
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# fixed DOS timestamp for reproducible bytes (zip format has no "no
# timestamp"; 1980-01-01 is the conventional epoch, as used by wheels)
_EPOCH = (1980, 1, 1, 0, 0, 0)


def build_zip(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "simages_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg_root = os.path.join(REPO, "simages_spark")
    members = []
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, REPO)
                members.append((full, arc))
    tmp = out_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in members:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arc, date_time=_EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    os.replace(tmp, out_path)
    return out_path


if __name__ == "__main__":
    out = build_zip(sys.argv[1] if len(sys.argv) > 1 else None)
    print(out)
