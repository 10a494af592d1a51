"""Build ``dist/engine.zip`` for the north-rule deployment shape:

    spark-submit --master ... --py-files dist/engine.zip main.py ...

The zip is deterministic (sorted walk, fixed timestamps, no __pycache__),
so repeated builds are byte-identical and a cluster cache keyed on the
artifact hash never sees spurious invalidations.

Reference run shape this mirrors: the reference ships a single built
bundle and launches it per-region via run.sh (/root/reference/run.sh:7-80);
here the unit of shipment is the package zip handed to --py-files.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str, repo_root: str = REPO) -> str:
    pkg = os.path.join(repo_root, "skipmap_processor_spark")
    parent = os.path.dirname(os.path.abspath(out_path))
    if parent:
        os.makedirs(parent, exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = sorted(d for d in dirs if d != "__pycache__")
            for fn in sorted(files):
                if fn.endswith((".pyc", ".pyo")):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, repo_root)
                zi = zipfile.ZipInfo(rel.replace(os.sep, "/"))
                zi.date_time = (1980, 1, 1, 0, 0, 0)
                zi.external_attr = 0o644 << 16
                zi.compress_type = zipfile.ZIP_DEFLATED
                with open(full, "rb") as f:
                    z.writestr(zi, f.read())
    return out_path


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "engine.zip")
    print(build_zip(out))
