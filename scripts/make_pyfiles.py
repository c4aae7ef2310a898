#!/usr/bin/env python
"""Package the engine for ``spark-submit --py-files``.

Zips ``org_rdkit_lucene_spark/`` (pure Python, no native deps) into
``dist/orls.zip`` so executors can import it. Deterministic member
order and zeroed timestamps → reproducible artifact bytes.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "org_rdkit_lucene_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "orls.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    members: list[tuple[str, str]] = []
    for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
        if "__pycache__" in root:
            continue
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                members.append((full, os.path.relpath(full, REPO)))
    members.sort(key=lambda m: m[1])
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for full, arc in members:
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as fh:
                z.writestr(info, fh.read())
    return out_path


if __name__ == "__main__":
    print(build())
