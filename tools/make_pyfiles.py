"""Package the engine for `spark-submit --py-files` (north-rule run mode).

Produces a single zip of `rdf_knowledge_extractor_spark/` that executors
import from, e.g.::

    python tools/make_pyfiles.py dist/engine.zip
    spark-submit --master <cluster> \
        --py-files dist/engine.zip \
        examples/submit_pipeline.py <pages_table> <out_dir>

The zip contains only the package (no tests/bench), pyc-free, with
deterministic member order + zeroed timestamps so re-builds are
byte-identical (reproducible artifact → content-addressable deploys).
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "rdf_knowledge_extractor_spark"


def build(out_path: str, repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    members: list[str] = []
    for dirpath, dirnames, filenames in os.walk(os.path.join(root, PKG)):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                members.append(os.path.join(dirpath, fn))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for path in members:
            arcname = os.path.relpath(path, root)
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(path, "rb") as f:
                zf.writestr(info, f.read())
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/engine.zip"
    print(build(out))
