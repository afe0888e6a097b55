"""Build the --py-files artifact for cluster submission (north_rule:
"driven by spark-submit --py-files").

Zips the `knowledge_graph_builder_spark` package (sources only, no tests,
no caches) into dist/knowledge_graph_builder_spark.zip so the whole engine
ships to the driver and every executor as one archive:

    python tools/make_pyfiles.py
    spark-submit --master <cluster> \
        --py-files dist/knowledge_graph_builder_spark.zip \
        tools/submit_job.py --input <transcripts> --output <dir>

The zip is deterministic (fixed timestamps, sorted entries) so repeated
builds of the same tree are byte-identical — a cluster cache key.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "knowledge_graph_builder_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", f"{PACKAGE}.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    entries = []
    pkg_root = os.path.join(REPO, PACKAGE)
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((full, os.path.relpath(full, REPO)))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in entries:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arc, date_time=(2020, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            zf.writestr(info, data, zipfile.ZIP_DEFLATED)
    return out_path


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
