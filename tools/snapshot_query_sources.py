"""Snapshot the source of every driver query for the record-freshness
guard (tests/test_record_freshness.py).

The driver's per-round CORRECTNESS record only covers the FIRST 50
entries of ``__spark_entry__.queries()``. The freshness policy (the
docstring of ``queries()``) says: any query whose implementation changed
since its last driver record must sit inside that window. This script
materializes the policy's baseline: it hashes each query's ``_q_*``
function source plus its oracle SQL and writes them to
``tests/query_source_hashes.json``.

Run it from the tree that the LAST driver record was taken from (i.e.
the end-of-round commit) and check the file in; the test then fails if a
query whose hash has since changed hides outside the 50-entry window.

    python tools/snapshot_query_sources.py
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def compute_hashes() -> dict[str, str]:
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    out: dict[str, str] = {}
    for name, fn in qs.items():
        src = textwrap.dedent(inspect.getsource(fn))
        blob = src + "\n--oracle--\n" + oracles.get(name, "")
        out[name] = hashlib.md5(blob.encode()).hexdigest()
    return out


if __name__ == "__main__":
    dest = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "query_source_hashes.json")
    hashes = compute_hashes()
    with open(dest, "w") as fh:
        json.dump(hashes, fh, indent=1, sort_keys=True)
    print(f"wrote {len(hashes)} hashes to {dest}")
