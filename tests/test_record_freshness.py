"""Structural guard for driver-record freshness (round-3 verdict ask #6).

The per-round CORRECTNESS record covers only the FIRST 50 entries of
``__spark_entry__.queries()``; older queries rely on their last record
plus the claim that they haven't changed since. That claim was prose —
this test makes it structural: every query whose source (function body
or oracle SQL) differs from the checked-in snapshot of the last recorded
round (``tests/query_source_hashes.json``, regenerated per round by
``tools/snapshot_query_sources.py``) must appear inside the 50-entry
driver window, and so must every query added since the snapshot.

No SparkSession needed: this inspects function sources only.
"""

import json
import os

DRIVER_WINDOW = 50


def test_changed_queries_sit_in_driver_window():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.snapshot_query_sources import compute_hashes

    snap_path = os.path.join(os.path.dirname(__file__), "query_source_hashes.json")
    with open(snap_path) as fh:
        snapshot = json.load(fh)
    current = compute_hashes()

    order = list(current)  # dict order == queries() order == driver order
    stale = [
        name
        for i, name in enumerate(order)
        if i >= DRIVER_WINDOW and current[name] != snapshot.get(name)
    ]
    assert not stale, (
        f"queries changed (or added) since the last recorded round but "
        f"outside the driver's first-{DRIVER_WINDOW} window: {stale} — "
        f"reorder queries() or regenerate tests/query_source_hashes.json "
        f"only from the tree a driver record was actually taken from"
    )
