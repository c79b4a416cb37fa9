"""Verification-currency gate (round-4 verdict ask #1, made mechanical).

The driver's CORRECTNESS check covers only the FIRST 50 keys of
``queries()``.  This test recomputes each query's transitive source hash
and FAILS if any key that changed since its last driver-green
verification (recorded in ``tests/query_manifest.json``) is registered
OUTSIDE that window — the exact staleness pattern that slipped through
by hand in rounds 3 (asof_join, ann_lsh) and 4 (kmv_distinct).

End-of-round: after the final reorder, refresh the manifest for the
window keys with ``python scripts/query_manifest.py --update``.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def test_changed_queries_are_inside_driver_window():
    import query_manifest as qm

    import __spark_entry__ as entry

    with open(qm.MANIFEST_PATH, encoding="utf-8") as f:
        manifest = json.load(f)
    current = qm.compute_hashes()
    keys = list(entry.queries())
    window = set(keys[:qm.WINDOW])
    stale = [k for k in keys
             if manifest.get(k) != current[k] and k not in window]
    assert not stale, (
        "these queries changed since their last driver-green verification "
        f"but are registered OUTSIDE the first-{qm.WINDOW} window "
        f"(reorder queries() and/or run scripts/query_manifest.py "
        f"--update): {stale}")


def test_manifest_covers_registry():
    """Every registered query has a manifest entry after --update (new
    keys start life inside the window, so the first --update records
    them); entries for deleted queries must not linger."""
    import query_manifest as qm

    import __spark_entry__ as entry

    with open(qm.MANIFEST_PATH, encoding="utf-8") as f:
        manifest = json.load(f)
    keys = set(entry.queries())
    extinct = sorted(set(manifest) - keys)
    assert not extinct, f"manifest entries for deleted queries: {extinct}"
    missing = sorted(keys - set(manifest))
    window = set(list(entry.queries())[:qm.WINDOW])
    outside = [k for k in missing if k not in window]
    assert not outside, (
        f"queries with no manifest entry outside the window: {outside}")
