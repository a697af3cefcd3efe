"""Catalog contract invariants: the correctness driver records exactly the
first 50 ``queries()`` keys (verified empirically round 2), so the window
ordering IS part of the driver contract — pin it."""

from __future__ import annotations

from savio_training_dask_2019_spark.queries import ORACLE, QUERIES

# Queries that must hold a driver-window slot THIS round (rotation schedule in
# queries/__init__.py): anything that never had a driver row, anything whose
# oracle was red last round and has been fixed, and anything whose Spark
# implementation changed since its newest green row. Demotions past the cap
# must never touch these.
MUST_BE_DRIVER_CHECKED = {
    # r18 is a pure rotation (DEFERRED emptied r17; no oracle or query
    # code changed this round), so no re-window-with-priority members.
    # Pin the five r17 displacements instead: the ledger promised them
    # the r18 returner front (WINDOWS.md r17 block), so them falling out
    # of the window again would break the rotation contract.
    "pii_redact", "ccnet_bands", "dedup_keep_best",
    "mixture_weights", "dedup_incremental",
}


def test_driver_window_holds_required_queries():
    first50 = set(list(QUERIES)[:50])
    missing = MUST_BE_DRIVER_CHECKED - first50
    assert not missing, f"required queries fell past the driver's 50-cap: {missing}"


# Queries with no driver row that are NOT in the current window, each with a
# named slot at the FRONT of the next round's window (WINDOWS.md ledger).
# This list is the machine-checked version of the ledger's "carried" prose —
# the r13->r14 lesson was a window plan that silently went stale by four
# queries; now an unscheduled query fails here the day it lands. Empty at
# r15: the r14 carries (behavior_entropy, below_avg_qty) hold window slots,
# so every catalog entry is witnessed or in-window.
CARRIED_TO_NEXT_WINDOW: set[str] = set()


def test_every_query_driver_witnessed_or_scheduled():
    """Window-arithmetic invariant (VERDICT r13 #1): every catalog entry
    either already has a driver row of record (appears in some
    CORRECTNESS_r*.json), sits in the current 50-slot window, or is on the
    explicit carried-forward list for the next window."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    witnessed: set[str] = set()
    for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        with open(p) as fh:
            witnessed |= set(json.load(fh))
    first50 = set(list(QUERIES)[:50])
    unscheduled = set(QUERIES) - witnessed - first50 - CARRIED_TO_NEXT_WINDOW
    assert not unscheduled, (
        "queries with no driver row, no window slot, and no carried-forward "
        f"entry — schedule them before shipping: {sorted(unscheduled)}"
    )
    # the carried set must actually need carrying, and must fit beside the
    # flagship in the next window
    already = CARRIED_TO_NEXT_WINDOW & (witnessed | first50)
    assert not already, f"carried entries already scheduled/witnessed: {already}"
    assert len(CARRIED_TO_NEXT_WINDOW) <= 49


def test_oracle_keys_subset_of_queries_and_ordered_identically():
    assert set(ORACLE) <= set(QUERIES)
    names = [n for n in QUERIES if n in ORACLE]
    assert names == list(ORACLE)  # same insertion order → stable driver pairing


def test_all_queries_callable_signature():
    for name, fn in QUERIES.items():
        assert callable(fn), name
