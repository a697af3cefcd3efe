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
    # new in r7 — need their first driver rows (multimodal_dims, span_scrub,
    # hard_negatives, bpe_merges, and dedup_keep_best oracle-backed,
    # multimodal_audio rows-only by contract)
    "multimodal_dims", "multimodal_audio", "span_scrub",
    "hard_negatives", "bpe_merges", "dedup_keep_best",
    "domain_filter", "mixture_weights", "substring_dup_stats",
    "substring_scrub",
    # Spark plan changed r7 (offset table localCheckpoint-ed) — re-witness
    "pack_sequences",
    # rode outside the window r5 AND r6 on the benched+replica exemption;
    # VERDICT r6 required their re-windowing (newest driver rows are r4)
    "join_3way", "knn_brute",
    # stalest rows outside the r6 window VERDICT r6 called out by name
    "agg_stats", "nullsafe_join", "grouping_sets", "describe_summary",
    "window_rank", "funnel_stages", "asof_join",
}


def test_driver_window_holds_required_queries():
    first50 = set(list(QUERIES)[:50])
    missing = MUST_BE_DRIVER_CHECKED - first50
    assert not missing, f"required queries fell past the driver's 50-cap: {missing}"


def test_oracle_keys_subset_of_queries_and_ordered_identically():
    assert set(ORACLE) <= set(QUERIES)
    names = [n for n in QUERIES if n in ORACLE]
    assert names == list(ORACLE)  # same insertion order → stable driver pairing


def test_all_queries_callable_signature():
    for name, fn in QUERIES.items():
        assert callable(fn), name
