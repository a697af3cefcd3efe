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
    # never driver-witnessed — the 28 r10 late additions take first rows
    # r11 (the only catalog entries with no driver row); six of them
    # (zorder_stats, pagerank, pagerank_weighted, range_join_banded,
    # cms_counts, decontam_semantic) also carry this round's ADVICE-fix
    # code touches, so their first rows double as changed-code witnesses
    "ivfpq_rerank", "decontam_bloom", "chunk_documents", "quantize_int8",
    "cms_counts", "dedup_incremental_bloom", "source_overlap",
    "drift_numeric", "decontam_semantic", "weighted_sample",
    "snapshot_diff", "melt_metrics", "fuzzy_join", "skew_profile",
    "retrieval_eval", "outlier_mad", "drift_ks", "pagerank",
    "join_explosion", "rrf_hybrid", "fuzzy_clusters", "range_join_banded",
    "ohlc_bars", "trend_slope", "pagerank_weighted", "fuzzy_lookup",
    "apply_cdc", "zorder_stats",
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
