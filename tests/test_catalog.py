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
    # never driver-witnessed (built after the r8 window filled) — first
    # rows r9 (VERDICT r8 #1)
    "bpe_apply", "zipf_curve", "decontam_scrub",
    # physical plan changed r9 — re-witness: the zero-norm clamp in
    # cell_knn_join and the semantic_dedup max-cluster guard
    "knn_cells", "semdedup_clusters",
    # rows of record r6 — the oldest in the catalog; VERDICT r8 #2
    # required their re-windowing by name
    "select_filter", "derived_column", "null_handling", "sample_mod",
    "sort_limit", "cross_join", "cumsum", "lag_lead", "tumbling_window",
    "distinct", "distinct_approx", "json_extract", "time_bucket",
    "semi_join", "decontam_check", "rolling_fp", "svd_embeddings",
    "multimodal_resize", "multimodal_frames", "hll_sketch_union",
    "kll_quantiles",
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
