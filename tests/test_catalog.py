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
    # Spark implementation rewritten r6 (three-level offset cascade,
    # driver-side super-block prefix) — prior green rows predate the plan
    "pack_sequences",
    # new in r6 — need their first driver rows (rows-only by contract)
    "multimodal_resize", "multimodal_frames",
    # r5-window queries whose code changed in r6: explicit whitespace class
    # (query AND oracle), unrounded decontamination threshold, RDD-registry
    # round release, collision-free sampler scratch columns
    "norm_dedup_stats", "decontam_check", "dedup_clusters", "stratified_sample",
    # stalest rows outside the r5 window (newest records r3 — the
    # streaming-twin/timeseries and corpus-prep rows VERDICT r5 called out)
    "retention_daily", "gopher_quality", "mixture_sample", "tumbling_window",
    "sliding_window", "asof_tolerance", "pivot_daily", "vocab_coverage",
    "dt_accessors", "time_bucket",
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
