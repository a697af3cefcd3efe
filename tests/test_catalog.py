"""Catalog contract invariants: the correctness driver records exactly the
first 50 ``queries()`` keys (verified empirically round 2), so the window
ordering IS part of the driver contract — pin it."""

from __future__ import annotations

from savio_training_dask_2019_spark.queries import ORACLE, QUERIES

# Queries that must hold a driver-window slot: everything that had no driver
# row before round 3 plus round-3 additions. Demotions past the cap must
# never touch these.
MUST_BE_DRIVER_CHECKED = {
    "pandas_udf_tokens", "grouped_agg_pandas", "apply_in_pandas",
    "map_in_pandas", "map_in_arrow", "cogroup_stats", "udtf_tokens",
    "fanout_compute", "vector_stats", "vector_arith", "knn_join", "knn_lsh",
    "knn_ivf", "emb_near_dup", "emb_near_dup_lsh", "multimodal_meta",
    "multimodal_decode", "describe_summary", "doc_tfidf", "dedup_clusters",
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
