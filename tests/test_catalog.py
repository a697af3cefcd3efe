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
    # never driver-witnessed (built after the r7 window filled) — first rows
    "bm25_search", "collocations", "dsir_weights", "pack_multimodal",
    "bpe_train_merges", "multimodal_imgstats",
    # new in r8 — first rows
    "knn_cells", "dedup_within_lag", "substring_rebuild",
    # rows of record r5 (rode outside r6+r7 on the exemption precedent);
    # VERDICT r7 required their re-windowing by name
    "minhash_pairs", "simhash_pairs", "ngram_jaccard", "text_stats",
    "semdedup_clusters", "emb_near_dup_lsh", "knn_join", "doc_fingerprint",
    "dedup_keep_first",
    # Spark code / oracle changed r8 — re-witness: the zero-token
    # stopword_ratio guard (first three) and the salted keep-first/totals
    # join-backs in the substring tier (last three)
    "doc_quality", "gopher_quality", "domain_filter",
    "substring_dup_stats", "substring_scrub", "span_scrub",
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
