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
    # never driver-witnessed before r10 — first rows (VERDICT r9 #1)
    "drift_psi", "winnow_fp", "heavy_hitters", "ivf_balance",
    "pq_encode", "pq_adc", "ivfpq", "pack_bfd", "repetition_stats",
    # built this round — first rows
    "drift_psi_windowed", "heavy_domains",
    # pq_* also carry this round's code touch (ADC literal-size guard)
    # — already listed above.
    # the 22 r7-record riders VERDICT r9 #2 required back by name
    "topk", "join_3way", "window_rank", "knn_brute", "passage_dedup",
    "unigram_logprob", "bigram_logprob", "knn_lsh", "knn_ivf",
    "multimodal_audio", "vector_stats", "vector_arith",
    "multimodal_meta", "multimodal_decode", "multimodal_dims",
    "map_in_pandas", "map_in_arrow", "udtf_tokens", "fanout_compute",
    "dup_ngram_ratio", "shard_corpus", "length_buckets",
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
