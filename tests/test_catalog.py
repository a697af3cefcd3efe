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
    # Spark implementations rewritten r5 — r4/r3 rows predate the new code:
    # unigram (persisted counts + top-K cap + OOV floor, oracle changed too),
    # decontam/passage (xxhash64 match keys; string-keyed oracles unchanged)
    "unigram_logprob", "decontam_check", "passage_dedup",
    # new in r5 — need their first driver rows
    "token_entropy", "bigram_logprob", "stratified_sample", "ccnet_bands",
    "norm_dedup_stats",
    # the 40 queries outside the r4 window — newest rows of record are r3
    "agg_stats", "nullsafe_join", "grouping_sets", "describe_summary",
    "funnel_stages", "session_window", "asof_join", "text_stats", "lang_id",
    "dedup_keep_first", "doc_fingerprint", "ngram_jaccard", "doc_tfidf",
    "dedup_clusters", "minhash_pairs", "simhash_pairs", "knn_join", "knn_lsh",
    "knn_ivf", "vector_stats", "vector_arith", "emb_near_dup",
    "emb_near_dup_lsh", "grouped_agg_pandas", "apply_in_pandas",
    "map_in_pandas", "map_in_arrow", "multimodal_meta", "multimodal_decode",
    "cogroup_stats", "udtf_tokens", "fanout_compute", "dup_ngram_ratio",
    "pii_redact", "shard_corpus", "length_buckets", "dedup_incremental",
    "split_leakage",
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
