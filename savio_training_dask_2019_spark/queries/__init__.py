"""Query catalog — the driver-facing contract (SURVEY.md §2 coverage).

Each module contributes two dicts:

- ``QUERIES``: name → callable(spark, sf_dir) → DataFrame (idiomatic Spark)
- ``ORACLE``:  name → ANSI SQL string DuckDB runs on the same parquet views
  (omitted for genuinely non-SQL-expressible ops → rows-only check)

Conventions that make the driver's order-insensitive value-hash comparison
deterministic across engines (SURVEY.md §5, FIXTURES.md gotchas):

- every computed column is aliased identically on both sides;
- floating aggregates are rounded on BOTH sides — sums to 2 decimals,
  averages/ratios to 4, correlations to 6, cosines to 5 — wide enough that
  cross-engine summation-order noise (~1e-12 relative) cannot flip a digit;
- top-k queries carry an explicit unique tie-break key on both sides;
- counts stay BIGINT (DuckDB ``sum`` of integers is cast from HUGEINT).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import llmpipe, pythonic, relational, textops, timeseries, vectorops

_MODULES = (relational, timeseries, textops, vectorops, pythonic, llmpipe)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

for _m in _MODULES:
    overlap = QUERIES.keys() & _m.QUERIES.keys()
    if overlap:  # fail fast at import: duplicate names would shadow silently
        raise ValueError(f"duplicate query names across modules: {overlap}")
    QUERIES.update(_m.QUERIES)
    ORACLE.update(_m.ORACLE)

_MISSING = ORACLE.keys() - QUERIES.keys()
if _MISSING:
    raise ValueError(f"oracle entries without a query: {_MISSING}")

# --- driver-window ordering -------------------------------------------------
#
# The correctness driver records exactly the FIRST 50 keys of queries()
# (verified round 2: CORRECTNESS_r02.json keys == list(queries())[:50]), so
# dict insertion order decides which queries earn a driver-green row each
# round.  ROTATION SCHEDULE (the catalog is 89 queries, the window 50, so no
# single round can witness everything):
#
#   r2: first 50 of the natural module order        -> CORRECTNESS_r02.json
#   r3: the 33 never-witnessed + r3 additions       -> CORRECTNESS_r03.json
#   r4 (this window):
#     - ALL 39 queries outside the r3 window — the 37 r2-green queries r3
#       demoted, plus hll_sketch_union / kll_quantiles which have never had
#       ANY driver row (rows-only by contract, but the driver still records
#       row counts for them);
#     - the 4 queries whose r3 rows were red from uncast DuckDB sums, now
#       fixed (gopher_quality, pack_sequences, mixture_sample,
#       retention_daily) — their green rows must be re-witnessed;
#     - the 2 queries whose Spark implementations were rewritten this round
#       (unigram_logprob: scalar-agg total; vocab_coverage: TakeOrdered cut)
#       — their r3 rows predate the rewrite;
#     - the flagship (agg_groupby) plus one rolling representative per big
#       family (pandas_udf_tokens, knn_brute, dedup_keep_first, join_3way)
#       so every round keeps a live cross-family driver signal.
#   r5+: swap the representative slots; re-window anything whose code or
#       oracle changed that round; everything else rides its newest green
#       row + the every-round local replica (scripts/check_correctness.py,
#       dtype-strict sorted-row equality — run over ALL 89 every round).
#
# Union of r2..r4 rows of record: every oracle-backed query has a driver-
# green row, and every rows-only query has a driver row-count record.
_DRIVER_WINDOW: tuple[str, ...] = (
    # flagship
    "agg_groupby",
    # --- the 39 outside the r3 window (r2-green demotions + hll/kll) ---
    # relational core (§2.2/§2.3/§2.6)
    "select_filter",
    "derived_column",
    "null_handling",
    "sample_mod",
    "topk",
    "sort_limit",
    "distinct",
    "value_counts",
    "set_ops",
    "join_outer",
    "semi_join",
    "anti_join",
    "cross_join",
    "range_join",
    # sketches (§2.4) — hll/kll: FIRST-EVER driver rows this round
    "distinct_approx",
    "hll_sketch_union",
    "kll_quantiles",
    "percentiles",
    "corr_cov",
    "cube_agg",
    # window functions (§2.5)
    "window_rank",
    "lag_lead",
    "rolling_avg",
    "cumsum",
    "ntile_percent",
    # functions / json / time (§2.7, §2.5, §2.8)
    "string_funcs",
    "json_extract",
    "time_bucket",
    "dt_accessors",
    "tumbling_window",
    "sliding_window",
    "asof_tolerance",
    "pivot_daily",
    # text/docs tier (§2.12)
    "bpe_token_stats",
    "rolling_fp",
    "doc_quality",
    "wordcount",
    "dedup_stats",
    "svd_embeddings",
    # --- the 4 r3 hash-failures, oracles fixed this round ---
    "gopher_quality",
    "pack_sequences",
    "mixture_sample",
    "retention_daily",
    # --- rewritten this round (r3 rows predate the new plans) ---
    "unigram_logprob",
    "vocab_coverage",
    # --- NEW this round (needs its first driver row) ---
    "semdedup_clusters",
    # --- rolling per-family representatives (r3-green, kept live) ---
    "pandas_udf_tokens",
    "knn_brute",
    "join_3way",
)

_UNKNOWN = set(_DRIVER_WINDOW) - QUERIES.keys()
if _UNKNOWN:
    raise ValueError(f"driver-window names without a query: {_UNKNOWN}")
if len(_DRIVER_WINDOW) != len(set(_DRIVER_WINDOW)):
    raise ValueError("duplicate names in _DRIVER_WINDOW")
if len(_DRIVER_WINDOW) > 50:
    raise ValueError(f"driver window holds 50, got {len(_DRIVER_WINDOW)}")

_ORDER = list(_DRIVER_WINDOW) + [n for n in QUERIES if n not in set(_DRIVER_WINDOW)]
QUERIES = {n: QUERIES[n] for n in _ORDER}
ORACLE = {n: ORACLE[n] for n in _ORDER if n in ORACLE}

__all__ = ["QUERIES", "ORACLE"]
