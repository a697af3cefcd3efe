"""Query catalog — the driver-facing contract (SURVEY.md §2 coverage).

Each module contributes two dicts:

- ``QUERIES``: name → callable(spark, sf_dir) → DataFrame (idiomatic Spark)
- ``ORACLE``:  name → ANSI SQL string DuckDB runs on the same parquet views
  (omitted for genuinely non-SQL-expressible ops → rows-only check)

Conventions that make the driver's order-insensitive value-hash comparison
deterministic across engines (SURVEY.md §5, FIXTURES.md gotchas):

- every computed column is aliased identically on both sides;
- Spark and DuckDB both round a double by its SHORTEST DECIMAL repr,
  half-up (Spark via BigDecimal.valueOf; pinned cross-engine by every
  oracle row and, on a .xxx75 knife edge, by the trimmed_mean
  differential) — python's round() is half-EVEN on the binary value, so
  python test references must quantize Decimal(repr(x)) instead;
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
# Invariant: the correctness driver records exactly the FIRST 50 keys of
# queries() (verified r2), so this tuple decides which queries earn a
# driver-green row this round. Rotation rule: flagship + never-witnessed
# first, then the oldest rows of record; queries whose code/oracle changed
# this round re-window with priority, displacing from the BACK. The plan is
# COMPUTED by `scripts/window_plan.py` (re-run after the round's last code
# change); the full rotation history and per-addition ledger live in
# WINDOWS.md — never hand-maintained here.
_DRIVER_WINDOW: tuple[str, ...] = (
    # flagship
    "agg_groupby",
    # --- 49 returners oldest-first (generated: scripts/window_plan.py).
    #     doc_quality + gopher_quality lead (the two r15 displacements),
    #     then the r11-record cohort in CORRECTNESS_r11.json order. The
    #     six r16-scheduled '-0.0'-normalized oracles (decontam_semantic,
    #     skew_profile, outlier_mad, trend_slope, collocations, knn_join)
    #     hold their natural slots — zero displacement; each earns its
    #     fresh row this round per the WINDOWS.md ledger rule. ---
    "doc_quality",
    "gopher_quality",
    "decontam_bloom",
    "chunk_documents",
    "quantize_int8",
    "cms_counts",
    "dedup_incremental_bloom",
    "source_overlap",
    "drift_numeric",
    "decontam_semantic",
    "weighted_sample",
    "snapshot_diff",
    "melt_metrics",
    "fuzzy_join",
    "skew_profile",
    "retrieval_eval",
    "outlier_mad",
    "drift_ks",
    "pagerank",
    "join_explosion",
    "rrf_hybrid",
    "fuzzy_clusters",
    "range_join_banded",
    "ohlc_bars",
    "trend_slope",
    "pagerank_weighted",
    "fuzzy_lookup",
    "apply_cdc",
    "zorder_stats",
    "dedup_stats",
    "dedup_keep_first",
    "doc_fingerprint",
    "norm_dedup_stats",
    "dedup_clusters",
    "knn_join",
    "wordcount",
    "vocab_coverage",
    "bpe_token_stats",
    "collocations",
    "pack_multimodal",
    "pandas_udf_tokens",
    "dedup_within_lag",
    "span_scrub",
    "substring_scrub",
    "string_funcs",
    "set_ops",
    "stratified_sample",
    "domain_filter",
    "text_stats",
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
