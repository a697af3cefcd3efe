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
    # --- 49 returners oldest-first (generated: scripts/window_plan.py,
    #     r18 — a pure rotation, no --rewindow members: DEFERRED emptied
    #     in r17 and no oracle changed this round. The five r17
    #     displacements lead (pii_redact, ccnet_bands, dedup_keep_best,
    #     mixture_weights, dedup_incremental — r12 rows), then
    #     split_leakage (r12) and the r13-record cohort in
    #     CORRECTNESS_r13.json order. Displaced to the r19 returner
    #     front: topk, window_rank (r13), then the r14 cohort. ---
    "pii_redact",
    "ccnet_bands",
    "dedup_keep_best",
    "mixture_weights",
    "dedup_incremental",
    "split_leakage",
    "group_cms_counts",
    "gap_fill",
    "transition_matrix",
    "basket_pairs",
    "weighted_median",
    "chi2_abtest",
    "activity_streaks",
    "null_profile",
    "ref_integrity",
    "conversion_lag",
    "heaps_curve",
    "session_stats",
    "degree_histogram",
    "sparse_cosine_pairs",
    "cohort_ltv",
    "abc_by_brand",
    "backlog_monthly",
    "market_hhi",
    "late_shipment_rate",
    "semi_join",
    "distinct_approx",
    "json_extract",
    "time_bucket",
    "decontam_check",
    "semdedup_clusters",
    "hll_sketch_union",
    "kll_quantiles",
    "rolling_fp",
    "svd_embeddings",
    "multimodal_resize",
    "multimodal_frames",
    "bpe_apply",
    "select_filter",
    "derived_column",
    "null_handling",
    "sample_mod",
    "sort_limit",
    "cross_join",
    "cumsum",
    "lag_lead",
    "tumbling_window",
    "distinct",
    "emb_near_dup",
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
