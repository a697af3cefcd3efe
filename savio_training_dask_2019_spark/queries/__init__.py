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

from . import pythonic, relational, textops, timeseries, vectorops

_MODULES = (relational, timeseries, textops, vectorops, pythonic)

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

__all__ = ["QUERIES", "ORACLE"]
