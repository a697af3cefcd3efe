"""Differential tests (SURVEY.md §5 primary strategy): every oracle-backed
queries() entry must produce exactly the DuckDB oracle's result at sf0.001 —
same columns, same row count, same values under order-insensitive comparison.
This is the developer-loop twin of the driver's sf0.01 gate."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from check_correctness import canon_cell, canon_df, dtype_kind  # noqa: E402

from savio_training_dask_2019_spark import queries as catalog  # noqa: E402

ORACLE_BACKED = sorted(catalog.ORACLE)
ROWS_ONLY = sorted(catalog.QUERIES.keys() - catalog.ORACLE.keys())


@pytest.mark.parametrize("name", ORACLE_BACKED)
def test_matches_oracle(name, spark, duck, sf_dir):
    sdf = catalog.QUERIES[name](spark, sf_dir).toPandas()
    odf = duck.execute(catalog.ORACLE[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    for c in sdf.columns:
        ks, ko = dtype_kind(sdf[c]), dtype_kind(odf[c])
        assert {ks, ko} != {"int", "float"}, (
            f"{name}: col {c} spark={ks} oracle={ko} — an uncast DuckDB sum()? "
            "HUGEINT widens to float64 and fails the driver's value hash"
        )
    a, b = canon_df(sdf), canon_df(odf)
    assert a == b, f"{name}: first diffs {[(x, y) for x, y in zip(a, b) if x != y][:3]}"


def test_checker_is_dtype_strict():
    """Regression test for the checker itself: the r3 driver failures
    (gopher_quality et al.) were int64-vs-float64 rows that the old canon
    collapsed (3.0 -> "3") and passed locally.  Pin that 3.0 and 3 now
    canonicalize differently and that dtype_kind flags the column class."""
    import pandas as pd

    assert canon_cell(3.0) != canon_cell(3)
    assert canon_cell(3.0) == "3.0"
    a = canon_df(pd.DataFrame({"n": pd.array([3], dtype="int64")}))
    b = canon_df(pd.DataFrame({"n": pd.array([3.0], dtype="float64")}))
    assert a != b  # the exact r3 failure class, now caught locally
    ks = dtype_kind(pd.Series([3], dtype="int64"))
    ko = dtype_kind(pd.Series([3.0], dtype="float64"))
    assert {ks, ko} == {"int", "float"}


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_dir):
    df = catalog.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0  # runs and has a stable schema
    assert df.columns


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_unpivot_melt_matches_duckdb(spark, duck, sf_dir):
    """pandas/dask melt surface via Spark's native DataFrame.unpivot —
    differential-checked against the equivalent UNION ALL."""
    from pyspark.sql import functions as F

    from savio_training_dask_2019_spark.sources import load_table

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_size").cast("double").alias("p_size"), "p_retailprice"
    )
    sdf = p.unpivot(
        "p_partkey", ["p_size", "p_retailprice"], "metric", "value"
    ).toPandas()
    odf = duck.execute(
        """SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
           UNION ALL
           SELECT p_partkey, 'p_retailprice', p_retailprice FROM part"""
    ).df()
    assert len(sdf) == len(odf)
    assert canon_df(sdf) == canon_df(odf)
