"""Local-pandas interchange (reference surface: ``dd.from_pandas(pdf,
npartitions=k)`` — SURVEY.md §2.1). Arrow-accelerated in both directions."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..session import apply_runtime_confs


def from_iterator(
    spark: SparkSession,
    rows,
    schema: str,
    npartitions: int = 1,
) -> DataFrame:
    """``dd.from_delayed``-style custom source (SURVEY.md §2.1): build a
    DataFrame from an arbitrary Python iterable of row tuples/dicts with an
    explicit DDL schema, sliced across ``npartitions``.

    The iterable is drained on the DRIVER (it's a local-object source, like
    from_delayed's list of delayed partitions) and shipped via
    ``sparkContext.parallelize`` — so this is for seed/config/test data, not
    bulk ingest; bulk data belongs in a file/table source where executors
    read in parallel. An explicit schema is required: inference would make
    the source's output type depend on the data sample."""
    apply_runtime_confs(spark)
    data = list(rows)
    if not data:
        return spark.createDataFrame([], schema)
    rdd = spark.sparkContext.parallelize(data, max(1, min(npartitions, len(data))))
    return spark.createDataFrame(rdd, schema)


def from_pandas(
    spark: SparkSession, pdf: pd.DataFrame, npartitions: int | None = None
) -> DataFrame:
    """``dd.from_pandas`` equivalent. ``npartitions`` maps to a repartition —
    only do this for dataframes that are about to fan out into heavy work;
    a broadcast-sized dim table should stay single-partition."""
    apply_runtime_confs(spark)
    df = spark.createDataFrame(pdf)
    if npartitions is not None:
        df = df.repartition(npartitions)
    return df
