"""Local-pandas interchange (reference surface: ``dd.from_pandas(pdf,
npartitions=k)`` — SURVEY.md §2.1). Arrow-accelerated in both directions."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..session import apply_runtime_confs


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
