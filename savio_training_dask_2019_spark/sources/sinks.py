"""Sinks (reference surface: ``df.to_parquet(path)`` / ``df.to_csv('out-*')``
— SURVEY.md §2.1).

Scale posture: Parquet with explicit ``partition_by`` layout is the only sink
we'd use at 100 TB; CSV is provided for parity with the training material.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "error",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "error", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)
