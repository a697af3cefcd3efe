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


def write_json_lines(
    df: DataFrame,
    path: str,
    mode: str = "error",
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> None:
    """JSON-lines sink — the write half of ``read_json_lines`` (the bag-style
    ``db.read_text → json.loads`` surface). One JSON object per line,
    splittable for re-ingest; ``compression='gzip'`` trades splittability for
    size (a gzip part is one task on re-read — prefer many modest parts)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
    mode: str = "error",
) -> None:
    """Bucketed (hash-pre-partitioned) managed table — the co-located-join
    layout for joins repeated on the same key: two tables bucketed on the
    join key with the same bucket count join with ZERO shuffle (verified by
    the plan test). At 100 TB this is the difference between re-shuffling a
    fact table per query and paying the layout cost once at write time.

    ``sort=True`` additionally sorts within buckets → sort-merge join needs
    no sort either.

    Catalog caveat: under the default in-memory catalog the table METADATA
    (including bucketing info) lives only as long as the SparkSession, while
    the files persist in ``spark.sql.warehouse.dir`` — a later session must
    either re-register the table or clear the orphaned location before
    rewriting (``saveAsTable`` refuses with LOCATION_ALREADY_EXISTS).
    Production deployments use a persistent metastore."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.format("parquet").saveAsTable(name)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "error",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink — same layout posture as parquet (columnar, predicate-
    pushdown-capable, splittable); provided because warehouse deployments
    standardized on ORC (Hive-era) read/write it natively in Spark with the
    identical writer surface."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc(spark, path: str) -> DataFrame:
    """ORC scan — vectorized reader, filter pushdown and column pruning
    apply exactly as for parquet (PushedFilters/ReadSchema in explain)."""
    return spark.read.orc(path)


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    mode: str = "error",
) -> None:
    """Range-partitioned, sorted-within-file parquet — the min/max-pruning
    layout for range/point predicates on the sort key: every output file
    covers a DISJOINT key range (repartitionByRange) and rows inside each
    file are sorted (sortWithinPartitions), so parquet footer statistics
    are tight and a pushed predicate skips whole files and row groups
    instead of scanning them.

    At 100 TB this is the cheap half of Z-ordering: one range shuffle at
    write time buys every subsequent time/key-range query a scan
    proportional to the selected range, not the table. Combine with
    ``partition_by`` on a coarse column (e.g. date) for directory-level
    pruning on top. ``repartitionByRange`` samples the key distribution,
    so skewed keys still yield balanced files."""
    part = (
        df.repartitionByRange(n_files, *sort_cols)
        if n_files
        else df.repartitionByRange(*sort_cols)
    )
    part.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)
