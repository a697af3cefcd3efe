"""Text / CSV / JSON-lines scans (reference surface: ``dd.read_csv('201*.csv',
blocksize=...)`` and ``db.read_text(...).map(json.loads)`` — SURVEY.md §2.1,
§2.10).

Spark handles glob expansion and split sizing natively
(``spark.sql.files.maxPartitionBytes`` replaces Dask's ``blocksize``). The
dask.bag "read text then json.loads" pattern becomes either
``spark.read.json`` (schema inference) or — the scale path — ``read.text``
plus ``from_json`` with an explicit schema, which stays fully JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..session import apply_runtime_confs


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    **options,
) -> DataFrame:
    """CSV scan. Explicit ``schema`` strongly preferred at scale — Dask's
    head-of-file dtype inference (and its mid-file dtype-mismatch failure mode
    the training warns about) is exactly what an explicit StructType avoids.
    """
    apply_runtime_confs(spark)
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.options(**options).csv(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """``db.read_text`` equivalent: one string column ``value`` per line."""
    apply_runtime_confs(spark)
    return spark.read.text(path)


def read_json_lines(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """``db.read_text(...).map(json.loads)`` equivalent, JVM-side."""
    apply_runtime_confs(spark)
    if schema is not None:
        return spark.read.schema(schema).json(path)
    return spark.read.json(path)


def parse_json_column(df: DataFrame, col: str, schema: StructType | str) -> DataFrame:
    """Parse a JSON-string column into a struct column ``{col}_parsed``
    (fixture driver: ``events.props``)."""
    return df.withColumn(f"{col}_parsed", F.from_json(F.col(col), schema))
