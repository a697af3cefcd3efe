"""Streaming sources/sinks.

- ``rate_stream``: the built-in synthetic source (smoke tests, demos).
- ``file_stream``: parquet-directory tailing — the production pattern for
  micro-batched ingestion; ``maxFilesPerTrigger=1`` gives deterministic
  multi-batch replay in tests (each file = one micro-batch, so the watermark
  advances between files exactly like event-time progress in production).
- ``memory_sink``: collects results into an in-memory table for assertions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def file_stream(
    spark: SparkSession, path: str, schema: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def memory_sink(
    df: DataFrame, name: str, output_mode: str = "append", available_now: bool = True
) -> StreamingQuery:
    writer = df.writeStream.format("memory").queryName(name).outputMode(output_mode)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def foreach_batch_sink(
    df: DataFrame,
    handle,
    available_now: bool = True,
) -> StreamingQuery:
    """``foreachBatch`` — the escape hatch to any batch sink (JDBC upserts,
    multi-sink fanout, merge-into): ``handle(batch_df, batch_id)`` runs the
    full batch DataFrame API per micro-batch, with exactly-once via the
    checkpointed ``batch_id`` (a sink seeing a replayed id must idempotently
    skip or overwrite — e.g. write to ``path/batch_id=N`` with overwrite
    mode, never blind-append).

    At scale this is how a stream lands in a partitioned lakehouse table:
    each micro-batch is a normal distributed write, so the whole batch sink
    toolbox (partitionBy, maxRecordsPerFile, bucketing) applies unchanged."""
    writer = df.writeStream.foreachBatch(handle)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
