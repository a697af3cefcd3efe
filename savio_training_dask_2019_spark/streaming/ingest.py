"""Streaming incremental corpus ingestion — the continuous twin of the
batch ``dedup_incremental`` query (queries/llmpipe.py): new documents
arrive as a stream and are admitted only if their content hash is novel
both against the historical corpus SNAPSHOT and within the stream so far.

Scale design:

- The snapshot side is STATIC (a batch DataFrame over the corpus's hash
  index). Stream-static joins never buffer the static side in state —
  Spark re-plans it per micro-batch, so snapshot size is a scan/join cost,
  not a state cost. At 100 TB keep the snapshot as a bucketed hash-only
  table (8 bytes/row) so the per-batch anti-join is a pruned scan, and
  rebuild/compact it from the ingested output on a schedule.
- ``dropDuplicates`` on the hash holds one state row PER DISTINCT HASH
  EVER SEEN — the correct semantics for corpus identity (a duplicate is a
  duplicate forever), and the state row is just the 8-byte hash plus
  bookkeeping. If the operational bound matters more than perfect
  identity, pass ``within_watermark`` and a ``ts`` column to use
  ``dropDuplicatesWithinWatermark`` — state then expires with the
  watermark and only near-in-time duplicates are caught (the snapshot
  anti-join still catches everything older than the last compaction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_ingest(
    stream_docs: DataFrame,
    snapshot: DataFrame,
    text_col: str = "text",
    within_watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Admit only novel documents from ``stream_docs`` (a streaming
    DataFrame): drop rows whose ``xxhash64(text_col)`` already occurs in
    the static ``snapshot`` (anti-join) or earlier in the stream
    (keep-first). Returns a streaming DataFrame of admitted docs.

    ``within_watermark``: optional delay string (e.g. ``"10 minutes"``) —
    bounds dedup state via ``dropDuplicatesWithinWatermark`` on ``ts_col``
    instead of keeping every hash forever (see module docstring for the
    trade-off)."""
    hashed = stream_docs.withColumn("__h", F.xxhash64(F.col(text_col)))
    snap = snapshot.select(F.xxhash64(F.col(text_col)).alias("__h")).distinct()
    novel = hashed.join(snap, "__h", "left_anti")
    if within_watermark is not None:
        novel = novel.withWatermark(ts_col, within_watermark)
        deduped = novel.dropDuplicatesWithinWatermark(["__h"])
    else:
        deduped = novel.dropDuplicates(["__h"])
    return deduped.drop("__h")
