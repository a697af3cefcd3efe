"""Batch/streaming-agnostic windowed aggregations.

Each helper takes any DataFrame — batch or streaming — and returns the
windowed aggregation; Structured Streaming's incrementalization is free
because the plan is declarative. Watermarking is the only streaming-specific
knob and is applied by the caller (``with_watermark``) so the batch twin
stays oracle-checkable.

At scale: windowed aggs shuffle once on (window, keys); state-store size is
bounded by (watermark horizon / slide) × key cardinality, which is why the
watermark is mandatory for unbounded sources in production.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts: str, delay: str) -> DataFrame:
    """Late-data bound: rows older than ``max(event_time) - delay`` are
    dropped and window state older than the horizon is evicted."""
    return df.withWatermark(ts, delay)


def dedup_within_watermark(
    df: DataFrame, keys: Sequence[str], ts: str = "ts", delay: str = "30 minutes"
) -> DataFrame:
    """Streaming dedup: keep the first row per key, with state bounded by
    the watermark horizon (keys older than the horizon are evicted, so a
    re-delivered event outside the window is NOT deduped — the standard
    at-least-once → effectively-once compromise). On a batch DataFrame this
    degrades to plain dropDuplicates semantics over the whole input."""
    if df.isStreaming:
        return df.withWatermark(ts, delay).dropDuplicatesWithinWatermark(list(keys))
    return df.dropDuplicates(list(keys))


def tumbling_counts(
    df: DataFrame, ts: str = "ts", duration: str = "6 hours",
    keys: Sequence[str] = (),
) -> DataFrame:
    w = F.window(ts, duration)
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"),
                *keys, "n_events")
    )


def sliding_counts(
    df: DataFrame, ts: str = "ts", duration: str = "1 hour",
    slide: str = "30 minutes", keys: Sequence[str] = (),
) -> DataFrame:
    w = F.window(ts, duration, slide)
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("w_start"), *keys, "n_events")
    )


def session_counts(
    df: DataFrame, ts: str = "ts", gap: str = "30 minutes",
    keys: Sequence[str] = ("user_id",),
) -> DataFrame:
    sw = F.session_window(ts, gap)
    return (
        df.groupBy(sw.alias("sw"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("sw.start").alias("session_start"), *keys, "n_events")
    )
