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

from pyspark.sql import DataFrame, Window
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


def debounce(
    df: DataFrame,
    keys: Sequence[str],
    ts: str = "ts",
    lag_seconds: int = 1800,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Bounded-event-lag dedup, batch-deterministic: drop a row when the
    PREVIOUS row with the same ``keys`` (event-time order, ties broken by
    ``order_tiebreak``) lies within ``lag_seconds`` — the classic debounce
    of retransmitted/double-fired events, and the deterministic batch twin
    of :func:`dedup_within_watermark`'s state model (suppression state per
    key is one timestamp, bounded exactly like the streaming op's
    watermark-horizon state; the streaming op keys on the first KEPT copy
    while this keys on the previous OBSERVED copy — documented difference,
    each deterministic on its own terms).

    Scale: one shuffle on ``keys``; the window carries O(1) state (lag 1),
    so partitions stream — no per-key buffering. Exactly the plan a
    100 TB click-debounce wants."""
    order = [F.col(ts)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(*[F.col(c) for c in keys]).orderBy(*order)
    prev = F.lag(ts).over(w)
    # interval arithmetic (not numeric casts): works for TIMESTAMP and
    # TIMESTAMP_NTZ alike, and matches the oracle's epoch() difference
    return (
        df.withColumn("_prev_ts", prev)
        .where(
            F.col("_prev_ts").isNull()
            | (F.col(ts) > F.col("_prev_ts") + F.expr(f"INTERVAL {int(lag_seconds)} SECONDS"))
        )
        .drop("_prev_ts")
    )


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
