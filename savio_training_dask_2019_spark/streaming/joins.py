"""Stream-stream joins (Structured Streaming's stateful two-input operator).

A stream-stream equi-join buffers BOTH sides in the state store until the
watermark proves no more matches can arrive. Unbounded state is the failure
mode at scale; the interval condition below is what bounds it:

- both inputs carry a watermark, and
- the join condition constrains the two event times to a finite interval
  (``right.ts BETWEEN left.ts AND left.ts + horizon``),

so each side's state is (watermark delay + horizon) × arrival rate, evicted
continuously. Without the time bound Spark must keep every row forever (and
outer joins would never emit their unmatched rows).

Batch DataFrames run through the identical function — the interval join is
the same declarative plan, which keeps the semantics oracle-checkable (see
tests: streaming result == batch twin on the same rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    horizon: str = "10 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``right`` that occur within ``[left_ts, left_ts +
    horizon]`` for the same ``on`` key — the clicks-after-view shape.

    Column layout out: key, ``l_ts``, ``r_ts`` (+ remaining columns from
    both sides suffixed ``_l``/``_r`` where names collide). On streaming
    inputs both sides are watermarked here; on batch inputs the watermark
    is a no-op wrapper and the plan is a plain range-condition join.
    """
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    l = lw.select(
        F.col(on), F.col(left_ts).alias("l_ts"), *[
            F.col(c).alias(f"{c}_l")
            for c in left.columns
            if c not in (on, left_ts)
        ]
    )
    r = rw.select(
        F.col(on).alias("__rk"), F.col(right_ts).alias("r_ts"), *[
            F.col(c).alias(f"{c}_r")
            for c in right.columns
            if c not in (on, right_ts)
        ]
    )
    cond = (
        (l[on] == r["__rk"])
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return l.join(r, cond, how).drop("__rk")
