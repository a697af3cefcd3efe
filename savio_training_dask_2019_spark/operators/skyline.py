"""2-D skyline (Pareto frontier) — the multi-objective "best tradeoffs"
operator (Börzsönyi, Kossmann & Stocker, ICDE 2001 "The Skyline
Operator"): keep every row not STRICTLY dominated, where row B dominates
row A when B is no worse on both objectives and better on at least one
(here: ``x`` minimized, ``y`` maximized). Duplicate frontier points all
survive (dominance requires a strict edge).

The naive formulation is a quadratic NOT-EXISTS self-join — which is
exactly what the DuckDB oracle runs, making the check a genuinely
different algorithm from the implementation. The Spark plan is the
sort-based sweep: within each group, a row is dominated iff

    max(y over rows with x' <  x)  >= y      (strictly cheaper, not worse)
 or max(y over rows with x' == x)  >  y      (same cost, strictly better)

— two group-partitioned windows (a RANGE frame ending 1 below the current
``x`` and a (group, x) partition max), one filter. O(n log n) per group
instead of O(n²), no join, no explode; with integer objectives the result
is exact and engine-identical (set semantics — no tie-break needed at
all, because the output is a SET the dominance predicate fully
determines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_front_2d(
    df: DataFrame,
    group_cols: "list[str]",
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Rows of ``df`` on the per-group Pareto frontier of (minimize
    ``x_col``, maximize ``y_col``). Both objective columns must be
    integer-typed (the exactness contract); all input columns pass
    through. NULL objectives are dropped (a NULL is incomparable, not
    dominant)."""
    clean = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    w_lt = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(x_col).asc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_eq = Window.partitionBy(*group_cols, x_col)
    best_cheaper = F.max(F.col(y_col)).over(w_lt)
    best_same = F.max(F.col(y_col)).over(w_eq)
    return (
        clean.withColumn("__blt", best_cheaper)
        .withColumn("__beq", best_same)
        .where(
            (F.col("__blt").isNull() | (F.col("__blt") < F.col(y_col)))
            & (F.col("__beq") == F.col(y_col))
        )
        .drop("__blt", "__beq")
    )


def pareto_oracle_sql(src_sql: str, final_sql: str) -> str:
    """DuckDB twin in the DEFINITIONAL quadratic form — a strictly
    different algorithm from the window sweep, so agreement checks the
    semantics, not the implementation. ``src_sql`` must select columns
    ``g`` (group), ``x``, ``y`` plus whatever ``final_sql`` projects."""
    return f"""WITH t AS ({src_sql})
{final_sql}
FROM t a WHERE NOT EXISTS (
  SELECT 1 FROM t b
  WHERE b.g = a.g AND b.x <= a.x AND b.y >= a.y
    AND (b.x < a.x OR b.y > a.y)
)"""
