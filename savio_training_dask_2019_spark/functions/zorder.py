"""Z-order (Morton) keys — the multi-dimensional data-skipping layout
(Delta Lake's OPTIMIZE ZORDER, Hudi clustering): interleaving the bits of
two sort dimensions gives ONE sort key whose ranges bound BOTH dimensions,
so min/max file statistics prune on either column — a plain lexicographic
sort only prunes its leading column. Writing 100 TB of (customer, date)
parquet sorted by morton(customer_bucket, date_bucket) lets queries
filtering on EITHER key skip most files.

The spread/interleave is the classic magic-number bit dance (Morton 1966;
public-domain "Interleave bits by Binary Magic Numbers" — Stanford
bit-twiddling hacks), expressed in pure Catalyst integer ops (shiftleft /
bitwise and/or with LITERAL shift counts, no UDF) so the key computation is
whole-stage-codegen and bit-identical on any engine with 64-bit integers —
the DuckDB oracle runs the same expression text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 16-bit spread masks (x -> one empty bit between every data bit)
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread_expr(col_sql: str) -> str:
    """SQL text spreading the low 16 bits of ``col_sql`` onto even bit
    positions (identical text runs on Spark and DuckDB).

    The mask step casts to BIGINT first: without it an INT input keeps the
    whole interleave in 32-bit arithmetic on Spark, and any masked value
    with bit 15 set (>= 32768, or any negative int) overflows INT32 at the
    final ``spread(y) * 2`` — silently wrapping negative on Spark while a
    64-bit engine stays positive, breaking the bit-identical contract
    (ADVICE r10). Widening at the mask keeps every later op in 64-bit on
    both engines."""
    e = f"((CAST(({col_sql}) AS BIGINT)) & 65535)"
    for sh, mask in _SPREAD:
        e = f"(({e} | ({e} * {1 << sh})) & {mask})"
    return e


def morton_key_sql(x_sql: str, y_sql: str) -> str:
    """SQL text for the 32-bit Morton key of two 16-bit nonneg ints:
    x occupies even bits, y odd bits. Multiplication by powers of two is
    used instead of << so the same text parses on both engines."""
    return f"({_spread_expr(x_sql)} | ({_spread_expr(y_sql)} * 2))"


def morton_key(x_sql: str, y_sql: str) -> Column:
    """Catalyst column: Morton key of two 16-bit bucket ids (values are
    masked to 16 bits — callers bucket wider domains first). Takes SQL
    expression TEXT (not Column objects) so the identical text can be
    mirrored into an engine oracle; pure integer expression, whole-stage
    codegen, no Python boundary."""
    return F.expr(morton_key_sql(x_sql, y_sql))
