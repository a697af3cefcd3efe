"""Vector math over ``ArrayType`` columns via higher-order functions.

Reference surface: dask.array elementwise ufuncs and reductions
(SURVEY.md §2.9). We deliberately represent vectors as array columns (rows =
vectors) instead of rebuilding an ndarray engine; all math below is built-in
``aggregate`` / ``zip_with`` / ``transform`` — fully JVM-side, no Arrow
boundary, and it scales linearly with rows (no shuffle).

Precision note: fixture embeddings are float32; every function here casts to
double *first* so results match a double-precision oracle bit-for-bit
(sequential fold order is identical in Spark's ``aggregate`` and DuckDB's
``list_aggregate``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(arr: Column | str) -> Column:
    """Cast array<float> → array<double> elementwise."""
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two double arrays (sequential left fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def l2_normalize(a: Column) -> Column:
    """Unit-normalize; turns cosine similarity into plain dot product (and
    cosine NN into L2 NN — the trick the LSH path relies on)."""
    n = l2_norm(a)
    return F.transform(a, lambda x: x / n)


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
