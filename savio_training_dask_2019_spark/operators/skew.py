"""Skew mitigation (SURVEY.md §4 / SCALING.md): salting for hot keys.

AQE's skew-join splitting handles most skew automatically (enabled in
session.py); these helpers cover the two cases AQE cannot:

- **skewed aggregation** with high-cardinality accumulators (e.g. exact
  distinct per key): two-phase salted aggregation spreads one hot key over
  ``n_salts`` reducers, then combines.
- **broadcast-infeasible skewed join** where one specific key dominates:
  replicate the small side per salt so the hot key's rows spread evenly.

Both are pure DataFrame rewrites — deterministic results, one extra narrow
map for the salt column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key_cols: Sequence[str], n_salts: int = 16) -> DataFrame:
    """Deterministic salt in [0, n_salts) that spreads a hot key's rows by
    hashing the row's NON-key attributes (xxhash64). Two rows of the same hot
    key with any differing attribute land in different buckets, and identical
    input rows always hash identically — stable under task retry (no
    ``rand()``/``monotonically_increasing_id``, which are indeterminate
    across stage re-attempts and can double-count on shuffle replays).

    Residual limitation (by design): rows that are *fully identical
    duplicates* — same key AND same non-key attributes — collide on one salt
    and are not spread. Exact-duplicate count skew needs a dedup or a
    count-pre-aggregation first; see SCALING.md. If every column is a key
    column the salt degenerates to hash-of-key (one bucket per key value)."""
    others = [c for c in df.columns if c not in set(key_cols)]
    basis = others or list(df.columns)
    return df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in basis]), F.lit(n_salts))
    )


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    agg_exprs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: groupBy(keys + salt) partial →
    groupBy(keys) final. Supported aggs (must be re-combinable): sum, count,
    min, max.

    For the algebraic aggs Catalyst already does map-side partial agg, so
    this only wins when a single reducer key is the bottleneck — i.e. one
    group receives a large fraction of all rows AND the per-group state is
    non-trivial. Measure before using; SCALING.md covers when AQE suffices."""
    combine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for agg in agg_exprs.values():
        if agg not in combine:
            raise ValueError(f"agg {agg!r} not re-combinable; use sum/count/min/max")

    salted = with_salt(df, key_cols, n_salts)
    partial = salted.groupBy(*key_cols, "__salt").agg(
        *[
            (F.count(F.lit(1)) if agg == "count" else getattr(F, agg)(col)).alias(
                f"__p_{col}_{agg}"
            )
            for col, agg in agg_exprs.items()
        ]
    )
    return partial.groupBy(*key_cols).agg(
        *[
            combine[agg](f"__p_{col}_{agg}").alias(f"{col}_{agg}")
            for col, agg in agg_exprs.items()
        ]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the skewed side, replicate the small side
    once per salt value, join on (key, salt). The hot key's rows land on
    ``n_salts`` reducers instead of one. Cost: small side shuffles
    ``n_salts``× its size — use only when the small side is modest and the
    skew is real (otherwise plain broadcast or AQE wins).

    Only skewed-side-preserving joins are safe: with ``right``/``full``,
    unmatched small-side rows were replicated ``n_salts`` times and would
    appear ``n_salts`` times in the output, so those are rejected."""
    safe = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
            "left_anti", "leftanti", "semi", "anti"}
    if how not in safe:
        raise ValueError(
            f"salted_join how={how!r} unsupported: the small side is replicated "
            f"per salt, so only skewed-side-preserving joins are correct ({sorted(safe)})"
        )
    s = with_salt(skewed, [on], n_salts)
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    out = s.join(replicated, [on, "__salt"], how)
    return out.drop("__salt")
