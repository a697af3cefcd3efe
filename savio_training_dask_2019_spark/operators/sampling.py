"""Exact-quota stratified sampling operators.

Two implementations of the same semantics — keep exactly ``min(quota, |stratum|)``
rows per stratum, chosen by deterministic content-independent hash order:

- :func:`stratified_sample_exact` — the semantics anchor: one window
  partitioned by stratum, ``row_number`` in hash order. Rank state is O(1)
  and streams, but each stratum pays a full sort of ALL its rows.
- :func:`stratified_sample_cropped` — the 100 TB plan: crop each stratum
  first with an analytic hash threshold (so the sort only sees
  ~overshoot·quota rows per stratum), then re-rank the survivors exactly.

The hash is the top 60 bits of ``md5(id)`` as a signed-positive long —
uniform on [0, 2^60), stable across engines and retries, and
content-independent so re-crawls of the same document don't flip the
sample. Uniformity is what makes the crop analytic: the quota-th smallest
of n uniform hashes concentrates tightly around ``2^60 · quota/n``, so a
threshold of ``2^60 · overshoot · quota/n`` retains every row the exact
version picks except with probability ``exp(-quota·(overshoot-1)²/(2·overshoot))``
(Chernoff) — already ~1e-25 at quota=50, overshoot=4 — and the
differential test pins crop == exact on the fixtures. No quantile sketch,
no extra corpus pass: per-stratum counts are the only aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HASH_SPACE = 1 << 60  # _order_hash is uniform on [0, 2^60)


def _order_hash(id_col: str):
    # 15 hex chars = 60 bits: always positive in a signed long, full md5
    # diffusion, exactly reproducible in any engine with md5 + hex parsing
    return F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")


def stratified_sample_exact(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    quota: int,
) -> DataFrame:
    """Keep exactly ``min(quota, |stratum|)`` rows per stratum by hash
    order (ties broken by id). Adds an ``rk`` column (1..k within each
    stratum). One stratum-keyed shuffle + per-stratum sort of all rows —
    correct at any scale, expensive for huge strata (use the cropped
    variant there)."""
    w = Window.partitionBy(stratum_col).orderBy(_order_hash(id_col), id_col)
    return (
        df.select("*", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= quota)
    )


def stratified_sample_cropped(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    quota: int,
    overshoot: float = 4.0,
) -> DataFrame:
    """Same sample as :func:`stratified_sample_exact`, via the scale plan:

    1. per-stratum counts — one O(strata) aggregation;
    2. analytic per-stratum threshold ``2^60 · overshoot · quota / n``
       (strata with n <= overshoot·quota are never cropped at all);
    3. crop on the broadcast threshold dim — the per-stratum sort below
       now sees ~overshoot·quota rows instead of the full stratum;
    4. exact re-rank of the survivors (the anchor's window, same keys).

    Identical output to the exact form whenever each crop retains the true
    quota-th smallest hash; re-ranking survivors cannot reorder them (the
    ranking key is unchanged), so the only failure mode is an undershot
    crop, bounded by the Chernoff term in the module docstring."""
    h = _order_hash(id_col).alias("__h")
    hashed = df.select("*", h)
    n = F.count(F.lit(1))
    cutoff = float(overshoot) * quota
    thresholds = hashed.groupBy(stratum_col).agg(
        F.when(n <= F.lit(cutoff), F.lit((1 << 62)))
        .otherwise((F.lit(float(_HASH_SPACE) * cutoff) / n).cast("long"))
        .alias("__thr")
    )
    cropped = hashed.join(F.broadcast(thresholds), stratum_col).where(
        F.col("__h") <= F.col("__thr")
    )
    w = Window.partitionBy(stratum_col).orderBy("__h", id_col)
    return (
        cropped.select("*", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= quota)
        .drop("__h", "__thr")
    )
