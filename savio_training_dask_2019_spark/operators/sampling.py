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


def _fresh_name(base: str, taken: set[str]) -> str:
    """A column name not already present in ``taken`` (prefix underscores
    until free, so caller frames that happen to carry ``__h``/``__thr``
    don't collide with the operator's scratch columns)."""
    while base in taken:
        base = "_" + base
    return base


class CropUndershootError(RuntimeError):
    """The analytic crop retained fewer than ``min(quota, |stratum|)`` rows
    for at least one stratum (probability ~``exp(-quota·(overshoot-1)²/
    (2·overshoot))`` per stratum — astronomically unlikely at sane
    parameters, but checkable via ``on_undershoot``)."""


def stratified_sample_cropped(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    quota: int,
    overshoot: float = 4.0,
    on_undershoot: str = "ignore",
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
    crop, bounded by the Chernoff term in the module docstring.

    ``on_undershoot`` makes that failure mode observable instead of silent:

    - ``"ignore"`` (default) — fully lazy, trust the bound;
    - ``"raise"`` — eagerly verify every stratum kept
      ``min(quota, |stratum|)`` survivors and raise
      :class:`CropUndershootError` otherwise (one extra O(strata)
      aggregation action at call time);
    - ``"exact"`` — same check, but fall back to
      :func:`stratified_sample_exact` instead of raising.

    Scratch columns are generated collision-free, so input frames that
    already contain ``__h``/``__thr`` pass through untouched."""
    if on_undershoot not in ("ignore", "raise", "exact"):
        raise ValueError(f"on_undershoot must be ignore|raise|exact, got {on_undershoot!r}")
    taken = set(df.columns)
    h_col = _fresh_name("__h", taken)
    thr_col = _fresh_name("__thr", taken | {h_col})
    n_col = _fresh_name("__n", taken | {h_col, thr_col})

    hashed = df.select("*", _order_hash(id_col).alias(h_col))
    n = F.count(F.lit(1))
    cutoff = float(overshoot) * quota
    thresholds = hashed.groupBy(stratum_col).agg(
        F.when(n <= F.lit(cutoff), F.lit((1 << 62)))
        .otherwise((F.lit(float(_HASH_SPACE) * cutoff) / n).cast("long"))
        .alias(thr_col),
        n.alias(n_col),
    )
    cropped = hashed.join(
        F.broadcast(thresholds.drop(n_col)), stratum_col
    ).where(F.col(h_col) <= F.col(thr_col))

    if on_undershoot != "ignore":
        survivors = cropped.groupBy(stratum_col).agg(
            F.count(F.lit(1)).alias(h_col)  # reuse scratch name for the count
        )
        short = (
            thresholds.join(survivors, stratum_col, "left")
            .where(
                F.coalesce(F.col(h_col), F.lit(0))
                < F.least(F.lit(quota), F.col(n_col))
            )
            .select(stratum_col)
            .limit(1)
            .collect()
        )
        if short:
            if on_undershoot == "raise":
                raise CropUndershootError(
                    f"analytic crop undershot quota={quota} for stratum "
                    f"{short[0][0]!r} (overshoot={overshoot}); rerun with a "
                    "larger overshoot or use stratified_sample_exact"
                )
            return stratified_sample_exact(df, stratum_col, id_col, quota)

    w = Window.partitionBy(stratum_col).orderBy(h_col, id_col)
    return (
        cropped.select("*", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= quota)
        .drop(h_col, thr_col)
    )


_ES_SPACE = float(_HASH_SPACE)  # 2^60 as double: u = hash / 2^60 in [0, 1)


def weighted_sample_exact(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    weight_col: str,
    quota: int,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, per stratum — Efraimidis &
    Spirakis 2006 ("Weighted random sampling with a reservoir", IPL 97(5)):
    each row draws u = the repo's 60-bit md5 uniform and ranks by
    u^(1/w) — computed in log space as ln(u)/w (monotone transform, avoids
    pow) — descending; the top ``quota`` per stratum are the sample, and
    P(selection) is proportional to weight. Same determinism contract as
    :func:`stratified_sample_exact`: content-independent, engine-
    reproducible anywhere with md5 (the DuckDB twin parses the same 15 hex
    chars), stable across retries and repartitions.

    Rows with weight <= 0 are EXCLUDED (zero weight = never sampled; the
    ES key is undefined there), mirroring the zero-mass rule of the
    weighted sketches. One stratum-keyed shuffle + per-stratum sort — the
    exact-tier cost model; crop by an analytic key threshold first (the
    stratified_sample_cropped pattern) if strata are huge."""
    u = _order_hash(id_col).cast("double") / F.lit(_ES_SPACE)
    key = F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(stratum_col).orderBy(F.desc(key), id_col)
    return (
        df.where(F.col(weight_col) > 0)
        .select("*", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= quota)
    )
