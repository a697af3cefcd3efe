"""Stratified-sampling operator tests: the cropped 100 TB plan must
reproduce the exact window anchor bit-for-bit, and both must hit quotas."""

from __future__ import annotations

from pyspark.sql import functions as F

from savio_training_dask_2019_spark.operators import (
    stratified_sample_cropped,
    stratified_sample_exact,
)
from savio_training_dask_2019_spark.sources import load_table


def _as_rows(df):
    return sorted(tuple(r) for r in df.select("doc_id", "lang", "rk").collect())


def test_cropped_equals_exact_on_fixture_strata(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = stratified_sample_exact(docs, "lang", "doc_id", quota=37)
    cropped = stratified_sample_cropped(docs, "lang", "doc_id", quota=37)
    assert _as_rows(cropped) == _as_rows(exact)


def test_cropped_equals_exact_when_quota_exceeds_strata(spark, sf_dir):
    """Strata smaller than the quota take the never-crop branch and come
    back whole."""
    docs = load_table(spark, sf_dir, "documents")
    sizes = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    quota = max(sizes.values()) + 10
    cropped = stratified_sample_cropped(docs, "lang", "doc_id", quota=quota)
    assert cropped.count() == sum(sizes.values())
    assert _as_rows(cropped) == _as_rows(
        stratified_sample_exact(docs, "lang", "doc_id", quota=quota)
    )


def test_crop_actually_shrinks_the_sort_input(spark, sf_dir):
    """The crop must be a real reduction: survivors per stratum land near
    overshoot*quota, far below the stratum size (this is the whole point —
    the per-stratum sort sees ~quota rows, not the corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    quota, overshoot = 5, 4.0
    # replicate steps 1-3 of the cropped plan to measure the survivor set
    from savio_training_dask_2019_spark.operators.sampling import (
        _HASH_SPACE,
        _order_hash,
    )

    hashed = docs.select("lang", "doc_id", _order_hash("doc_id").alias("h"))
    n = F.count(F.lit(1))
    thr = hashed.groupBy("lang").agg(
        F.when(n <= quota * overshoot, F.lit(1 << 62))
        .otherwise((F.lit(float(_HASH_SPACE) * quota * overshoot) / n).cast("long"))
        .alias("thr")
    )
    survivors = (
        hashed.join(F.broadcast(thr), "lang")
        .where(F.col("h") <= F.col("thr"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    sizes = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(n.alias("n")).collect()}
    for r in survivors.collect():
        if sizes[r["lang"]] > quota * overshoot:
            assert r["k"] >= quota  # crop never undershoots the quota
            assert r["k"] < sizes[r["lang"]] / 2  # and is a real reduction


def test_cropped_scratch_columns_survive_collisions(spark, sf_dir):
    """Input frames that already carry __h/__thr columns must pass through
    untouched — the operator generates collision-free scratch names."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.lit(7).alias("__h"), F.lit("x").alias("__thr")
    )
    out = stratified_sample_cropped(docs, "lang", "doc_id", quota=11)
    assert set(out.columns) == {"doc_id", "lang", "__h", "__thr", "rk"}
    rows = out.collect()
    assert rows and all(r["__h"] == 7 and r["__thr"] == "x" for r in rows)
    plain = stratified_sample_cropped(
        docs.drop("__h", "__thr"), "lang", "doc_id", quota=11
    )
    assert sorted((r["doc_id"], r["rk"]) for r in rows) == sorted(
        (r["doc_id"], r["rk"]) for r in plain.collect()
    )


def test_cropped_undershoot_check_modes(spark, sf_dir):
    """on_undershoot='raise'/'exact' verify per-stratum survivor counts; on
    the healthy fixture both modes return the exact sample, and a rigged
    sub-quota overshoot triggers the raise / the exact fallback."""
    import pytest

    from savio_training_dask_2019_spark.operators.sampling import (
        CropUndershootError,
    )

    docs = load_table(spark, sf_dir, "documents")
    checked = stratified_sample_cropped(
        docs, "lang", "doc_id", quota=23, on_undershoot="raise"
    )
    assert _as_rows(checked) == _as_rows(
        stratified_sample_exact(docs, "lang", "doc_id", quota=23)
    )
    # overshoot < 1 makes the analytic threshold admit < quota rows in
    # expectation, so the check must fire on any non-tiny stratum
    with pytest.raises(CropUndershootError):
        stratified_sample_cropped(
            docs, "lang", "doc_id", quota=50, overshoot=0.1, on_undershoot="raise"
        )
    fallback = stratified_sample_cropped(
        docs, "lang", "doc_id", quota=50, overshoot=0.1, on_undershoot="exact"
    )
    assert _as_rows(fallback) == _as_rows(
        stratified_sample_exact(docs, "lang", "doc_id", quota=50)
    )
    with pytest.raises(ValueError):
        stratified_sample_cropped(
            docs, "lang", "doc_id", quota=5, on_undershoot="bogus"
        )


# --- Efraimidis-Spirakis weighted sampling ------------------------------------


def test_weighted_sample_proportional_selection(spark):
    """500 two-item strata, weights 100 vs 1, quota 1: the heavy item must
    win ~100/101 of strata (deterministic given the md5 keys — measured
    once, pinned forever at a loose >= 0.9)."""
    from savio_training_dask_2019_spark.operators.sampling import (
        weighted_sample_exact,
    )

    rows = []
    for s in range(500):
        rows.append((2 * s, f"s{s}", 100))      # heavy
        rows.append((2 * s + 1, f"s{s}", 1))    # light
    df = spark.createDataFrame(rows, "doc_id long, stratum string, w long")
    got = weighted_sample_exact(df, "stratum", "doc_id", "w", 1).collect()
    assert len(got) == 500  # exactly one per stratum
    heavy_wins = sum(1 for r in got if r["doc_id"] % 2 == 0)
    assert heavy_wins >= 450, heavy_wins  # expected ~495


def test_weighted_sample_without_replacement_and_weight_rules(spark):
    """Quota caps each stratum at min(quota, eligible rows); rows with
    weight <= 0 can never be sampled; rk is 1..k dense; the sample is
    repartition-independent (deterministic keys)."""
    from savio_training_dask_2019_spark.operators.sampling import (
        weighted_sample_exact,
    )

    rows = [
        (1, "a", 10), (2, "a", 5), (3, "a", 1), (4, "a", 0), (5, "a", -3),
        (6, "b", 7),
    ]
    df = spark.createDataFrame(rows, "doc_id long, stratum string, w long")
    got = weighted_sample_exact(df, "stratum", "doc_id", "w", 2).collect()
    by_s = {}
    for r in got:
        by_s.setdefault(r["stratum"], []).append(r)
    assert len(by_s["a"]) == 2 and len(by_s["b"]) == 1
    assert all(r["doc_id"] not in (4, 5) for r in got)  # non-positive excluded
    assert sorted(r["rk"] for r in by_s["a"]) == [1, 2]

    a = sorted(map(tuple, got))
    b = sorted(
        map(
            tuple,
            weighted_sample_exact(
                df.repartition(7), "stratum", "doc_id", "w", 2
            ).collect(),
        )
    )
    assert a == b
