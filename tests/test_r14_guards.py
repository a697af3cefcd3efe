"""r14 regression pins (VERDICT r13 #2 + ADVICE r13).

1. survival_curve non-vacuity: the r13 judge found the old fixed 14-day
   censoring cutoff produced 0 rows on BOTH engines at every SF — an
   oracle row that certified nothing. The fixture-adaptive mean-gap rule
   must keep the curve non-empty on the real fixtures (the repo's
   planted convention: every branch fires at every SF).
2. welch_ttest exact constant-side guard: past 2^53 the double-assembled
   variance of a CONSTANT side lands tiny-nonzero (measured: v1 = -256.0
   at cents ~1e9), so the old ``se2 == 0.0`` test missed it and
   sqrt(negative) produced NaN t. The exact DECIMAL(38,0) moment identity
   (n*q = s^2) must yield NULL instead.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_survival_curve_nonvacuous_on_fixtures(spark, sf):
    from savio_training_dask_2019_spark.queries.timeseries import (
        q_survival_curve,
    )

    rows = q_survival_curve(spark, f"/root/testdata/{sf}").collect()
    assert rows, f"survival_curve is vacuous again at {sf} (0 death weeks)"
    for r in rows:
        assert r["deaths"] >= 1
        assert 1 <= r["deaths"] <= r["n_at_risk"]
        assert 0.0 <= r["survival"] < 1.0  # a death week always steps S down


def test_negative_zero_rounding_convention_pin(spark):
    """Pins the engine behavior the oracle '+ 0.0' convention exists for:
    DuckDB's round KEEPS the sign of a tiny negative (-0.0); Spark's
    BigDecimal round DROPS it (+0.0); and '+ 0.0' normalizes DuckDB's to
    match. If a DuckDB or Spark upgrade changes either side, this fails
    before a knife-edge oracle row does."""
    import duckdb

    raw, fixed = duckdb.connect().execute(
        "SELECT round(-1e-9, 6), round(-1e-9, 6) + 0.0"
    ).fetchone()
    assert math.copysign(1.0, raw) == -1.0, "DuckDB round no longer keeps -0.0"
    assert math.copysign(1.0, fixed) == 1.0, "'+ 0.0' no longer normalizes"

    from pyspark.sql import functions as F

    [row] = spark.range(1).select(F.round(F.lit(-1e-9), 6).alias("v")).collect()
    assert row["v"] == 0.0 and math.copysign(1.0, row["v"]) == 1.0, (
        "Spark round now emits -0.0 — the oracle convention must be revisited"
    )


def _write_events(d, rows):
    d.mkdir(exist_ok=True)
    pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": 1,
            "event_type": [t for t, _ in rows],
            "value": [v for _, v in rows],
            "props": "{}",
        }
    ).to_parquet(d / "events.parquet")


def test_welch_constant_sides_past_2pow53_null_not_nan(spark, tmp_path):
    """Two constant types whose cents are ~1e9: q = 3*c^2 ≈ 3e18, so the
    double assembly of v1/v2 is past 2^53 and lands tiny-NEGATIVE
    (se2 = -85.33 measured for these exact values) — the pre-r14
    ``se2 == 0.0`` guard let that through to sqrt() as NaN. The exact
    DECIMAL moment guard must return NULL t/df, and the means must still
    report."""
    d = tmp_path / "big_const"
    _write_events(
        d,
        [("A", 10000000.33)] * 3 + [("B", 10000007.77)] * 3,
    )
    from savio_training_dask_2019_spark.queries.relational import q_welch_ttest

    got = {
        r["event_type"]: (r["n"], r["mean_val"], r["t_welch"], r["df_welch"])
        for r in q_welch_ttest(spark, str(d)).collect()
    }
    assert set(got) == {"A", "B"}
    for t, (n, mean_val, t_w, df_w) in got.items():
        assert n == 3
        assert mean_val is not None and not math.isnan(mean_val)
        assert t_w is None, f"{t}: expected NULL t_welch, got {t_w}"
        assert df_w is None, f"{t}: expected NULL df_welch, got {df_w}"


def test_welch_nonconstant_sides_still_defined(spark, tmp_path):
    """The exact guard must NOT over-fire: two varied sides keep a real
    t/df even at the same ~1e9-cent magnitude."""
    d = tmp_path / "big_varied"
    _write_events(
        d,
        [("A", 10000000.33), ("A", 10000001.33), ("A", 10000002.33),
         ("B", 10000007.77), ("B", 10000009.77), ("B", 10000011.77)],
    )
    from savio_training_dask_2019_spark.queries.relational import q_welch_ttest

    got = {
        r["event_type"]: (r["t_welch"], r["df_welch"])
        for r in q_welch_ttest(spark, str(d)).collect()
    }
    for t, (t_w, df_w) in got.items():
        assert t_w is not None and not math.isnan(t_w), t
        assert df_w is not None and df_w > 0, t
    # complement means differ by ~7.5 dollars >> within-side spread of 1-2:
    # the signs must oppose
    assert got["A"][0] < 0 < got["B"][0]
