"""r15 regression pins (ADVICE r14).

1. Negative-zero oracle lint: the catalog-wide registry of rounded,
   NEGATIVE-CAPABLE oracle output columns. DuckDB's ``round`` keeps the
   sign of a tiny-negative value (-0.0) while Spark's BigDecimal round
   drops it (+0.0) — the engine behavior is pinned by
   tests/test_r14_guards.py::test_negative_zero_rounding_convention_pin —
   so every such column must carry the oracle-side ``+ 0.0``
   normalization. Columns are fixed when their query rotates into a
   driver window (the changed oracle earns a fresh driver row that
   round — WINDOWS.md ledger rule); until then they sit in DEFERRED,
   which this lint keeps honest: fixing one without moving its entry to
   NORMALIZED fails the suite, as does regressing a normalized one.

   Audited NOT negative-capable, deliberately absent from both sets
   (ADVICE r14 asked for the enumeration; these are why it is short):
   - integer-exact outputs: max_drawdown (all BIGINT cents),
     burstiness (count*sum(c^2) - sum(c)^2 >= 0 exactly, Cauchy-Schwarz
     on BIGINTs), below_avg_qty / trimmed_mean / gini_by_segment /
     ... (cents-scaled BIGINT pipelines);
   - structurally nonnegative doubles: changepoint_cusum (abs()),
     rolling_anomaly / ann_recall / retrieval_eval (rates in [0,1]),
     rrf_hybrid (1/(60+r) > 0), behavior_entropy (a SUM of -p*log2(p)
     terms each >= +0.0 — never -0.0, unlike skew_profile's DIFFERENCE
     form which can cancel to tiny-negative);
   - threshold-bounded: emb_near_dup (WHERE cosine >= 0.45),
     sparse_cosine_pairs (WHERE dot > 0 AND 100*dot^2 >= 16*nsq*nsq
     => cosine >= 0.4);
   - exact-cancellation-safe: lag_lead's delta (IEEE x - x = +0.0, and
     any unequal 2dp prices differ by >= ~0.01).

2. The degree_assortativity / welch_ttest DECIMAL(38,0) constancy
   guards are coalesced to FALSE so a >1e38 overflow (Spark: NULL)
   cannot NULL-propagate through the predicate — the out-of-envelope
   failure mode is the deterministic double path, never a silent
   fall-through (ADVICE r14 item 2).
"""

from __future__ import annotations

import re

import pytest

from savio_training_dask_2019_spark.queries import ORACLE

# query -> rounded negative-capable output columns WITH the '+ 0.0'
# normalization in the oracle (each fixed the round it held a window slot)
NORMALIZED: dict[str, tuple[str, ...]] = {
    "cuped_reduction": ("theta",),
    "acf_daily": ("acf",),
    "theil_sen_trend": ("ts_slope_dollars",),
    "mutual_nn": ("cosine",),
    "welch_ttest": ("mean_val", "t_welch"),
    "spearman_corr": ("rho_spearman",),
    "simpsons_check": ("slope_within", "slope_pooled"),
    "degree_assortativity": ("assortativity",),
    # r15 (that round's window members — ADVICE r14 item 1):
    "corr_cov": ("corr_qty_price", "cov_qty_price", "corr_disc_tax"),
    "ivfpq_rerank": ("cosine",),
    # r16 (the six DEFERRED sites scheduled by the r16 window plan —
    # VERDICT r15 #3; each normalized the round it holds its slot):
    "decontam_semantic": ("max_eval_cos",),
    "skew_profile": ("entropy_bits",),
    "outlier_mad": ("med",),
    "trend_slope": ("slope_cents_per_day", "intercept_dollars"),
    "collocations": ("pmi",),
    "knn_join": ("cosine",),
    # r17 (the FINAL seven DEFERRED sites — VERDICT r16 #1 closed the
    # class in one pass: apply_in_pandas + dsir_weights rotated in
    # naturally, the other five via window_plan.py --rewindow):
    # projected cosines (5dp) — tiny-negative if |cos| < 5e-6
    "knn_brute": ("cosine",),
    "knn_cells": ("cosine",),
    "hard_negatives": ("cosine",),
    # regression slopes — sign-free by definition
    "apply_in_pandas": ("slope",),
    # signed differences / log-ratios
    "dsir_weights": ("avg_imp", "min_imp", "max_imp"),
    # information-theoretic DIFFERENCE forms: >= 0 mathematically but
    # assembled in double, so exact-zero cases can cancel tiny-negative
    "feature_mi": ("mi_bits", "h_target_bits", "uncertainty_coef"),
    # nonnegative on the current fixtures (events.value >= 0 at all SFs)
    # but negative-capable in class — kept enumerated per the r14 ledger
    "wow_change": ("wow_ratio",),
}

# query -> rounded negative-capable output columns NOT yet normalized.
# EMPTY since r17 (VERDICT r16 #1): every negative-capable rounded oracle
# column in the catalog now carries the '+ 0.0' convention. New queries
# (the catalog is closed — none expected) must either normalize on landing
# or enter here with a scheduled window slot.
DEFERRED: dict[str, tuple[str, ...]] = {}


def _projection_sites(sql: str, alias: str) -> list[str]:
    """The column's OWN expression preceding each `AS alias` projection.

    ADVICE r15 #2: the old fixed 200-char lookback let a NEIGHBORING
    normalized projection mask a regression (two '+ 0.0' sites within one
    window). This version strips `--` comments (several carry '+ 0.0' in
    prose) and walks backward from each `AS alias` with parenthesis-depth
    tracking, bounding the site at the previous depth-0 comma, the
    enclosing open-paren, or the projection list's own SELECT — so the
    '+ 0.0' must sit inside the column's expression itself.

    ADVICE r16 #4: single-quoted SQL string literals are blanked FIRST
    (before comment stripping and the walk) — a quoted ')' or ',' or '--'
    would otherwise be treated as syntax and could mis-bound a site."""
    bare = re.sub(r"'[^']*'", "''", sql)
    bare = re.sub(r"--[^\n]*", "", bare)
    sites = []
    for m in re.finditer(rf"\bAS\s+{alias}\b", bare):
        depth = 0
        start = 0
        for i in range(m.start() - 1, -1, -1):
            ch = bare[i]
            if ch == ")":
                depth += 1
            elif ch == "(":
                if depth == 0:  # enclosing subquery/CTE paren
                    start = i + 1
                    break
                depth -= 1
            elif depth == 0 and (
                ch == ","
                or (ch in "Tt" and bare[max(0, i - 5) : i + 1].upper() == "SELECT")
            ):
                start = i + 1
                break
        sites.append(bare[start : m.start()])
    assert sites, f"alias {alias!r} no longer projected — update the registry"
    return sites


def test_registries_disjoint_and_live():
    assert not NORMALIZED.keys() & DEFERRED.keys()
    for q in (*NORMALIZED, *DEFERRED):
        assert q in ORACLE, f"{q} left the oracle catalog — update the registry"


@pytest.mark.parametrize("query,cols", sorted(NORMALIZED.items()))
def test_negative_capable_columns_normalized(query, cols):
    for col in cols:
        for site in _projection_sites(ORACLE[query], col):
            assert "+ 0.0" in site, (
                f"{query}.{col} lost its '+ 0.0' -0.0 normalization"
            )


def test_deferred_columns_tracked():
    """A deferred column gaining '+ 0.0' must MOVE to NORMALIZED — the
    registry is the ledger of record for the convention's coverage.
    DEFERRED emptied at r17 (VERDICT r16 #1); plain-loop form so an empty
    registry stays a PASSING pin, not an empty-parametrize skip."""
    for query, cols in sorted(DEFERRED.items()):
        for col in cols:
            for site in _projection_sites(ORACLE[query], col):
                assert "+ 0.0" not in site, (
                    f"{query}.{col} is now normalized — move it to NORMALIZED"
                )


def test_decimal_guard_overflow_modes(spark):
    """Pins the engine behavior the welch/assortativity coalesce(cmp, FALSE)
    guards exist for (ADVICE r14 item 2). Under ANSI mode — this repo's
    session default in Spark 4.x — a DECIMAL(38,0) product overflow RAISES,
    the same deterministic hard error DuckDB's HUGEINT gives: the engines
    are aligned out-of-envelope. With ANSI off the product is NULL, and the
    coalesce must pin the comparison to FALSE instead of NULL-propagating."""
    from pyspark.sql import functions as F
    from pyspark.errors.exceptions.captured import ArithmeticException

    big = "9" * 38  # decimal(38,0) max; big*big overflows

    def overflow_guard():
        return spark.range(1).select(
            F.coalesce(
                F.lit(big).cast("decimal(38,0)")
                * F.lit(big).cast("decimal(38,0)")
                == F.lit(1).cast("decimal(38,0)"),
                F.lit(False),
            ).alias("guard")
        ).collect()[0]

    assert spark.conf.get("spark.sql.ansi.enabled") == "true", (
        "session default changed — revisit the overflow-divergence docs"
    )
    with pytest.raises(ArithmeticException):
        overflow_guard()

    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        assert overflow_guard()["guard"] is False, (
            "non-ANSI overflow NULL escaped the coalesce(False) guard"
        )
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "true")
