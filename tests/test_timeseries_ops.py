"""Planted-fixture pins for the r12 time-series additions (gap_fill et
al.): tiny hand-computable series where every filled bucket, flag, and
carried value is known exactly."""

from __future__ import annotations

import math

import pandas as pd


def _write_events(tmp_path, rows):
    """rows: (event_id, ts, user_id, event_type, value)."""
    pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [pd.Timestamp(r[1]) for r in rows],
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [float(r[4]) for r in rows],
            "props": "{}",
        }
    ).to_parquet(tmp_path / "events.parquet")


def test_gap_fill_planted_series(spark, tmp_path):
    """One series with two interior gaps + one single-bucket series + one
    bucket holding two events (sum): every output cell is hand-computed.
    The first bucket of each series is observed by construction, so
    cents_ffill is never NULL."""
    _write_events(
        tmp_path,
        [
            (1, "2024-01-01 00:10", 1, "click", 1.00),
            (2, "2024-01-01 01:20", 1, "click", 2.00),
            (3, "2024-01-01 01:40", 1, "click", 0.50),  # same bucket as #2
            (4, "2024-01-01 04:05", 1, "click", 4.00),  # gaps at 02, 03
            (5, "2024-01-01 09:00", 22, "click", 7.25),  # seg 2, lone bucket
        ],
    )
    from savio_training_dask_2019_spark.queries.timeseries import q_gap_fill

    rows = {
        (r["event_type"], r["seg"], r["bucket_ts"].hour): r
        for r in q_gap_fill(spark, str(tmp_path)).collect()
    }
    assert len(rows) == 5 + 1  # hours 0..4 for seg 1, hour 9 for seg 2

    expect = {
        0: (1, False, 100),
        1: (2, False, 250),
        2: (0, True, 250),
        3: (0, True, 250),
        4: (1, False, 400),
    }
    for h, (n, gap, cents) in expect.items():
        r = rows[("click", 1, h)]
        assert (r["n_events"], r["is_gap"], r["cents_ffill"]) == (n, gap, cents), h
    lone = rows[("click", 2, 9)]
    assert (lone["n_events"], lone["is_gap"], lone["cents_ffill"]) == (1, False, 725)


def test_gap_fill_no_gaps_is_identity(spark, tmp_path):
    """A dense series produces no filled rows — output rows == observed
    buckets and every is_gap is False (the sf0.1 fixture regime)."""
    _write_events(
        tmp_path,
        [(i, f"2024-01-01 {h:02d}:30", 3, "view", 1.0) for i, h in enumerate(range(6))],
    )
    from savio_training_dask_2019_spark.queries.timeseries import q_gap_fill

    rows = q_gap_fill(spark, str(tmp_path)).collect()
    assert len(rows) == 6
    assert not any(r["is_gap"] for r in rows)
    assert all(r["cents_ffill"] == 100 for r in rows)


def test_transition_matrix_planted_sequences(spark, tmp_path):
    """Two hand-built user journeys: every transition count and
    row-normalized probability is known; the (ts, event_id) tie-break
    decides the order of two same-timestamp events."""
    _write_events(
        tmp_path,
        [
            # user 1: view -> click -> purchase -> view
            (1, "2024-01-01 00:00", 1, "view", 0),
            (2, "2024-01-01 00:01", 1, "click", 0),
            (3, "2024-01-01 00:02", 1, "purchase", 0),
            (4, "2024-01-01 00:03", 1, "view", 0),
            # user 2: view -> view -> click; the two views share a
            # timestamp — event_id orders them
            (11, "2024-01-02 00:00", 2, "view", 0),
            (10, "2024-01-02 00:00", 2, "view", 0),
            (12, "2024-01-02 00:05", 2, "click", 0),
        ],
    )
    from savio_training_dask_2019_spark.queries.timeseries import (
        q_transition_matrix,
    )

    got = {
        (r["from_type"], r["to_type"]): (r["n_trans"], r["p"])
        for r in q_transition_matrix(spark, str(tmp_path)).collect()
    }
    # from view: ->click twice (u1 first hop, u2 second hop), ->view once
    # (u2's same-ts pair, id 10 -> 11); u2's click and u1's final view are
    # terminals (dropped), so from click the only hop is u1's ->purchase
    assert got[("view", "click")] == (2, 0.6667)
    assert got[("view", "view")] == (1, 0.3333)
    assert got[("click", "purchase")] == (1, 1.0)
    assert got[("purchase", "view")] == (1, 1.0)
    assert sum(n for n, _ in got.values()) == 5  # 7 events - 2 terminals
    # no cross-user chain: u1's terminal view never points into u2's rows
    assert ("view", "purchase") not in got


def test_activity_streaks_planted_islands(spark, tmp_path):
    """Hand-built calendars: u1 runs 3 consecutive days + an isolated day
    (best 3, duplicate events within a day collapse); u2 runs 2+2 split
    by one gap (best 2); u3 is a single day (best 1)."""
    rows, eid = [], 0
    cal = {
        1: ["01-01", "01-02", "01-03", "01-03", "01-10"],
        2: ["01-01", "01-02", "01-04", "01-05"],
        3: ["01-07"],
    }
    for uid, days in cal.items():
        for d in days:
            rows.append((eid, f"2024-{d} 12:00", uid, "view", 1.0))
            eid += 1
    _write_events(tmp_path, rows)

    from savio_training_dask_2019_spark.queries.timeseries import (
        q_activity_streaks,
    )

    got = {
        r["best_streak"]: r["n_users"]
        for r in q_activity_streaks(spark, str(tmp_path)).collect()
    }
    assert got == {3: 1, 2: 1, 1: 1}


def test_session_stats_planted_sessions(spark, tmp_path):
    """Hand-built sessions: u1 has a 45-min 3-event session (bucket 4)
    and a singleton (bucket 0, duration 0); u2 has one 5-min 2-event
    session (bucket 0). Exactly-30-min gaps SPLIT (the strict-< merge
    rule shared with session_window): u3's pair is two singletons."""
    _write_events(
        tmp_path,
        [
            (1, "2024-01-01 10:00", 1, "view", 0),
            (2, "2024-01-01 10:20", 1, "view", 0),
            (3, "2024-01-01 10:45", 1, "view", 0),   # 45-min session
            (4, "2024-01-01 13:00", 1, "view", 0),   # singleton
            (5, "2024-01-02 09:00", 2, "view", 0),
            (6, "2024-01-02 09:05", 2, "view", 0),   # 5-min session
            (7, "2024-01-03 08:00", 3, "view", 0),
            (8, "2024-01-03 08:30", 3, "view", 0),   # exactly 30 min: split
        ],
    )
    from savio_training_dask_2019_spark.queries.timeseries import q_session_stats

    got = {
        r["dur_bucket"]: (r["n_sessions"], r["avg_events"])
        for r in q_session_stats(spark, str(tmp_path)).collect()
    }
    # bucket 0: u1's singleton + u2's 5-min pair + u3's two singletons
    #   -> 4 sessions, (1 + 2 + 1 + 1) / 4 = 1.25 events
    # bucket 4 (40-50 min): u1's 3-event session
    assert got == {0: (4, 1.25), 4: (1, 3.0)}


def test_wow_change_planted_weeks(spark, tmp_path):
    """Three ISO weeks of one type: 100 -> 250 -> 125 cents gives ratios
    NULL / 2.5 / 0.5; a zero prior week yields NULL, not an artifact."""
    _write_events(
        tmp_path,
        [
            # 2024-01-01 is a Monday: weeks start 01-01, 01-08, 01-15
            (1, "2024-01-02 10:00", 1, "view", 1.00),
            (2, "2024-01-09 10:00", 1, "view", 2.50),
            (3, "2024-01-16 10:00", 1, "view", 1.25),
            # second type: 0-cents week then a real week
            (4, "2024-01-02 10:00", 1, "click", 0.00),
            (5, "2024-01-09 10:00", 1, "click", 3.00),
        ],
    )
    from savio_training_dask_2019_spark.queries.timeseries import q_wow_change

    got = {
        (r["event_type"], r["week_start"].day): (
            r["cents"], r["prev_cents"], r["wow_ratio"],
        )
        for r in q_wow_change(spark, str(tmp_path)).collect()
    }
    assert got[("view", 1)] == (100, None, None)
    assert got[("view", 8)] == (250, 100, 2.5)
    assert got[("view", 15)] == (125, 250, 0.5)
    assert got[("click", 8)] == (300, 0, None)  # zero prior -> NULL


def test_backlog_monthly_planted_flow(spark, tmp_path):
    """Hand-built flow: Jan places 3, ships 1 (backlog 2); Feb places 0,
    ships 2 (backlog 0); Mar places 1, ships 0 (backlog 1). A month with
    only shipments still appears (full outer)."""
    import pandas as pd

    pd.DataFrame(
        {
            "o_orderdate": pd.Series(
                pd.to_datetime(["1995-01-05", "1995-01-10", "1995-01-20",
                                "1995-03-03"]),
                dtype="datetime64[us]",
            )
        }
    ).to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame(
        {
            "l_shipdate": pd.Series(
                pd.to_datetime(["1995-01-25", "1995-02-07", "1995-02-20"]),
                dtype="datetime64[us]",
            )
        }
    ).to_parquet(tmp_path / "lineitem.parquet")

    from savio_training_dask_2019_spark.queries.timeseries import (
        q_backlog_monthly,
    )

    got = {
        r["month_start"].month: (r["n_placed"], r["n_shipped"], r["backlog"])
        for r in q_backlog_monthly(spark, str(tmp_path)).collect()
    }
    assert got == {1: (3, 1, 2), 2: (0, 2, 0), 3: (1, 0, 1)}


def test_scd2_snapshot_planted_history(spark, tmp_path):
    """Hand-built version histories pin the half-open [from, to) semantics
    and the as-of boundary at the fixed cutoff (2024-01-15 00:00:00):
    u1's version AT the cutoff is effective (from <= T) and supersedes the
    one ENDING at the cutoff (to > T fails); u2's single pre-cutoff
    version is open-ended current; u3 has no history before T -> no row;
    u4's same-timestamp tie total-orders on event_id (the later id wins
    as of T)."""
    _write_events(
        tmp_path,
        [
            (10, "2024-01-14 09:00", 1, "set", 1.00),   # v1, ends AT cutoff
            (11, "2024-01-15 00:00", 1, "set", 2.00),   # v2, AT cutoff: wins
            (12, "2024-01-16 09:00", 1, "set", 3.00),   # v3, future
            (20, "2024-01-02 08:00", 2, "set", 5.00),   # v1, open-ended
            (30, "2024-01-20 08:00", 3, "set", 7.00),   # all post-cutoff
            (40, "2024-01-10 12:00", 4, "set", 1.11),   # tie: v1 (id 40)
            (41, "2024-01-10 12:00", 4, "set", 2.22),   # tie: v2 wins as-of
        ],
    )
    from savio_training_dask_2019_spark.queries.timeseries import q_scd2_snapshot

    got = {
        r["user_id"]: (r["version"], r["value_cents"])
        for r in q_scd2_snapshot(spark, str(tmp_path)).collect()
    }
    assert got == {1: (2, 200), 2: (1, 500), 4: (2, 222)}


def test_sessionize_attribution_planted_touchpoints(spark, tmp_path):
    """Hand-built journeys pin the attribution rules. u1: view → click →
    purchase in one session credits CLICK (nearest preceding touch, not
    first); a second purchase in the same session still credits the same
    click (no consumption). u2: touch, then a 30-min gap (NEW session —
    strict-< rule), then purchase → DIRECT (cross-session isolation).
    u3: purchase with no touch ever → direct; an 'error' event is not a
    touch. u4: touch at the SAME timestamp as the purchase but a later
    event_id gets no credit (strictly-preceding frame); the same-ts
    EARLIER event_id does."""
    _write_events(
        tmp_path,
        [
            # u1: view 10:00, click 10:10, purchase 10:20 ($2), purchase 10:25 ($3)
            (1, "2024-01-01 10:00", 1, "view", 0),
            (2, "2024-01-01 10:10", 1, "click", 0),
            (3, "2024-01-01 10:20", 1, "purchase", 2.00),
            (4, "2024-01-01 10:25", 1, "purchase", 3.00),
            # u2: signup 09:00, purchase 09:30 sharp (gap == 30 min: NEW session)
            (5, "2024-01-02 09:00", 2, "signup", 0),
            (6, "2024-01-02 09:30", 2, "purchase", 5.00),
            # u3: error then purchase — error is not a touch
            (7, "2024-01-03 08:00", 3, "error", 0),
            (8, "2024-01-03 08:05", 3, "purchase", 7.00),
            # u4a: purchase (id 9) then same-ts view (id 10): no credit
            (9, "2024-01-04 12:00", 4, "purchase", 11.00),
            (10, "2024-01-04 12:00", 4, "view", 0),
            # u5: same-ts view with EARLIER id then purchase: view credited
            (11, "2024-01-05 12:00", 5, "view", 0),
            (12, "2024-01-05 12:00", 5, "purchase", 13.00),
        ],
    )
    from savio_training_dask_2019_spark.queries.timeseries import (
        q_sessionize_attribution,
    )

    got = {
        r["channel"]: (r["n_purchases"], r["revenue_cents"])
        for r in q_sessionize_attribution(spark, str(tmp_path)).collect()
    }
    assert got == {
        "click": (2, 500),       # u1's both purchases
        "direct": (3, 2300),     # u2 (cross-session), u3 (error), u4a (same-ts later)
        "view": (1, 1300),       # u5 (same-ts earlier id)
    }


def test_seasonal_profile_planted_cells(spark, tmp_path):
    """Hand-built calendar: 2024-01-07 is a Sunday (Spark dayofweek=1) and
    2024-01-08 a Monday (2); counts land in exact (dow, hour) cells and
    type_share normalizes within the event type."""
    _write_events(
        tmp_path,
        [
            (1, "2024-01-07 09:15", 1, "view", 0),   # Sun 09
            (2, "2024-01-07 09:45", 2, "view", 0),   # Sun 09
            (3, "2024-01-07 23:05", 3, "view", 0),   # Sun 23
            (4, "2024-01-08 00:30", 4, "view", 0),   # Mon 00
            (5, "2024-01-08 00:59", 5, "click", 0),  # Mon 00
        ],
    )
    from savio_training_dask_2019_spark.queries.timeseries import (
        q_seasonal_profile,
    )

    got = {
        (r["event_type"], r["dow"], r["hour"]): (r["n_events"], r["type_share"])
        for r in q_seasonal_profile(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("view", 1, 9): (2, 0.5),
        ("view", 1, 23): (1, 0.25),
        ("view", 2, 0): (1, 0.25),
        ("click", 2, 0): (1, 1.0),
    }


def test_changepoint_cusum_planted_shift(spark, tmp_path):
    """'click': 0,0,0,10,10,10 dollars daily -> mean 5, S (cents) =
    -500,-1000,-1500,-1000,-500,0, so the changepoint lands on day 3
    (the last pre-shift day) with max|S| = 15 dollars. 'view' is a
    single day -> S_1 = 0 exactly. Two events in one bucket must sum
    before scoring."""
    _write_events(
        tmp_path,
        [
            (1, "2024-01-01 05:00", 1, "click", 0.00),
            (2, "2024-01-02 05:00", 1, "click", 0.00),
            (3, "2024-01-03 05:00", 1, "click", 0.00),
            (4, "2024-01-04 05:00", 1, "click", 4.00),
            (5, "2024-01-04 06:00", 1, "click", 6.00),  # same day: 10 total
            (6, "2024-01-05 05:00", 1, "click", 10.00),
            (7, "2024-01-06 05:00", 1, "click", 10.00),
            (8, "2024-01-06 07:00", 2, "view", 3.25),
        ],
    )
    from savio_training_dask_2019_spark.queries.timeseries import (
        q_changepoint_cusum,
    )

    got = {
        r["event_type"]: (r["n_days"], str(r["cp_date"])[:10], r["cusum_dollars"])
        for r in q_changepoint_cusum(spark, str(tmp_path)).collect()
    }
    assert got == {
        "click": (6, "2024-01-03", 15.0),
        "view": (1, "2024-01-06", 0.0),
    }


def test_survival_curve_hand_km(spark, tmp_path):
    """Five users: deaths in weeks 0, 1, 4 and one censored user in
    each of weeks 0 and 4. KM: S = 4/5, then 4/5*2/3 = 8/15, then
    8/15*1/2 = 4/15 -> 0.8, 0.5333, 0.2667 at the exact at-risk counts
    5, 3, 2. Under the mean-last-day rule (death = last event strictly
    before the fleet mean last-event day; mean here is ~2024-03-20):
    u1/u2/u3 (last events in January) die, u4 (Jun 29) and u5 (Jun 30)
    are censored, not deaths."""
    _write_events(
        tmp_path,
        [
            (1, "2024-01-01 10:00", 1, "view", 0),  # u1 week 1, death
            (2, "2024-01-10 10:00", 1, "view", 0),
            (3, "2024-01-01 10:00", 2, "view", 0),  # u2 week 0, death
            (4, "2024-01-01 10:00", 3, "view", 0),  # u3 week 4, death
            (5, "2024-01-29 10:00", 3, "view", 0),
            (6, "2024-06-01 10:00", 4, "view", 0),  # u4 week 4, censored
            (7, "2024-06-29 10:00", 4, "view", 0),
            (8, "2024-06-25 10:00", 5, "view", 0),  # u5 week 0, censored
            (9, "2024-06-30 10:00", 5, "view", 0),  # defines the horizon
        ],
    )
    from savio_training_dask_2019_spark.queries.timeseries import (
        q_survival_curve,
    )

    got = [
        (r["week"], r["n_at_risk"], r["deaths"], r["survival"])
        for r in q_survival_curve(spark, str(tmp_path))
        .orderBy("week")
        .collect()
    ]
    assert got == [
        (0, 5, 1, 0.8),
        (1, 3, 1, 0.5333),
        (4, 2, 1, 0.2667),
    ]


def test_ewma_daily_hand_recursion(spark, tmp_path):
    """alpha=0.3, seeded with the first in-window day: 1.00, then
    0.7*100+0.3*200 = 130c, then 0.7*130+0.3*300 = 181c. A lone-day
    series must return its raw value, and two events in one bucket sum
    before smoothing."""
    _write_events(
        tmp_path,
        [
            (1, "2024-01-01 05:00", 1, "click", 0.40),
            (2, "2024-01-01 06:00", 1, "click", 0.60),  # day 1: 100c
            (3, "2024-01-02 05:00", 1, "click", 2.00),
            (4, "2024-01-03 05:00", 1, "click", 3.00),
            (5, "2024-01-05 05:00", 2, "view", 7.25),
        ],
    )
    from savio_training_dask_2019_spark.queries.timeseries import q_ewma_daily

    got = {
        (r["event_type"], str(r["day"])[:10]): (r["raw_dollars"], r["ewma_dollars"])
        for r in q_ewma_daily(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("click", "2024-01-01"): (1.0, 1.0),
        ("click", "2024-01-02"): (2.0, 1.3),
        ("click", "2024-01-03"): (3.0, 1.81),
        ("view", "2024-01-05"): (7.25, 7.25),
    }


def test_cuped_reduction_perfect_and_degenerate(spark, tmp_path):
    """Span 01-01..01-11 -> cutoff 01-06. 'click': three users with
    Y = 2X exactly -> theta 2.0, variance reduction 1.0. 'view': both
    users identical pre and no post -> zero variance -> NULL/NULL."""
    _write_events(
        tmp_path,
        [
            (1, "2024-01-01 09:00", 1, "click", 100.00),
            (2, "2024-01-08 09:00", 1, "click", 200.00),
            (3, "2024-01-03 09:00", 2, "click", 200.00),
            (4, "2024-01-09 09:00", 2, "click", 400.00),
            (5, "2024-01-04 09:00", 3, "click", 300.00),
            (6, "2024-01-11 09:00", 3, "click", 600.00),
            (7, "2024-01-02 09:00", 4, "view", 50.00),
            (8, "2024-01-02 09:00", 5, "view", 50.00),
        ],
    )
    from savio_training_dask_2019_spark.queries.timeseries import (
        q_cuped_reduction,
    )

    got = {
        r["event_type"]: (r["n_users"], r["theta"], r["var_reduction"])
        for r in q_cuped_reduction(spark, str(tmp_path)).collect()
    }
    assert got == {
        "click": (3, 2.0, 1.0),
        "view": (2, None, None),
    }


def test_acf_daily_closed_forms(spark, tmp_path):
    """'lin' rises 100,200,...,900 daily -> every lag-k pair set is
    perfectly linear: acf exactly 1.0 at lags 1 and 7. 'alt' alternates
    0/100 over 9 days -> odd lags pair opposites: exactly -1.0 at both.
    'flat' is constant -> zero variance -> NULL. A day GAP in 'lin'
    (day 10 missing, day 11 present) must drop the crossing lag-1 pair,
    not pair across it (calendar join, not row lag)."""
    rows = []
    eid = 0
    for i in range(9):  # lin: days 1..9, value (i+1) dollars * 100
        eid += 1
        rows.append((eid, f"2024-01-{i + 1:02d} 09:00", 1, "lin", (i + 1) * 100.0))
    eid += 1
    rows.append((eid, "2024-01-11 09:00", 1, "lin", 1100.0))  # gap at day 10
    for i in range(9):  # alt: 0, 100, 0, ...
        eid += 1
        rows.append((eid, f"2024-01-{i + 1:02d} 09:00", 2, "alt", (i % 2) * 100.0))
    for i in range(9):
        eid += 1
        rows.append((eid, f"2024-01-{i + 1:02d} 09:00", 3, "flat", 50.0))
    _write_events(tmp_path, rows)

    from savio_training_dask_2019_spark.queries.timeseries import q_acf_daily

    got = {
        (r["event_type"], r["lag"]): (r["n_pairs"], r["acf"])
        for r in q_acf_daily(spark, str(tmp_path)).collect()
    }
    # lin lag 1: pairs within 1..9 (8 pairs) — day 11's prev (day 10) is
    # missing so it contributes NO pair; lag 7: (8,1),(9,2) + (11,4) = 3
    # pairs, all on the same line -> 1.0
    assert got[("lin", 1)] == (8, 1.0)
    assert got[("lin", 7)] == (3, 1.0)
    assert got[("alt", 1)] == (8, -1.0)
    assert got[("alt", 7)] == (2, -1.0)
    assert got[("flat", 1)] == (8, None)
    assert got[("flat", 7)] == (2, None)


def test_attribution_compare_hand_journeys(spark, tmp_path):
    """Four journeys: view->click->purchase(500c) splits 250/250 and
    diverges first (view) vs last (click); a bare purchase(1000c) is
    'direct' under all three models; view->purchase(299c) agrees
    everywhere; view->click->signup->purchase(100c) floor-divides into
    3x 33,333,333 microcents."""
    _write_events(
        tmp_path,
        [
            (1, "2024-01-01 09:00", 1, "view", 0),
            (2, "2024-01-01 09:05", 1, "click", 0),
            (3, "2024-01-01 09:10", 1, "purchase", 5.00),
            (4, "2024-01-01 10:00", 2, "purchase", 10.00),
            (5, "2024-01-01 11:00", 3, "view", 0),
            (6, "2024-01-01 11:10", 3, "purchase", 2.99),
            (7, "2024-01-01 12:00", 4, "view", 0),
            (8, "2024-01-01 12:05", 4, "click", 0),
            (9, "2024-01-01 12:10", 4, "signup", 0),
            (10, "2024-01-01 12:15", 4, "purchase", 1.00),
        ],
    )
    from savio_training_dask_2019_spark.queries.timeseries import (
        q_attribution_compare,
    )

    got = {
        r["channel"]: (
            r["n_last"], r["last_cents"], r["n_first"], r["first_cents"],
            r["linear_microcents"],
        )
        for r in q_attribution_compare(spark, str(tmp_path)).collect()
    }
    assert got == {
        "view": (1, 299, 3, 899, 250_000_000 + 299_000_000 + 33_333_333),
        "click": (1, 500, 0, 0, 250_000_000 + 33_333_333),
        "signup": (1, 100, 0, 0, 33_333_333),
        "direct": (1, 1000, 1, 1000, 1_000_000_000),
    }


def test_theil_sen_trend_robust_to_outlier(spark, tmp_path):
    """'lin' rises exactly 100/day -> every pairwise slope is 100. 'out'
    rises 10/day with a huge final-day outlier: the slope multiset is
    [10,10,10,330,490,970], lower median (rank 3 of 6) = 10 -- the
    outlier moves OLS but not Theil-Sen. A single-day type has no pairs
    and no row."""
    rows = []
    eid = 0
    for i in range(5):
        eid += 1
        rows.append((eid, f"2024-01-{i + 1:02d} 09:00", 1, "lin", (i + 1) * 100.0))
    for d, v in [(1, 10.0), (2, 20.0), (3, 30.0), (4, 1000.0)]:
        eid += 1
        rows.append((eid, f"2024-01-{d:02d} 09:00", 2, "out", v))
    eid += 1
    rows.append((eid, "2024-01-01 09:00", 3, "lone", 5.0))
    _write_events(tmp_path, rows)

    from savio_training_dask_2019_spark.queries.timeseries import (
        q_theil_sen_trend,
    )

    got = {
        r["event_type"]: (r["n_pairs"], r["ts_slope_dollars"])
        for r in q_theil_sen_trend(spark, str(tmp_path)).collect()
    }
    assert got == {"lin": (10, 100.0), "out": (6, 10.0)}


def test_behavior_entropy_closed_forms(spark, tmp_path):
    """'view' branches 50/50 (entropy exactly 1 bit of a possible 1);
    'click' always leads to 'view' (0 bits, 1 branch); the last event of
    each user contributes no transition."""
    _write_events(
        tmp_path,
        [
            (1, "2024-01-01 09:00", 1, "view", 0),
            (2, "2024-01-01 09:01", 1, "click", 0),
            (3, "2024-01-01 09:02", 1, "view", 0),
            (4, "2024-01-01 09:03", 1, "error", 0),   # view -> error
            (5, "2024-01-01 09:04", 2, "view", 0),
            (6, "2024-01-01 09:05", 2, "click", 0),
            (7, "2024-01-01 09:06", 2, "view", 0),    # u2 ends on view
        ],
    )
    from savio_training_dask_2019_spark.queries.timeseries import (
        q_behavior_entropy,
    )

    got = {
        r["from_type"]: (
            r["n_trans"], r["n_branches"], r["entropy_bits"],
            r["max_entropy_bits"],
        )
        for r in q_behavior_entropy(spark, str(tmp_path)).collect()
    }
    assert got == {
        "view": (3, 2, round(-(2 / 3) * math.log2(2 / 3)
                             - (1 / 3) * math.log2(1 / 3), 5), 1.0),
        "click": (2, 1, 0.0, 0.0),
    }


def test_max_drawdown_peak_to_trough(spark, tmp_path):
    """User 1's series 5,3,8,2,6 peaks at 8 and troughs at 2 -> drawdown
    600 cents (NOT the global max-min 6); monotone user 2 has drawdown 0;
    the 0-drawdown tie between users 2 and 3 breaks by user_id."""
    _write_events(
        tmp_path,
        [
            (1, "2024-01-01 09:00", 1, "v", 5.00),
            (2, "2024-01-01 09:01", 1, "v", 3.00),
            (3, "2024-01-01 09:02", 1, "v", 8.00),
            (4, "2024-01-01 09:03", 1, "v", 2.00),
            (5, "2024-01-01 09:04", 1, "v", 6.00),
            (6, "2024-01-01 09:00", 2, "v", 1.00),
            (7, "2024-01-01 09:01", 2, "v", 2.00),
            (8, "2024-01-01 09:00", 3, "v", 4.00),
        ],
    )
    from savio_training_dask_2019_spark.queries.timeseries import (
        q_max_drawdown,
    )

    got = [
        (r["user_id"], r["n_events"], r["peak_cents"],
         r["max_drawdown_cents"])
        for r in q_max_drawdown(spark, str(tmp_path)).collect()
    ]
    assert got == [(1, 5, 800, 600), (2, 2, 200, 0), (3, 1, 400, 0)]


def test_stickiness_dau_mau_closed_form(spark, tmp_path):
    """January: actives {1,2}, {1}, {1,2,3} over 3 days -> 6 user-days /
    (3 days x 3 MAU) = 0.6667; February's lone single-user day -> 1.0;
    a second event in the same (day, user) cell does not double-count."""
    _write_events(
        tmp_path,
        [
            (1, "2024-01-01 09:00", 1, "v", 0),
            (2, "2024-01-01 10:00", 2, "v", 0),
            (3, "2024-01-01 11:00", 2, "v", 0),  # dup (day, user) cell
            (4, "2024-01-02 09:00", 1, "v", 0),
            (5, "2024-01-03 09:00", 1, "v", 0),
            (6, "2024-01-03 09:01", 2, "v", 0),
            (7, "2024-01-03 09:02", 3, "v", 0),
            (8, "2024-02-01 09:00", 5, "v", 0),
        ],
    )
    from savio_training_dask_2019_spark.queries.timeseries import q_stickiness

    got = {
        r["month"]: (r["n_days"], r["mau"], r["user_days"], r["stickiness"])
        for r in q_stickiness(spark, str(tmp_path)).collect()
    }
    assert got == {
        "2024-01": (3, 3, 6, round(6 / 9, 4)),
        "2024-02": (1, 1, 1, 1.0),
    }


def test_trailing_wau_window_edges(spark, tmp_path):
    """User 1 active on days 1 and 8, user 2 only day 1: day 7's window
    still reaches day 1 (wau 2... actually both users), day 8's window
    [2..8] has dropped day 1 entirely -> only user 1 counts; days with
    no activity produce NO row (observed-day grain)."""
    _write_events(
        tmp_path,
        [
            (1, "2024-01-01 09:00", 1, "v", 0),
            (2, "2024-01-01 10:00", 2, "v", 0),
            (3, "2024-01-07 09:00", 3, "v", 0),
            (4, "2024-01-08 09:00", 1, "v", 0),
        ],
    )
    from savio_training_dask_2019_spark.queries.timeseries import (
        q_trailing_wau,
    )

    got = {
        r["day"]: (r["wau"], r["user_days_in_window"])
        for r in q_trailing_wau(spark, str(tmp_path)).collect()
    }
    assert got == {
        "2024-01-01": (2, 2),      # users 1, 2
        "2024-01-07": (3, 3),      # day 1 still inside [1..7]
        "2024-01-08": (2, 2),      # day 1 dropped; users 1 (day 8), 3 (day 7)
    }


def test_top_paths_trigrams_and_user_boundary(spark, tmp_path):
    """User 1's a,b,c,b,c yields trigrams a>b>c, b>c>b, c>b>c; user 2's
    two events yield none (no cross-user trigram); the all-tied counts
    resolve lexicographically."""
    _write_events(
        tmp_path,
        [
            (1, "2024-01-01 09:00", 1, "a", 0),
            (2, "2024-01-01 09:01", 1, "b", 0),
            (3, "2024-01-01 09:02", 1, "c", 0),
            (4, "2024-01-01 09:03", 1, "b", 0),
            (5, "2024-01-01 09:04", 1, "c", 0),
            (6, "2024-01-01 09:05", 2, "x", 0),
            (7, "2024-01-01 09:06", 2, "y", 0),
        ],
    )
    from savio_training_dask_2019_spark.queries.timeseries import q_top_paths

    got = [(r["path"], r["n"]) for r in q_top_paths(spark, str(tmp_path)).collect()]
    assert got == [("a>b>c", 1), ("b>c>b", 1), ("c>b>c", 1)]


def test_burstiness_closed_forms(spark, tmp_path):
    """Constant 2-per-day traffic -> variance 0 -> fano 0; an all-in-one-
    day burst over two observed days (4, 0 impossible — only observed
    days count, so plant 3 and 1) -> population var 1, mean 2 ->
    fano 0.5."""
    _write_events(
        tmp_path,
        [
            (1, "2024-01-01 09:00", 1, "flat", 0),
            (2, "2024-01-01 10:00", 1, "flat", 0),
            (3, "2024-01-02 09:00", 1, "flat", 0),
            (4, "2024-01-02 10:00", 1, "flat", 0),
            (5, "2024-01-01 09:00", 1, "bursty", 0),
            (6, "2024-01-01 10:00", 1, "bursty", 0),
            (7, "2024-01-01 11:00", 1, "bursty", 0),
            (8, "2024-01-02 09:00", 1, "bursty", 0),
        ],
    )
    from savio_training_dask_2019_spark.queries.timeseries import q_burstiness

    got = {
        r["event_type"]: (r["n_days"], r["n_events"], r["fano"])
        for r in q_burstiness(spark, str(tmp_path)).collect()
    }
    # bursty: days (3, 1): mean 2, population var ((9+1)*2 - 16)/4 = 1
    assert got == {"flat": (2, 4, 0.0), "bursty": (2, 4, 0.5)}
