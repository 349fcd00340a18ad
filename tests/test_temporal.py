"""Sessionization and as-of attribution (operators/temporal.py)."""

from __future__ import annotations

from datetime import datetime

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
    temporal,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _t(minute, second=0):
    return datetime(2026, 1, 1, 10, minute, second)


def test_sessionize_splits_on_gap(spark):
    events = spark.createDataFrame(
        [
            (1, _t(0), 1, "click", 1.0),
            (2, _t(10), 1, "view", 2.0),
            (3, _t(50), 1, "click", 3.0),   # 40 min gap -> new session
            (4, _t(55), 1, "view", 4.0),
            (5, _t(0), 2, "click", 9.0),    # other user: own sessions
        ],
        SCHEMA,
    )
    rows = {(r.user_id, r.session_idx): r for r in temporal.sessionize(events).collect()}
    assert len(rows) == 3
    s1 = rows[(1, 1)]
    assert (s1.n_events, s1.session_start, s1.session_end) == (2, _t(0), _t(10))
    s2 = rows[(1, 2)]
    assert (s2.n_events, float(s2.sum_value)) == (2, 7.0)
    assert rows[(2, 1)].n_events == 1


def test_sessionize_gap_boundary_exact(spark):
    # exactly 30:00 gap is NOT a new session (strict > in the predicate)
    events = spark.createDataFrame(
        [(1, _t(0), 1, "a", 0.0), (2, _t(30), 1, "a", 0.0), (3, _t(30, 1), 1, "a", 0.0)],
        SCHEMA,
    )
    rows = temporal.sessionize(events).collect()
    assert len(rows) == 1
    assert rows[0].n_events == 3


def test_asof_attributes_latest_prior_click(spark):
    events = spark.createDataFrame(
        [
            (1, _t(0), 1, "click", 0.0),
            (2, _t(5), 1, "click", 0.0),
            (3, _t(7), 1, "purchase", 10.0),   # -> click 2
            (4, _t(9), 1, "purchase", 20.0),   # -> still click 2
            (5, _t(1), 2, "purchase", 5.0),    # no prior click -> dropped
            (6, _t(2), 2, "click", 0.0),
        ],
        SCHEMA,
    )
    rows = {r.purchase_id: r for r in temporal.asof_attribute(events).collect()}
    assert set(rows) == {3, 4}
    assert rows[3].click_id == 2
    assert rows[3].lag_us == 2 * 60 * 1_000_000
    assert rows[4].click_id == 2


def test_asof_equal_timestamp_click_counts(spark):
    # ASOF >= semantics: a click at the same instant is attributable
    events = spark.createDataFrame(
        [(1, _t(3), 1, "click", 0.0), (2, _t(3), 1, "purchase", 10.0)],
        SCHEMA,
    )
    rows = temporal.asof_attribute(events).collect()
    assert len(rows) == 1
    assert rows[0].click_id == 1
    assert rows[0].lag_us == 0


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------


def test_funnel_ordered_steps(spark):
    events = spark.createDataFrame(
        [
            # user 1 completes the funnel in order
            (1, _t(0), 1, "view", 0.0),
            (2, _t(1), 1, "click", 0.0),
            (3, _t(2), 1, "purchase", 0.0),
            # user 2 clicks BEFORE viewing: click doesn't count, purchase
            # (after a later re-click) does not exist -> stops at view
            (4, _t(1), 2, "click", 0.0),
            (5, _t(2), 2, "view", 0.0),
            (6, _t(0), 2, "purchase", 0.0),
            # user 3 never views
            (7, _t(0), 3, "click", 0.0),
            (8, _t(1), 3, "purchase", 0.0),
        ],
        SCHEMA,
    )
    rows = {r.step: r for r in temporal.funnel(events).collect()}
    assert [rows[i].event_type for i in range(3)] == ["view", "click", "purchase"]
    assert rows[0].n_users == 2          # users 1 and 2 viewed
    assert rows[1].n_users == 1          # only user 1 clicked after viewing
    assert rows[2].n_users == 1


def test_funnel_same_timestamp_counts(spark):
    # >= semantics: a click at the exact view instant advances the funnel
    events = spark.createDataFrame(
        [(1, _t(0), 1, "view", 0.0), (2, _t(0), 1, "click", 0.0)], SCHEMA
    )
    rows = {r.step: r.n_users for r in temporal.funnel(events).collect()}
    assert rows == {0: 1, 1: 1, 2: 0}


# ---------------------------------------------------------------------------
# cohort retention
# ---------------------------------------------------------------------------


def test_cohort_retention_offsets(spark):
    from datetime import datetime as dt

    def day(d, user, eid):
        return (eid, dt(2026, 1, d, 12, 0), user, "view", 0.0)

    # 2026-01-05 is a Monday (week start); user 1 first active that week,
    # again 2 weeks later; user 2 joins the same cohort, active week 0 only
    events = spark.createDataFrame(
        [day(5, 1, 1), day(6, 1, 2), day(19, 1, 3), day(7, 2, 4)], SCHEMA
    )
    got = {
        (str(r.cohort_week), r.week_offset): r.n_users
        for r in temporal.cohort_retention(events).collect()
    }
    assert got == {("2026-01-05", 0): 2, ("2026-01-05", 2): 1}


def test_active_users_window_sees_through_gap_days(spark):
    import datetime as dt

    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
        temporal,
    )

    def ev(eid, user, day):
        return (eid, dt.datetime(2026, 1, day, 12, 0), user, "view", 1.0, "{}")

    events = spark.createDataFrame(
        [
            ev(1, 10, 1), ev(2, 11, 1),          # day 1: users 10, 11
            ev(3, 10, 2),                         # day 2: user 10 (twice)
            ev(4, 10, 2),
            # days 3-5 silent
            ev(5, 12, 6),                         # day 6: user 12
            ev(6, 10, 9),                         # day 9: user 10
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {
        r.day.day: (r.dau, r.trailing_users)
        for r in temporal.active_users_window(events, 7).collect()
    }
    # trailing-7 (inclusive) windows: day6 sees days 1-2 (10,11) + 12;
    # day9 sees day6's 12 + itself, NOT day1/2 (outside window)
    assert out == {1: (2, 2), 2: (1, 2), 6: (1, 3), 9: (1, 2)}


def test_growth_accounting_all_classes_and_censoring(spark):
    import datetime as dt

    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
        temporal,
    )

    def ev(eid, user, day):
        return (eid, dt.datetime(2026, 1, day, 12, 0), user, "view", 1.0, "{}")

    events = spark.createDataFrame(
        [
            ev(1, 10, 1), ev(2, 11, 1),  # d1: 10,11 new
            ev(3, 10, 2),                # d2: 10 retained; 11 churns (d2)
            ev(4, 10, 3), ev(5, 11, 3),  # d3: 10 retained, 11 resurrected
            # d4: both churn
            ev(6, 12, 5),                # d5: 12 new
            ev(7, 10, 6),                # d6: 10 resurrected; 12 churns
            # 10 active in the LAST period: right-censored, never churned
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {
        r.period.day: (r.n_active, r.n_new, r.n_retained, r.n_resurrected, r.n_churned)
        for r in temporal.growth_accounting(events, period="day").collect()
    }
    assert out == {
        1: (2, 2, 0, 0, 0),
        2: (1, 0, 1, 0, 1),   # 11 churned
        3: (2, 0, 1, 1, 0),   # 11 resurrected
        4: (0, 0, 0, 0, 2),   # churn-only period: both 10 and 11 idle
        5: (1, 1, 0, 0, 0),
        6: (1, 0, 0, 1, 1),   # 10 resurrected; 12 churned
        # no day-7 row: day 6 is the last observed period (censored)
    }
    # the growth identity: actives(p) - actives(p-1) == new + res - churned
    # holds on every consecutive-period pair present in the report
    days = sorted(out)
    for a, b in zip(days, days[1:]):
        if b - a == 1:
            na, nn, nr, nres, nch = out[b]
            assert na - out[a][0] == nn + nres - nch


def test_growth_accounting_month_and_week_boundaries(spark):
    import datetime as dt

    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
        temporal,
    )

    def ev(eid, user, y, m, d):
        return (eid, dt.datetime(y, m, d, 12, 0), user, "view", 1.0, "{}")

    # month: Dec->Jan year rollover is adjacent (retained); a Feb gap
    # resurrects in Mar and churns the Dec-Jan-only user in Feb
    events = spark.createDataFrame(
        [
            ev(1, 1, 2025, 12, 31), ev(2, 2, 2025, 12, 1),
            ev(3, 1, 2026, 1, 1), ev(4, 2, 2026, 1, 15),
            ev(5, 1, 2026, 3, 10),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {
        (r.period.year, r.period.month): (
            r.n_active, r.n_new, r.n_retained, r.n_resurrected, r.n_churned
        )
        for r in temporal.growth_accounting(events, period="month").collect()
    }
    assert out == {
        (2025, 12): (2, 2, 0, 0, 0),
        (2026, 1): (2, 0, 2, 0, 0),   # year rollover is one month step
        (2026, 2): (0, 0, 0, 0, 2),   # churn-only month
        (2026, 3): (1, 0, 0, 1, 0),   # user 1 resurrects; user 2 censored?
        # user 2's churn fired in Feb; user 1's Mar activity is final (censored)
    }

    # week: Mondays 7 days apart are adjacent even across a month edge
    events_w = spark.createDataFrame(
        [ev(1, 1, 2026, 1, 28), ev(2, 1, 2026, 2, 4)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    rows = temporal.growth_accounting(events_w, period="week").collect()
    got = {r.period: (r.n_new, r.n_retained) for r in rows}
    assert got == {
        dt.date(2026, 1, 26): (1, 0),
        dt.date(2026, 2, 2): (0, 1),
    }

    # week indexing across the epoch: day −3 // 7 must floor to −1, not
    # truncate to 0 — the Monday-weeks of 1969-12-29 and 1970-01-05 are
    # ADJACENT (retained), not the same index (which dropped the user
    # from every class and broke the n_active identity)
    events_e = spark.createDataFrame(
        [ev(1, 1, 1969, 12, 30), ev(2, 1, 1970, 1, 6), ev(3, 1, 1970, 1, 14)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    rows = temporal.growth_accounting(events_e, period="week").collect()
    got = {
        r.period: (r.n_active, r.n_new, r.n_retained, r.n_resurrected)
        for r in rows
    }
    assert got == {
        dt.date(1969, 12, 29): (1, 1, 0, 0),
        dt.date(1970, 1, 5): (1, 0, 1, 0),
        dt.date(1970, 1, 12): (1, 0, 1, 0),
    }
    for r in rows:
        assert (
            r.n_active == r.n_new + r.n_retained + r.n_resurrected
        ), "n_active identity"


def test_daily_gapfill_zero_fills_and_carries_forward(spark):
    # type "a": days 1, 4 observed -> grid 1..4 with gaps on 2, 3
    # type "b": single day -> one dense row, no gaps
    d = lambda day, h=12: datetime(2026, 1, day, h)  # noqa: E731
    events = spark.createDataFrame(
        [
            (1, d(1, 9), 1, "a", 10.0),
            (2, d(1, 18), 1, "a", 7.5),   # later ts -> the day-1 carried value
            (3, d(4), 2, "a", 2.0),
            (4, d(2), 3, "b", 5.0),
        ],
        SCHEMA,
    )
    rows = {
        (r.event_type, str(r.day)): r
        for r in temporal.daily_gapfill(events).collect()
    }
    assert len(rows) == 5  # a: 4 grid days, b: 1
    a1 = rows[("a", "2026-01-01")]
    assert (a1.n_events, a1.day_value, a1.carried_value, a1.is_gap) == (
        2, 17.5, 7.5, 0,
    )
    for gap_day in ("2026-01-02", "2026-01-03"):
        g = rows[("a", gap_day)]
        assert (g.n_events, g.day_value, g.carried_value, g.is_gap) == (
            0, 0.0, 7.5, 1,
        )
    a4 = rows[("a", "2026-01-04")]
    assert (a4.n_events, a4.carried_value, a4.is_gap) == (1, 2.0, 0)
    b = rows[("b", "2026-01-02")]
    assert (b.n_events, b.day_value, b.carried_value, b.is_gap) == (1, 5.0, 5.0, 0)


def test_daily_gapfill_within_day_last_breaks_ts_ties_by_event_id(spark):
    events = spark.createDataFrame(
        [(1, datetime(2026, 1, 1), 1, "a", 1.0),
         (2, datetime(2026, 1, 1), 1, "a", 9.0)],  # same ts: higher id wins
        SCHEMA,
    )
    [row] = temporal.daily_gapfill(events).collect()
    assert row.carried_value == 9.0


def test_funnel_latency_exact_pair_timings(spark):
    # user 1: view@0 -> click@40s -> purchase@100s; user 2: view@0 -> click@60s
    events = spark.createDataFrame(
        [
            (1, datetime(2026, 1, 1, 10, 0, 0), 1, "view", 0.0),
            (2, datetime(2026, 1, 1, 10, 0, 40), 1, "click", 0.0),
            (3, datetime(2026, 1, 1, 10, 1, 40), 1, "purchase", 0.0),
            (4, datetime(2026, 1, 1, 10, 0, 0), 2, "view", 0.0),
            (5, datetime(2026, 1, 1, 10, 1, 0), 2, "click", 0.0),
        ],
        SCHEMA,
    )
    rows = {r.step: r for r in temporal.funnel_latency(events).collect()}
    s1 = rows[1]
    assert (s1.from_type, s1.to_type, s1.n_converted) == ("view", "click", 2)
    assert s1.mean_seconds == 50.0  # (40 + 60) / 2
    assert s1.p50_seconds == 40.0   # discrete rank on [40, 60]
    assert s1.p90_seconds == 60.0
    s2 = rows[2]
    assert (s2.n_converted, s2.mean_seconds, s2.p50_seconds) == (1, 60.0, 60.0)


def test_session_paths_openings_and_short_sessions(spark):
    # user 1, session 1: view->click->buy->view (4th event beyond depth)
    # user 1, session 2 (after 40-min gap): view alone
    # user 2, session 1: view->click->buy  (same path as u1 s1)
    t0 = datetime(2026, 1, 1, 10, 0, 0)
    mk = lambda m: datetime(2026, 1, 1, 10 + m // 60, m % 60, 0)  # noqa: E731
    events = spark.createDataFrame(
        [
            (1, mk(0), 1, "view", 0.0),
            (2, mk(1), 1, "click", 0.0),
            (3, mk(2), 1, "buy", 0.0),
            (4, mk(3), 1, "view", 0.0),
            (5, mk(50), 1, "view", 0.0),   # 47-min gap -> new session
            (6, mk(0), 2, "view", 0.0),
            (7, mk(1), 2, "click", 0.0),
            (8, mk(2), 2, "buy", 0.0),
        ],
        SCHEMA,
    )
    got = {
        r.path: r.n_sessions for r in temporal.session_paths(events).collect()
    }
    assert got == {"view > click > buy": 2, "view": 1}
    assert t0  # silence unused


def test_event_dedup_report_chain_collapse_and_window_edge(spark):
    t = lambda s: datetime(2026, 1, 1, 10, 0, s)  # noqa: E731
    events = spark.createDataFrame(
        [
            # retry chain: 0s, 3s, 6s — both retries within 5s of their
            # PREDECESSOR (chain-collapsing), even though 6s > 5s from head
            (1, t(0), 1, "ping", 1.0),
            (2, t(3), 1, "ping", 1.0),
            (3, t(6), 1, "ping", 1.0),
            # exactly 5s gap IS a duplicate (<=); 6s is not
            (4, t(20), 1, "pong", 2.0),
            (5, t(25), 1, "pong", 2.0),
            (6, t(31), 1, "pong", 2.0),
            # same payload, different user: independent
            (7, t(0), 2, "ping", 1.0),
            # same user+type, different value: not a duplicate
            (8, t(1), 1, "ping", 9.9),
        ],
        SCHEMA,
    )
    got = {
        r.event_type: (r.n_events, r.n_duplicates, r.n_kept)
        for r in temporal.event_dedup_report(events).collect()
    }
    assert got == {"ping": (5, 2, 3), "pong": (3, 1, 2)}


def test_stickiness_ratio_and_window(spark):
    from datetime import timedelta

    base = datetime(2026, 1, 1)
    # users 1..4 active day 0; user 1 also active day 40 (outside any
    # 28-day window that includes day 0)
    events = spark.createDataFrame(
        [
            (1, base, 1, "a", 0.0),
            (2, base, 2, "a", 0.0),
            (3, base, 3, "a", 0.0),
            (4, base, 4, "a", 0.0),
            (5, base + timedelta(days=40), 1, "a", 0.0),
        ],
        SCHEMA,
    )
    got = {str(r.day)[:10]: (r.dau, r.mau, r.stickiness) for r in temporal.stickiness(events).collect()}
    assert got == {
        "2026-01-01": (4, 4, 1.0),
        "2026-02-10": (1, 1, 1.0),  # day-0 actives aged out of the window
    }
