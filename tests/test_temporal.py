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
