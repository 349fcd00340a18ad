"""r11 analytics additions: Benford audit, revenue Gini, changepoint,
trailing EWMA — each pinned against a brute-force Python computation on
handcrafted frames (the oracle-parity SQL covers the engine-vs-engine
contract; these pin the MATH)."""

from __future__ import annotations

import datetime
import math

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
    analytics,
)


def _orders(spark, totals):
    return spark.createDataFrame(
        [(i + 1, float(t)) for i, t in enumerate(totals)],
        "o_custkey long, o_totalprice double",
    )


def test_benford_digits_and_shares(spark):
    # first significant digit of exact cents: 12.34 -> '1234' -> 1;
    # 0.57 -> '57' -> 5; 900.00 -> '90000' -> 9
    orders = _orders(spark, [12.34, 0.57, 900.00, 19.99, -5.0, 0.0])
    rows = {r.digit: r for r in analytics.benford_audit(orders).collect()}
    # non-positive values are excluded
    assert sum(r.n_values for r in rows.values()) == 4
    assert rows[1].n_values == 2  # 12.34 and 19.99
    assert rows[5].n_values == 1
    assert rows[9].n_values == 1
    assert rows[1].observed_share == 0.5
    assert rows[1].expected_share == round(math.log10(2), 6)
    assert rows[1].abs_dev == round(abs(0.5 - math.log10(2)), 6)


def test_benford_shares_sum_to_one(spark, sf_dir):
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.sources.catalog import (
        load_table,
    )

    out = analytics.benford_audit(load_table(spark, sf_dir, "orders")).collect()
    assert abs(sum(r.observed_share for r in out) - 1.0) < 1e-4
    assert [r.digit for r in out] == sorted(r.digit for r in out)


def _gini_brute(xs):
    xs = sorted(xs)
    n = len(xs)
    sx = sum(xs)
    six = sum((i + 1) * x for i, x in enumerate(xs))
    return (2.0 * six - (n + 1.0) * sx) / (n * sx)


def test_gini_uniform_is_zero(spark):
    out = analytics.revenue_gini(_orders(spark, [100.0] * 8)).collect()[0]
    assert out.n_customers == 8
    assert out.gini == 0.0
    assert out.total_revenue == 800.0


def test_gini_matches_brute_force(spark):
    vals = [1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0]
    out = analytics.revenue_gini(_orders(spark, vals)).collect()[0]
    assert out.gini == round(_gini_brute(vals), 6)


def test_gini_concentrated_approaches_one(spark):
    # one customer holds ~everything: G -> (n-1)/n * (1 - eps)
    vals = [0.01] * 9 + [10000.0]
    out = analytics.revenue_gini(_orders(spark, vals)).collect()[0]
    assert out.gini > 0.89


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _day(d):
    return datetime.datetime(2024, 1, d)


def test_changepoint_finds_the_step(spark):
    # type A: level 10 for days 1-5, level 50 for days 6-10 -> split at day 5
    rows = [
        (i, _day(d), 1, "A", 10.0 if d <= 5 else 50.0)
        for i, d in enumerate(range(1, 11))
    ]
    out = {r.event_type: r for r in analytics.events_changepoint(_events(spark, rows)).collect()}
    a = out["A"]
    assert a.split_day == datetime.date(2024, 1, 5)
    assert a.n_days == 10
    assert a.before_mean_daily == 10.0
    assert a.after_mean_daily == 50.0
    assert a.shift_score > 0


def test_changepoint_tie_breaks_earliest_day(spark):
    # perfectly flat series: every split scores 0 -> earliest day wins
    rows = [(i, _day(d), 1, "B", 7.0) for i, d in enumerate(range(1, 7))]
    out = analytics.events_changepoint(_events(spark, rows)).collect()[0]
    assert out.split_day == datetime.date(2024, 1, 1)
    assert out.shift_score == 0.0


def test_ewma_matches_pandas_adjusted(spark):
    import pandas as pd

    vals = [10.0, 20.0, 40.0, 30.0, 50.0]
    rows = [(i, _day(i + 1), 1, "C", v) for i, v in enumerate(vals)]
    out = analytics.events_value_ewma(_events(spark, rows)).collect()[0]
    expect = pd.Series(vals).ewm(alpha=0.5, adjust=True).mean().iloc[-1]
    assert out.event_type == "C"
    assert out.last_day == datetime.date(2024, 1, 5)
    assert out.n_days == 5
    assert abs(out.ewma_value - expect) < 1e-6


def test_ewma_missing_days_age_by_calendar(spark):
    # observations on days 1 and 5: ages 4 and 0 -> w = 1/16, 1
    rows = [(1, _day(1), 1, "D", 16.0), (2, _day(5), 1, "D", 1.0)]
    out = analytics.events_value_ewma(_events(spark, rows)).collect()[0]
    expect = (16.0 / 16 + 1.0) / (1 / 16 + 1)
    assert abs(out.ewma_value - expect) < 1e-6
    assert out.n_days == 2


def test_ewma_horizon_truncates(spark):
    # a 100-day-old observation is outside the 40-day horizon
    rows = [(1, _day(1), 1, "E", 999.0), (2, datetime.datetime(2024, 5, 1), 1, "E", 5.0)]
    out = analytics.events_value_ewma(_events(spark, rows)).collect()[0]
    assert out.n_days == 1
    assert out.ewma_value == 5.0
