"""Midpoint pins for the integer div-round conversions (r12).

The r11 driver gate failed `cohort_ltv` on exact 4th-decimal midpoints:
Spark's HALF_UP BigDecimal round of a double quotient and DuckDB's
C-double round disagree by 1 ulp when cents/n lands exactly on x.xxxx5.
These tests construct such midpoints and pin the HALF_UP result, which
the integer div-trick [(2·a·10^k + b) div (2·b)] produces engine-
independently. A regression back to F.round(double/double) fails here
~50% of the time per midpoint row — deterministically for these pins.
"""

from __future__ import annotations

import datetime

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
    analytics,
)


def test_cohort_ltv_rounds_half_up_on_exact_midpoint(spark):
    # 8 customers, one order each in 1995-01; totals sum to 7.77
    # (777 cents, odd) => ltv*10^4 = 777*100/8 = 9712.5, an EXACT
    # midpoint. HALF_UP must give 0.9713 (not the C-double 0.9712).
    d = datetime.date(1995, 1, 15)
    rows = [(i + 1, 0.97, d) for i in range(7)] + [(8, 0.98, d)]
    orders = spark.createDataFrame(
        rows, "o_custkey long, o_totalprice double, o_orderdate date"
    )
    out = analytics.cohort_ltv(orders).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.cohort_year, r.cohort_month, r.month_offset) == (1995, 1, 0)
    assert r.n_customers == 8
    assert r.cum_revenue == 7.77
    assert r.ltv_per_customer == 0.9713


def test_return_rate_rounds_half_up_on_exact_midpoint(spark):
    # 1 return in 128 items: rate*10^6 = 10^6/128 = 7812.5, an EXACT
    # midpoint. HALF_UP must give 0.007813.
    li = spark.createDataFrame(
        [(1, "R" if i == 0 else "N") for i in range(128)],
        "l_suppkey long, l_returnflag string",
    )
    sup = spark.createDataFrame([(1, "s1")], "s_suppkey long, s_name string")
    out = analytics.supplier_return_rates(li, sup).collect()
    assert len(out) == 1
    assert out[0].n_items == 128
    assert out[0].n_returned == 1
    assert out[0].return_rate == 0.007813


def test_shipping_delay_mean_rounds_half_up_on_exact_midpoint(spark):
    # mean delay = 1/128... too indirect; use 16 items totalling 8 days
    # at denominator 64: sum=1, n=64 => mean*10^6 = 15625.0 exact (no
    # midpoint); use n=128, sum=1 => 7812.5 midpoint => 0.007813.
    orders = spark.createDataFrame(
        [(i, datetime.date(1995, 1, 1), "1-URGENT") for i in range(128)],
        "o_orderkey long, o_orderdate date, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [
            (
                i,
                datetime.date(1995, 1, 2) if i == 0 else datetime.date(1995, 1, 1),
            )
            for i in range(128)
        ],
        "l_orderkey long, l_shipdate date",
    )
    out = analytics.shipping_delay_profile(li, orders).collect()
    assert len(out) == 1
    assert out[0].n_items == 128
    assert out[0].mean_delay_days == 0.007813


def test_benford_share_rounds_half_up_on_exact_midpoint(spark):
    # 1-of-128 share: observed_share*10^6 = 7812.5 midpoint => 0.007813.
    vals = [1.0] * 127 + [2.0]
    orders = spark.createDataFrame(
        [(float(v),) for v in vals], "o_totalprice double"
    )
    rows = {r.digit: r for r in analytics.benford_audit(orders).collect()}
    assert rows[2].n_values == 1
    assert rows[2].observed_share == 0.007813


def test_benford_excludes_sub_cent_positives(spark):
    # 0.004 rounds to 0 cents; it must NOT create a digit-0 row
    orders = spark.createDataFrame(
        [(0.004,), (1.0,)], "o_totalprice double"
    )
    out = analytics.benford_audit(orders).collect()
    assert [r.digit for r in out] == [1]
    assert out[0].n_values == 1
