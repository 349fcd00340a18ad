"""Edge semantics of the r4 TPC-H-shaped analytics operators.

Planted-frame tests for the behaviors the sf-parquet oracle comparison
can't isolate: Q15 exact-decimal tie handling, Q17's cleared-division
threshold boundary, Q13's zero-order customers, Q4's correlated-inequality
semi join, Q22's above-average + anti-join composition.
"""

from __future__ import annotations

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
    analytics,
)


def _li(spark, rows):
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double, "
        "l_extendedprice double, l_discount double, l_shipdate timestamp",
    )


def test_q15_keeps_all_tied_winners(spark):
    # suppliers 1 and 2 tie at 100.00 exactly; 3 is below
    import datetime as dt

    d = dt.datetime(1996, 2, 1)
    li = _li(
        spark,
        [
            (1, 1, 1, 1.0, 100.0, 0.0, d),
            (2, 1, 2, 1.0, 50.0, 0.0, d),
            (3, 1, 2, 1.0, 50.0, 0.0, d),
            (4, 1, 3, 1.0, 99.99, 0.0, d),
        ],
    )
    supplier = spark.createDataFrame(
        [(1, "S1"), (2, "S2"), (3, "S3")], "s_suppkey long, s_name string"
    )
    out = analytics.q15_top_supplier(li, supplier).collect()
    assert sorted(r.s_suppkey for r in out) == [1, 2]
    assert all(r.total_revenue == 100.0 for r in out)


def test_q17_threshold_is_exact_at_boundary(spark):
    # The per-part average includes every line of the part (TPC-H
    # semantics). part 1: qtys 7,7,1 -> avg 5, threshold 1.0; the qty-1.0
    # line sits EXACTLY at 0.2*avg and must be excluded (strict <).
    # part 2: qtys 7,7,0.5 -> threshold ~0.967; the 0.5 line is included.
    import datetime as dt

    d = dt.datetime(1996, 2, 1)
    li = _li(
        spark,
        [
            (1, 1, 1, 7.0, 5.0, 0.0, d),
            (2, 1, 1, 7.0, 5.0, 0.0, d),
            (3, 1, 1, 1.0, 700.0, 0.0, d),   # exactly 0.2*avg -> excluded
            (4, 2, 1, 7.0, 5.0, 0.0, d),
            (5, 2, 1, 7.0, 5.0, 0.0, d),
            (6, 2, 1, 0.5, 70.0, 0.0, d),    # below -> included
        ],
    )
    part = spark.createDataFrame(
        [(1, "Brand#4", 5), (2, "Brand#4", 5)],
        "p_partkey long, p_brand string, p_size long",
    )
    row = analytics.q17_small_quantity_revenue(li, part).collect()[0]
    assert row.n_small_lines == 1
    assert row.avg_yearly == 10.0  # 70 / 7


def test_q13_counts_zero_order_customers(spark):
    customer = spark.createDataFrame(
        [(1,), (2,), (3,)], "c_custkey long"
    )
    import datetime as dt

    orders = spark.createDataFrame(
        [
            (10, 1, "2-HIGH", dt.datetime(1996, 1, 1)),
            (11, 1, "2-HIGH", dt.datetime(1996, 1, 2)),
            (12, 2, "1-URGENT", dt.datetime(1996, 1, 3)),  # excluded priority
        ],
        "o_orderkey long, o_custkey long, o_orderpriority string, o_orderdate timestamp",
    )
    dist = {
        r.c_count: r.custdist
        for r in analytics.q13_order_count_distribution(customer, orders).collect()
    }
    # customer 1 has 2 kept orders; customers 2 (only excluded) and 3 (none)
    # both land in the zero bucket
    assert dist == {2: 1, 0: 2}


def test_q4_semi_join_counts_orders_once_and_correlates(spark):
    import datetime as dt

    orders = spark.createDataFrame(
        [
            (1, "1-URGENT", dt.datetime(1996, 1, 10)),
            (2, "1-URGENT", dt.datetime(1996, 2, 10)),
            (3, "5-LOW", dt.datetime(1995, 1, 1)),  # outside window
        ],
        "o_orderkey long, o_orderpriority string, o_orderdate timestamp",
    )
    li = _li(
        spark,
        [
            # order 1: two late lines -> still counts once
            (1, 1, 1, 1.0, 1.0, 0.0, dt.datetime(1996, 6, 1)),
            (1, 1, 1, 1.0, 1.0, 0.0, dt.datetime(1996, 7, 1)),
            # order 2: shipped 89 days later -> NOT late (needs > 90)
            (2, 1, 1, 1.0, 1.0, 0.0, dt.datetime(1996, 5, 9)),
        ],
    )
    out = {
        r.o_orderpriority: r.order_count
        for r in analytics.q4_order_priority(
            orders, li, "1996-01-01", "1996-04-01"
        ).collect()
    }
    assert out == {"1-URGENT": 1}


def test_q22_above_average_and_dormant_only(spark):
    import datetime as dt

    customer = spark.createDataFrame(
        [
            (1, "A", 300.0),   # above avg(200), dormant -> kept
            (2, "A", 300.0),   # above avg but has a recent order -> dropped
            (3, "B", 100.0),   # below avg -> dropped
            (4, "B", -50.0),   # non-positive balance -> not in population
        ],
        "c_custkey long, c_mktsegment string, c_acctbal double",
    )
    orders = spark.createDataFrame(
        [(10, 2, dt.datetime(2000, 1, 1)), (11, 3, dt.datetime(1995, 1, 1))],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    out = analytics.q22_dormant_customers(customer, orders).collect()
    # avg positive acctbal = (300+300+100)/3 = 233.33; only 1 and 2 above;
    # 2 ordered after the cutoff -> only customer 1 survives
    assert len(out) == 1
    assert out[0].c_mktsegment == "A"
    assert out[0].numcust == 1
    assert out[0].totacctbal == 300.0


def test_q19_branches_are_disjunctive_not_cross_matched(spark):
    import datetime as dt

    d = dt.datetime(1996, 2, 1)
    # Brand#2 line with qty 25: qty fits branch 3's range but brand does
    # not -> must NOT count (the AND inside each branch must bind).
    li = _li(
        spark,
        [
            (1, 1, 1, 25.0, 10.0, 0.0, d),
            (2, 2, 1, 5.0, 20.0, 0.0, d),  # Brand#2, qty 5, size 3 -> counts
        ],
    )
    part = spark.createDataFrame(
        [(1, "Brand#2", 3), (2, "Brand#2", 3)],
        "p_partkey long, p_brand string, p_size long",
    )
    row = analytics.q19_discount_revenue(li, part).collect()[0]
    assert row.n_lines == 1
    assert row.revenue == 20.0


def test_q21_sole_blame_semantics(spark):
    import datetime as dt

    d0 = dt.datetime(1996, 1, 1)
    late = dt.datetime(1996, 6, 1)    # > 90 days after order
    ontime = dt.datetime(1996, 1, 15)
    orders = spark.createDataFrame(
        [(1, "F", d0), (2, "F", d0), (3, "F", d0), (4, "O", d0)],
        "o_orderkey long, o_orderstatus string, o_orderdate timestamp",
    )
    li = _li(
        spark,
        [
            # order 1: supplier 10 late (twice), supplier 20 on time ->
            # 10 is solely to blame, counted ONCE
            (1, 1, 10, 1.0, 1.0, 0.0, late),
            (1, 1, 10, 1.0, 1.0, 0.0, late),
            (1, 1, 20, 1.0, 1.0, 0.0, ontime),
            # order 2: suppliers 10 AND 20 both late -> nobody counted
            (2, 1, 10, 1.0, 1.0, 0.0, late),
            (2, 1, 20, 1.0, 1.0, 0.0, late),
            # order 3: single-supplier order, late -> no other supplier
            # exists, not counted
            (3, 1, 10, 1.0, 1.0, 0.0, late),
            # order 4: not status 'F' -> ignored entirely
            (4, 1, 30, 1.0, 1.0, 0.0, late),
        ],
    )
    supplier = spark.createDataFrame(
        [(10, "S10"), (20, "S20"), (30, "S30")], "s_suppkey long, s_name string"
    )
    out = {
        r.s_name: r.numwait
        for r in analytics.q21_waiting_suppliers(
            {"lineitem": li, "orders": orders, "supplier": supplier}
        ).collect()
    }
    assert out == {"S10": 1}


def test_q20_nested_having_threshold(spark):
    import datetime as dt

    d = dt.datetime(1996, 2, 1)
    li = _li(
        spark,
        [
            # supplier 1 ships 25 of part 1 (matching) -> over threshold
            (1, 1, 1, 25.0, 1.0, 0.0, d),
            # supplier 2 ships 25 of part 2 (NOT matching name) -> excluded
            (2, 2, 2, 25.0, 1.0, 0.0, d),
            # supplier 3 ships 10+9 of part 1, split lines -> 19 < 20
            (3, 1, 3, 10.0, 1.0, 0.0, d),
            (4, 1, 3, 9.0, 1.0, 0.0, d),
        ],
    )
    part = spark.createDataFrame(
        [(1, "blue bolt"), (2, "red widget")], "p_partkey long, p_name string"
    )
    supplier = spark.createDataFrame(
        [(1, "S1", 5.0, 0), (2, "S2", 5.0, 0), (3, "S3", 5.0, 0)],
        "s_suppkey long, s_name string, s_acctbal double, s_nationkey long",
    )
    nation = spark.createDataFrame(
        [(0, "NATION_2")], "n_nationkey long, n_name string"
    )
    out = analytics.q20_excess_shippers(
        {"lineitem": li, "part": part, "supplier": supplier, "nation": nation}
    ).collect()
    assert [r.s_suppkey for r in out] == [1]
