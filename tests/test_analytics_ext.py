"""JSON props extraction, rollup grouping sets, exact quantiles."""

from __future__ import annotations

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
    analytics,
)


def test_events_props_metric_parses_json(spark):
    events = spark.createDataFrame(
        [
            (1, "click", '{"k": 10}'),
            (2, "click", '{"k": 20}'),
            (3, "view", '{"k": 5}'),
            (4, "view", "not json"),
        ],
        "event_id long, event_type string, props string",
    )
    rows = {r.event_type: r for r in analytics.events_props_metric(events).collect()}
    assert rows["click"].sum_k == 30
    assert rows["click"].avg_k == 15.0
    # malformed JSON -> null k, excluded from sum/avg but counted as event
    assert rows["view"].n_events == 2
    assert rows["view"].sum_k == 5


def test_orders_rollup_levels(spark):
    orders = spark.createDataFrame(
        [(1, "F", "1-URGENT", 10.0), (2, "F", "2-HIGH", 20.0), (3, "O", "1-URGENT", 5.0)],
        "o_orderkey long, o_orderstatus string, o_orderpriority string, o_totalprice double",
    )
    rows = analytics.orders_rollup(orders).collect()
    by_key = {(r.o_orderstatus, r.o_orderpriority): r for r in rows}
    # detail rows (gid 0), per-status subtotals (gid 1), grand total (gid 3)
    assert by_key[("F", "1-URGENT")].gid == 0
    assert by_key[("F", None)].n_orders == 2
    assert by_key[("F", None)].gid == 1
    assert by_key[(None, None)].n_orders == 3
    assert by_key[(None, None)].gid == 3
    assert float(by_key[(None, None)].sum_price) == 35.0


def test_price_quantiles_exact(spark):
    lineitem = spark.createDataFrame(
        [("N", float(x)) for x in range(1, 101)],
        "l_returnflag string, l_extendedprice double",
    )
    r = analytics.price_quantiles(lineitem, exact=True).collect()[0]
    # exact interpolated percentiles over 1..100
    assert r.p25 == 25.75
    assert r.p50 == 50.5
    assert r.p75 == 75.25
    assert r.p95 == 95.05
    # the scale default (approx_percentile sketch) returns the discrete
    # value at rank ceil(p*n) — exact below the sketch accuracy
    s = analytics.price_quantiles(lineitem).collect()[0]
    assert (s.p25, s.p50, s.p75, s.p95) == (25.0, 50.0, 75.0, 95.0)


def test_value_anomalies_flags_outlier_only(spark):
    import datetime

    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators.analytics import (
        value_anomalies,
    )

    base = datetime.datetime(2024, 1, 1)
    # user 1: 20 values at ~10 plus one wild 1000 → only the 1000 flags;
    # user 2: constant values → zero variance, never anomalous
    rows = [(i, base, 1, "view", 10.0 + (i % 3) * 0.5, "{}") for i in range(20)]
    rows.append((99, base, 1, "view", 1000.0, "{}"))
    rows += [(200 + i, base, 2, "view", 5.0, "{}") for i in range(5)]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = value_anomalies(ev).collect()
    assert [r.event_id for r in out] == [99]
    assert out[0].zscore > 3


def test_table_profile_stats(spark):
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators.analytics import (
        table_profile,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a")], "id long, tag string"
    )
    rows = {r.column: r for r in table_profile(df).collect()}
    assert rows["id"].n_rows == 3 and rows["id"].n_null == 0
    assert rows["id"].n_distinct == 3
    assert (rows["id"].min_value, rows["id"].max_value) == ("1", "3")
    assert rows["tag"].n_null == 1
    assert rows["tag"].n_distinct == 1  # nulls don't count as a value
    assert rows["tag"].max_value == "a"


def test_table_profile_scaled_estimates(spark):
    df = spark.createDataFrame(
        [(i % 10, None if i % 5 == 0 else f"v{i % 3}") for i in range(100)],
        "k long, s string",
    )
    out = {r.column: r for r in analytics.table_profile_scaled(df).collect()}
    # columns with < k distinct values: the sketch holds them all and the
    # estimate IS the exact count
    assert out["k"].distinct_est == 10.0
    assert out["s"].distinct_est == 3.0  # v0/v1/v2; nulls not a value
    assert out["s"].n_null == 20 and out["k"].n_rows == 100
    assert out["k"].min_value == "0" and out["k"].max_value == "9"


def test_mad_anomalies_flags_planted_outlier_and_resists_contamination(spark):
    """A 100x spike is flagged; the median/MAD centre stays at the bulk
    (the z-score screen's std would have been inflated by the spike)."""
    import datetime as dt

    rows = [
        (i, dt.datetime(2026, 1, 1, 0, 0, i % 60), i, "m", float(v), "{}")
        for i, v in enumerate([10.0, 11.0, 9.0, 10.5, 9.5, 10.0, 12.0, 8.0, 1000.0])
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.event_type: r for r in analytics.mad_anomalies(ev).collect()}
    r = out["m"]
    assert r.n == 9
    assert r.med_value == 10.0  # unmoved by the spike
    assert r.mad_value == 1.0
    assert r.n_outliers == 1
    assert abs(r.outlier_frac - round(1 / 9, 6)) < 1e-9


def test_abc_pareto_partitions_and_ordered_shares(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    out = {r.abc_class: r for r in analytics.abc_pareto(li, pt).collect()}
    assert set(out) == {"A", "B", "C"}
    n_parts_with_sales = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .select("l_partkey")
        .distinct()
        .count()
    )
    assert sum(r.n_parts for r in out.values()) == n_parts_with_sales
    shares = {k: r.revenue_share for k, r in out.items()}
    assert abs(sum(shares.values()) - 1.0) < 1e-4
    # the Pareto head: A covers at most 80% (boundary-exclusive classing)
    assert shares["A"] <= 0.8
    assert shares["A"] + shares["B"] <= 0.95
    # each A part out-earns each C part on average
    avg = {k: out[k].class_revenue / out[k].n_parts for k in out}
    assert avg["A"] > avg["B"] > avg["C"]


def test_customer_rfm_segments_partition_customers(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = analytics.customer_rfm(orders).collect()
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r.n_customers for r in out) == n_cust
    for r in out:
        seg = r.segment
        rb, fb, mb = seg // 100, (seg // 10) % 10, seg % 10
        assert 1 <= rb <= 4 and 1 <= fb <= 4 and 1 <= mb <= 4
        assert r.mean_recency_days >= 0
    # quartile banding actually spreads customers across segments
    assert len(out) > 1


def test_supplier_hhi_bounds_and_monopoly(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    out = analytics.supplier_concentration(li, sup, nat).collect()
    assert out
    for r in out:
        # HHI ∈ [1/n, 1]; equality at 1 iff one supplier takes everything
        assert 1.0 / r.n_suppliers - 1e-6 <= r.hhi <= 1.0 + 1e-9
        assert 0.0 < r.top_share <= 1.0
        # top share² is a lower bound on HHI, top share an upper bound
        assert r.top_share ** 2 - 1e-6 <= r.hhi <= r.top_share + 1e-9


def test_user_value_correlation_sign_and_bounds(spark):
    """Users whose spend scales with their event count correlate
    positively and near 1; the statistic stays within [-1, 1]."""
    import datetime as dt

    rows = []
    eid = 0
    for user, n in [(1, 2), (2, 4), (3, 6), (4, 8)]:
        for _ in range(n):
            rows.append(
                (eid, dt.datetime(2026, 1, 1 + eid % 20), user, "v", 10.0, "{}")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    r = analytics.user_value_correlation(ev).collect()[0]
    assert r.n_users == 4
    assert r.corr == 1.0  # y = 10·x exactly
    assert r.mean_events == 5.0


def test_repeat_purchase_intervals_known_gaps(spark):
    import datetime as dt

    def o(k, cust, d):
        return (k, cust, "O", 10.0, dt.date(2026, 1, d), "1-URGENT")

    orders = spark.createDataFrame(
        # cust 1: days 1,3,10 → gaps 2,7; cust 2: one order → no gap;
        # cust 3: same-day pair → deterministic 0 gap via orderkey tie-break
        [o(1, 1, 1), o(2, 1, 3), o(3, 1, 10), o(4, 2, 5), o(5, 3, 7), o(6, 3, 7)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    )
    r = analytics.repeat_purchase_intervals(orders).collect()[0]
    assert r.n_gaps == 3
    assert r.n_repeat_customers == 2
    assert abs(r.mean_gap_days - 3.0) < 1e-9  # (2+7+0)/3
    assert r.p50_gap_days == 2.0


def test_user_behavior_entropy_known_values(spark):
    import math

    from datetime import datetime

    ts = datetime(2026, 1, 1)
    events = spark.createDataFrame(
        [
            # user 1: 2 types, 1 each -> H = ln 2
            (1, ts, 1, "a", 0.0),
            (2, ts, 1, "b", 0.0),
            # user 2: single type -> H = 0 exactly
            (3, ts, 2, "a", 0.0),
            (4, ts, 2, "a", 0.0),
            # user 3: counts 3 and 1 -> H = ln4 - (3 ln3)/4
            (5, ts, 3, "a", 0.0),
            (6, ts, 3, "a", 0.0),
            (7, ts, 3, "a", 0.0),
            (8, ts, 3, "b", 0.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
        analytics,
    )

    rows = {r.user_id: r for r in analytics.user_behavior_entropy(events).collect()}
    assert (rows[1].n_events, rows[1].n_types) == (2, 2)
    assert abs(rows[1].entropy_nats - math.log(2)) < 1e-5
    assert rows[2].entropy_nats == 0.0
    assert abs(rows[3].entropy_nats - (math.log(4) - 3 * math.log(3) / 4)) < 1e-5


def test_referential_audit_counts_orphans_and_null_keys(spark):
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
        analytics,
    )

    lineitem = spark.createDataFrame(
        [
            (1, 10, 100, 1.0),     # all parents exist
            (1, 10, 100, 2.0),
            (2, 99, 100, 3.0),     # orphan partkey
            (None, 10, 999, 4.0),  # null orderkey AND orphan suppkey
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double",
    )
    orders = spark.createDataFrame(
        [(1, 5), (2, 6), (3, None)], "o_orderkey long, o_custkey long"
    )
    customer = spark.createDataFrame([(5,)], "c_custkey long")
    supplier = spark.createDataFrame([(100,)], "s_suppkey long")
    part = spark.createDataFrame([(10,)], "p_partkey long")
    got = {
        r.relationship: (r.n_rows, r.n_null_keys, r.n_orphans)
        for r in analytics.referential_audit(
            lineitem, orders, customer, supplier, part
        ).collect()
    }
    assert got == {
        "lineitem->orders": (4, 1, 0),
        "lineitem->part": (4, 0, 1),
        "lineitem->supplier": (4, 0, 1),
        "orders->customer": (3, 1, 1),  # custkey 6 orphan, one null
    }


def test_equal_frequency_bins_quartiles_of_1_to_100(spark):
    from pyspark.sql import functions as F

    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
        analytics,
    )

    df = spark.range(1, 101).select(
        (F.col("id").cast("double")).alias("l_extendedprice")
    )
    rows = {
        r.bin_id: r
        for r in analytics.equal_frequency_bins(
            df, "l_extendedprice", 4
        ).collect()
    }
    # edges 25/50/75; strict-less rule puts each edge value in the LOWER bin
    assert {b: (rows[b].n_rows, rows[b].min_value, rows[b].max_value) for b in rows} == {
        0: (25, 1.0, 25.0),
        1: (25, 26.0, 50.0),
        2: (25, 51.0, 75.0),
        3: (25, 76.0, 100.0),
    }
    assert rows[0].mean_value == 13.0


def test_column_correlation_matrix_known_signs(spark):
    from decimal import Decimal

    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
        analytics,
    )

    # a = 1..4; b = 2a (corr +1); c = -a + 10 (corr -1 with a and b)
    rows = [
        (Decimal(i), Decimal(2 * i), Decimal(10 - i)) for i in range(1, 5)
    ]
    df = spark.createDataFrame(
        rows, "a decimal(18,2), b decimal(18,2), c decimal(18,2)"
    )
    got = {
        (r.col_a, r.col_b): r.corr
        for r in analytics.column_correlation_matrix(df, ("a", "b", "c")).collect()
    }
    assert got == {("a", "b"): 1.0, ("a", "c"): -1.0, ("b", "c"): -1.0}


def test_uniqueness_audit_counts_duplicates(spark):
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
        analytics,
    )

    t = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (None, "z"), (None, "w")],
        "k long, v string",
    )
    got = {
        (r.table_name, r.key_cols): (
            r.n_rows,
            r.n_distinct_keys,
            r.n_duplicate_rows,
        )
        for r in analytics.uniqueness_audit(
            [("t", t, ["k"]), ("t", t, ["k", "v"])]
        ).collect()
    }
    # null groups like a value: keys {1, 2, NULL} -> 3 distinct, 2 dups
    assert got[("t", "k")] == (5, 3, 2)
    assert got[("t", "k,v")] == (5, 5, 0)


def test_category_association_extremes(spark):
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
        analytics,
    )

    # perfect association: b == a -> V = 1
    rows = [("p", "p")] * 4 + [("q", "q")] * 6
    df = spark.createDataFrame(rows, "a string, b string")
    [r] = analytics.category_association(df, "a", "b").collect()
    assert (r.n, r.n_cat_a, r.n_cat_b, r.cramers_v) == (10, 2, 2, 1.0)
    # independence: uniform 2x2 -> chi2 = 0, V = 0
    rows = [("p", "p"), ("p", "q"), ("q", "p"), ("q", "q")] * 3
    df = spark.createDataFrame(rows, "a string, b string")
    [r] = analytics.category_association(df, "a", "b").collect()
    assert (r.chi2, r.cramers_v) == (0.0, 0.0)


def test_value_lognormal_fit_constant_and_known(spark):
    import math

    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
        analytics,
    )

    # constant value: sigma = 0, mu = ln(v)
    df = spark.createDataFrame([(100.0,)] * 5, "o_totalprice double")
    [r] = analytics.value_lognormal_fit(df).collect()
    assert r.n == 5
    assert abs(r.mu_nats - math.log(100.0)) < 1e-5
    assert r.sigma_nats == 0.0
    # non-positive values are excluded from the fit
    df = spark.createDataFrame(
        [(math.e,), (math.e**3,), (0.0,), (-5.0,)], "o_totalprice double"
    )
    [r] = analytics.value_lognormal_fit(df).collect()
    assert r.n == 2
    assert abs(r.mu_nats - 2.0) < 1e-5
    assert abs(r.sigma_nats - 1.0) < 1e-5


def test_value_psi_identical_halves_zero_and_shift_positive(spark):
    import math

    from datetime import datetime, timedelta

    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
        analytics,
    )

    t0 = datetime(2026, 1, 1)
    mk = lambda i, v: (i, t0 + timedelta(minutes=i), 1, "a", float(v))  # noqa: E731
    # identical value multisets in both halves -> every term ln(1) = 0
    vals = list(range(1, 21))
    rows = [mk(i, v) for i, v in enumerate(vals)] + [
        mk(100 + i, v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    [r] = analytics.value_psi(df).collect()
    assert (r.n_baseline, r.n_current, r.psi) == (20, 20, 0.0)
    assert r.n_degenerate_bins == 0
    # shifted second half -> strictly positive psi, degenerate bins appear
    rows = [mk(i, v) for i, v in enumerate(vals)] + [
        mk(100 + i, v + 100) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    [r] = analytics.value_psi(df).collect()
    assert r.psi >= 0.0
    assert r.n_degenerate_bins > 0  # disjoint supports -> one-sided bins
    assert math.isfinite(r.psi)


def test_domain_constraints_audit_counts_violations(spark):
    from datetime import datetime

    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
        analytics,
    )

    ts = datetime(2026, 1, 1)
    lineitem = spark.createDataFrame(
        [
            (1.0, 0.05, "N", ts, 0.02),     # clean
            (0.0, 1.5, "X", None, -0.1),    # violates all five
            (2.0, None, None, ts, 0.0),     # null discount + null flag
        ],
        "l_quantity double, l_discount double, l_returnflag string, "
        "l_shipdate timestamp, l_tax double",
    )
    orders = spark.createDataFrame(
        [("F", 10.0), ("Z", 0.0), (None, None)],
        "o_orderstatus string, o_totalprice double",
    )
    got = {
        (r.table_name, r.rule): (r.n_rows, r.n_violations)
        for r in analytics.domain_constraints_audit(lineitem, orders).collect()
    }
    assert got == {
        ("lineitem", "l_discount in [0,1]"): (3, 2),
        ("lineitem", "l_quantity > 0"): (3, 1),
        ("lineitem", "l_returnflag in (A,N,R)"): (3, 2),
        ("lineitem", "l_shipdate not null"): (3, 1),
        ("lineitem", "l_tax >= 0"): (3, 1),
        ("orders", "o_orderstatus in (F,O,P)"): (3, 2),
        ("orders", "o_totalprice > 0"): (3, 2),
    }


def test_referential_audit_duplicate_parent_keys_do_not_fan_out(spark):
    """A duplicated parent key (the dirty-data case these audits screen
    for) must NOT multiply matched child rows: counts are over the
    key-distinct parent relation."""
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
        analytics,
    )

    lineitem = spark.createDataFrame(
        [(1, 10, 100, 1.0), (1, 10, 100, 2.0), (2, 10, 100, 3.0)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double",
    )
    # orderkey 1 appears TWICE in the parent
    orders = spark.createDataFrame(
        [(1, 5), (1, 5), (2, 6)], "o_orderkey long, o_custkey long"
    )
    customer = spark.createDataFrame([(5,), (6,)], "c_custkey long")
    supplier = spark.createDataFrame([(100,)], "s_suppkey long")
    part = spark.createDataFrame([(10,)], "p_partkey long")
    got = {
        r.relationship: (r.n_rows, r.n_null_keys, r.n_orphans)
        for r in analytics.referential_audit(
            lineitem, orders, customer, supplier, part
        ).collect()
    }
    # without the distinct, lineitem->orders would report n_rows = 5
    assert got["lineitem->orders"] == (3, 0, 0)
    # the duplicated parent's own child leg is unaffected
    assert got["orders->customer"] == (3, 0, 0)


def test_category_association_degenerate_single_category_is_null(spark):
    """dof = 0 (one distinct value on either side) discloses NULL, not a
    NaN from 0/0."""
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
        analytics,
    )

    df = spark.createDataFrame(
        [("only", "p"), ("only", "q"), ("only", "p")], "a string, b string"
    )
    [r] = analytics.category_association(df, "a", "b").collect()
    assert (r.n, r.n_cat_a, r.n_cat_b) == (3, 1, 2)
    assert r.chi2 == 0.0
    assert r.cramers_v is None


def test_dq_report_diff_between_cuts(spark, tmp_path):
    """The unified DQ artifact diffs between cuts: a clean baseline vs a
    dirtied current cut flags exactly the worsened checks, keeps clean
    ones 'same', and labels checks present on one side only."""
    from pyspark.sql import functions as F

    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
        analytics,
    )

    def tables(dirty):
        lineitem = spark.createDataFrame(
            [(1, 10, 100, 1, 5.0, 0.1, 0.05, "A", "2024-01-01"),
             (2, 10, 100, 1, 3.0, 0.2, 0.0, "N", "2024-01-02")],
            "l_orderkey long, l_partkey long, l_suppkey long,"
            " l_linenumber int, l_quantity double, l_discount double,"
            " l_tax double, l_returnflag string, l_shipdate_s string",
        ).selectExpr("*", "cast(l_shipdate_s as timestamp) AS l_shipdate")
        orders = spark.createDataFrame(
            [(1, 5, "F", 10.0), (2, 5, "O", 20.0)]
            + ([(2, 5, "X", -1.0)] if dirty else []),  # dup PK + 2 domain hits
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double",
        )
        customer = spark.createDataFrame([(5,)], "c_custkey long")
        supplier = spark.createDataFrame([(100,)], "s_suppkey long")
        part = spark.createDataFrame([(10,)], "p_partkey long")
        events = spark.createDataFrame([(1,), (2,)], "event_id long")
        return lineitem, orders, customer, supplier, part, events

    base = analytics.dq_report(*tables(dirty=False))
    cur = analytics.dq_report(*tables(dirty=True))
    analytics.dq_report_save(base, str(tmp_path / "dq_base"))
    analytics.dq_report_save(cur, str(tmp_path / "dq_cur"))
    base_l = analytics.dq_report_load(spark, str(tmp_path / "dq_base"))
    cur_l = analytics.dq_report_load(spark, str(tmp_path / "dq_cur"))
    diff = {
        (r.check_type, r.subject, r.detail): (r.violation_delta, r.status)
        for r in analytics.dq_report_diff(cur_l, base_l).collect()
    }
    assert diff[("uniqueness", "orders", "unique(o_orderkey)")] == (1, "worse")
    assert diff[("domain", "orders", "o_orderstatus in (F,O,P)")] == (1, "worse")
    assert diff[("domain", "orders", "o_totalprice > 0")] == (1, "worse")
    assert diff[("referential", "lineitem->orders", "orphans")] == (0, "same")
    assert all(
        s == "same" for (ct, _su, _d), (_delta, s) in diff.items()
        if ct == "referential"
    )
    # one-sided checks
    extra = cur_l.unionByName(
        spark.createDataFrame(
            [("custom", "t", "new rule", 1, 0, 0.0)], cur_l.schema
        )
    )
    d2 = {
        (r.check_type, r.subject, r.detail): r.status
        for r in analytics.dq_report_diff(extra, base_l).collect()
    }
    assert d2[("custom", "t", "new rule")] == "new_check"
    d3 = {
        (r.check_type, r.subject, r.detail): r.status
        for r in analytics.dq_report_diff(base_l, extra).collect()
    }
    assert d3[("custom", "t", "new rule")] == "removed_check"
