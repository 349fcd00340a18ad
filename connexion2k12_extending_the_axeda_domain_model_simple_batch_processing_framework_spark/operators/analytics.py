"""Relational analytics operators — the engine's general query surface.

TPC-H-shaped plans chosen to exercise the physical strategies that matter at
100 TB: decimal-exact grouped aggregation (Q1), broadcast-dim star joins
(Q3/Q5), window top-k, time-bucketed rollups, semi/anti joins, conditional
pivots. Money math follows SURVEY.md §6: cast to DECIMAL(18,2) *before*
aggregation so sums are exact and oracle-hash-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

D = "decimal(18,2)"


def q1_pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """Pricing summary report. Single scan → partial agg → final agg; the
    shipdate filter is pushed to the parquet scan; no joins, one shuffle on
    the 6-ish distinct group keys (tiny reduce side even at 100 TB)."""
    qty = F.col("l_quantity").cast(D)
    price = F.col("l_extendedprice").cast(D)
    disc = F.col("l_discount").cast(D)
    tax = F.col("l_tax").cast(D)
    disc_price = price * (1 - disc)
    charge = disc_price * (1 + tax)
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            F.sum(price).alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(charge).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
            F.round(
                (F.sum(qty) / F.count(F.lit(1))).cast("double"), 4
            ).alias("avg_qty"),
        )
    )


def q3_shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1995-03-15",
) -> DataFrame:
    """Revenue of unshipped orders. Customer-filter side is broadcast; the
    orders⋈lineitem join shuffles on orderkey; top-10 via
    TakeOrderedAndProject (no global sort)."""
    revenue = (F.col("l_extendedprice").cast(D) * (1 - F.col("l_discount").cast(D)))
    cut = F.lit(cutoff).cast("timestamp")
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    return (
        orders.filter(F.col("o_orderdate") < cut)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            lineitem.filter(F.col("l_shipdate") > cut),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q5_local_supplier_volume(
    tables: dict[str, DataFrame], region: str = "ASIA"
) -> DataFrame:
    """Star join: region→nation are broadcast dims; supplier joins on
    (suppkey, nationkey) to enforce the local-supplier condition; the only
    large shuffles are orders⋈lineitem and ⋈customer on their keys."""
    t = tables
    nations = (
        t["nation"]
        .join(F.broadcast(t["region"].filter(F.col("r_name") == region)),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    revenue = F.col("l_extendedprice").cast(D) * (1 - F.col("l_discount").cast(D))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue).alias("revenue"))
    )


def top_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """Top-k orders by totalprice per customer — one shuffle on custkey,
    rank computed within partitions, deterministic orderkey tiebreak."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


def events_hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling-window rollup: hour bucket × event_type counts + exact sums.
    Equivalent to a Structured Streaming windowed agg in batch form."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(D)).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


SLIDE_WINDOW = "1 hour"
SLIDE_STEP = "30 minutes"


def events_sliding_rollup(events: DataFrame) -> DataFrame:
    """Sliding-window rollup: 1-hour windows every 30 minutes, so each
    event lands in exactly window/slide = 2 windows. ``F.window`` expands
    the memberships as a generator BEFORE the shuffle — output volume is
    2× the input feeding one groupBy (map-side combined), not a
    self-join of hour buckets. The streaming twin is the same expression
    under ``readStream`` + a watermark.

    Output: window_start, event_type, n_events, sum_value, n_users.
    """
    win = F.window(F.col("ts"), SLIDE_WINDOW, SLIDE_STEP)
    return (
        events.groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(D)).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users",
        )
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS). At scale: shuffle-partitioned on the
    key; AQE converts to broadcast when the orders key set is small."""
    return customer.join(
        orders.select("o_custkey"), customer.c_custkey == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


def events_type_pivot(events: DataFrame) -> DataFrame:
    """Conditional-aggregation pivot: one pass, one shuffle on user_id —
    the classic replacement for N separate filtered joins."""
    def n_of(t: str):
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).cast("long").alias(f"n_{t}")

    return events.groupBy("user_id").agg(
        *[n_of(t) for t in ["click", "view", "purchase", "signup", "error"]],
        F.sum(F.when(F.col("event_type") == "purchase", F.col("value").cast(D)).otherwise(F.lit(0).cast(D))).alias("purchase_value"),
    )


def events_props_metric(events: DataFrame) -> DataFrame:
    """Semi-structured path: parse the JSON ``props`` column and aggregate
    the embedded metric per event_type. JSON parsing is a JVM-side
    expression (get_json_object) evaluated during the scan projection —
    no UDF, prunes to two columns at the reader."""
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
    )


def orders_rollup(orders: DataFrame) -> DataFrame:
    """Multi-level totals in one pass: ROLLUP over (orderstatus,
    orderpriority) computes per-(status,priority), per-status and grand
    totals in a single shuffle instead of three queries. ``grouping_id``
    disambiguates the NULL-as-total rows."""
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(D)).alias("sum_price"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


def price_quantiles(lineitem: DataFrame) -> DataFrame:
    """Exact interpolated quantiles of extendedprice per returnflag — the
    distribution statistics a quality/outlier filter needs. Exact
    ``percentile`` (not approx) so the oracle matches bit-for-bit after
    rounding; at 100 TB you'd swap in approx_percentile and accept the
    documented error bound."""
    pct = F.percentile(F.col("l_extendedprice"), F.array(*[F.lit(x) for x in (0.25, 0.5, 0.75, 0.95)]))
    return (
        lineitem.groupBy("l_returnflag")
        .agg(pct.alias("q"))
        .select(
            "l_returnflag",
            F.round(F.col("q")[0], 4).alias("p25"),
            F.round(F.col("q")[1], 4).alias("p50"),
            F.round(F.col("q")[2], 4).alias("p75"),
            F.round(F.col("q")[3], 4).alias("p95"),
        )
    )


def events_moving_avg(events: DataFrame, window_rows: int = 3) -> DataFrame:
    """Per-user trailing moving average of event values (current row +
    ``window_rows`` preceding), ordered by (ts, event_id).

    Single shuffle on user_id, then a sorted frame scan per partition — the
    canonical streaming-feature backfill (e.g. "user's recent spend") as
    one window plan. Skewed power-users are bounded by AQE skew handling;
    the frame is ROWS-based so memory per group is O(window_rows).
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-window_rows, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.col("value").cast("double").alias("value"),
        F.round(F.avg(F.col("value").cast("double")).over(w), 6).alias("moving_avg"),
    )


def value_histogram(events: DataFrame, bucket_width: float = 10.0) -> DataFrame:
    """Fixed-width histogram of event values: one groupBy on the bucket
    index (map-side combine ⇒ shuffle rows = #buckets × partitions no
    matter the input size) — the profiling primitive for choosing filter
    thresholds over a 100 TB column."""
    bucket = F.floor(F.col("value") / bucket_width).cast("long")
    return (
        events.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
    )


ANOMALY_Z = 3.0


def value_anomalies(events: DataFrame, z_threshold: float = ANOMALY_Z) -> DataFrame:
    """Per-user z-score outliers: events whose value deviates more than
    ``z_threshold`` standard deviations from that user's mean — the basic
    telemetry anomaly screen (the reference's task stream has no numeric
    QA at all; this is the distributed version of "flag weird readings").

    Two-pass shape: pass 1 reduces each user to three EXACT numbers
    (count, sum, sum of squares — value is a 2-decimal reading, so both
    sums run in DECIMAL: order-independent, bit-identical across
    partitionings and engines, unlike a double sum); pass 2 re-joins the
    per-user stats (AQE broadcasts the small side) and flags rows. Sample
    standard deviation (n-1); single-event users have no std and are
    never anomalous. Shuffles: one groupBy on user_id + the stats join —
    both on the same key, co-partitioned.
    """
    d = F.col("value").cast("decimal(18,2)")
    stats = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(d).alias("__s"),
        F.sum(d * d).alias("__ss"),
    )
    n, s, ss = F.col("__n"), F.col("__s").cast("double"), F.col("__ss").cast("double")
    mean = s / n
    var = F.when(n > 1, (ss - s * s / n) / (n - 1)).otherwise(F.lit(None))
    std = F.sqrt(var)
    z = F.when(std > 0, (F.col("value") - mean) / std)
    return (
        events.select("event_id", "user_id", "value")
        .join(stats, "user_id")
        .select(
            "event_id",
            "user_id",
            "value",
            F.round(mean, 6).alias("user_mean"),
            F.round(z, 6).alias("zscore"),
        )
        .filter(F.abs(F.col("zscore")) > z_threshold)
    )


def table_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Data profiling — the first query anyone runs on 100 TB of new
    data: per column, row count, null count, exact distinct count, and
    the native min/max rendered as strings (one schema for all types).

    ONE aggregation pass computes every column's stats (Spark plans the
    multi-distinct via a single Expand + shuffle — column-count×, not
    pass-count×); the per-column output rows come from inlining a
    struct array over the 1-row aggregate, not from re-scanning. At
    100 TB swap countDistinct for approx_count_distinct (HLL) per the
    engine's documented cardinality policy; exact here for the oracle.
    """
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
            F.countDistinct(F.col(c)).alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").cast("long").alias("n_rows"),
                F.col(f"__null_{c}").cast("long").alias("n_null"),
                F.col(f"__dist_{c}").cast("long").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return row.select(F.inline(entries))


def q10_returned_items(tables: dict, date_from: str, date_to: str, k: int = 20) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by revenue lost to returned items
    in a quarter — the reference's error-anchor reporting
    (GetBatchErrors.groovy) generalized to a revenue ranking.

    Plan: the orders date filter pushes to the scan; orders ⋈ lineitem
    shuffles on the key (the two fact tables); customer joins the
    aggregated result and nation broadcasts. Decimal-exact revenue; the
    top-k is a TakeOrdered, not a global sort.
    """
    d = "decimal(18,2)"
    li = tables["lineitem"].filter(F.col("l_returnflag") == "R")
    o = tables["orders"].filter(
        (F.col("o_orderdate") >= date_from) & (F.col("o_orderdate") < date_to)
    )
    rev = (F.col("l_extendedprice").cast(d) * (1 - F.col("l_discount").cast(d))).alias(
        "rev"
    )
    per_cust = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c_custkey"), rev)
        .groupBy("c_custkey")
        .agg(F.sum("rev").alias("revenue"))
    )
    cust = tables["customer"].select("c_custkey", "c_name", "c_nationkey")
    nat = tables["nation"].select("n_nationkey", "n_name")
    return (
        per_cust.join(cust, "c_custkey")
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .select("c_custkey", "c_name", "n_name", F.col("revenue").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(k)
    )


Q18_MIN_QTY = 300


def q18_large_volume_orders(tables: dict, min_qty: int = Q18_MIN_QTY, k: int = 50) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds a
    threshold, with customer detail — the HAVING-on-aggregate +
    semi-join-back pattern.

    The qualifying-order set comes from ONE aggregation of lineitem
    (map-side combined, decimal-exact), and both fact tables join it by
    key; the order spine never re-aggregates. Top-k is a TakeOrdered on
    (qty desc, key).

    Join strategy: NO static broadcast hint on customer — customer grows
    with the fact tables (TPC-H: 150k × SF rows), so a pinned broadcast
    OOMs executors at 100×. AQE picks the build side at runtime from
    actual sizes: the qualifying-order set (a >min_qty HAVING over the
    order population — tiny at every SF by selectivity) broadcasts into
    the customer join, and customer degrades to a shuffle join the moment
    it exceeds spark.sql.autoBroadcastJoinThreshold. Both regimes are
    pinned by tests/test_plans.py.
    """
    d = "decimal(18,2)"
    li = tables["lineitem"].select(
        "l_orderkey", F.col("l_quantity").cast(d).alias("qty")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("qty").alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    o = tables["orders"].select("o_orderkey", "o_custkey", "o_orderdate")
    c = tables["customer"].select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            "c_name",
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            "o_orderdate",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey").asc())
        .limit(k)
    )


def q7_nation_volume(
    tables: dict,
    nation_a: str,
    nation_b: str,
    date_from: str = "1995-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q7 shape: bilateral shipping volume between two nations by
    year — the two-role dimension pattern: nation joins the fact pipeline
    TWICE under different roles (supplier's nation, customer's nation),
    each a broadcast; the pair predicate keeps both directions.

    Plan: the date filter pushes to the lineitem scan; lineitem ⋈ orders
    shuffles on the order key (fact-fact); supplier and customer join
    their keys (AQE chooses the side); both nation roles broadcast
    (constant-size dims). One final groupBy on (supp_nation, cust_nation,
    year) — decimal-exact revenue, then double for output.
    """
    d = "decimal(18,2)"
    li = tables["lineitem"].filter(
        (F.col("l_shipdate") >= date_from) & (F.col("l_shipdate") < date_to)
    )
    o = tables["orders"].select("o_orderkey", "o_custkey")
    c = tables["customer"].select("c_custkey", "c_nationkey")
    s = tables["supplier"].select("s_suppkey", "s_nationkey")
    n1 = tables["nation"].select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = tables["nation"].select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    vol = (F.col("l_extendedprice").cast(d) * (1 - F.col("l_discount").cast(d))).alias(
        "vol"
    )
    pair_ok = (
        (F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b)
    ) | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair_ok)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            vol,
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("vol").cast("double").alias("revenue"))
    )


def q16_supplier_diversity(
    tables: dict,
    exclude_brand: str = "Brand#1",
    sizes: tuple[int, ...] = (10, 20, 30, 40),
) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each surviving
    (brand, type, size) part class — the NOT-IN + count-distinct pattern.
    The part-supplier relation comes from observed lineitem pairs (the
    schema has no partsupp table); "complaint" suppliers (negative account
    balance) are excluded with an ANTI join.

    Plan: the (partkey, suppkey) distinct is one map-side-combined
    shuffle of two long columns; the exclusion set is tiny → broadcast
    anti-join; part attributes join on partkey (AQE picks the side); the
    count-distinct groups on (brand, type, size). Filters on part push to
    its scan.
    """
    rel = (
        tables["lineitem"].select(
            F.col("l_partkey").alias("p_key"), F.col("l_suppkey").alias("s_key")
        )
        .distinct()
    )
    bad = tables["supplier"].filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("s_key")
    )
    parts = tables["part"].filter(
        (F.col("p_brand") != exclude_brand) & (F.col("p_size").isin(*sizes))
    ).select(F.col("p_partkey").alias("p_key"), "p_brand", "p_type", "p_size")
    return (
        rel.join(F.broadcast(bad), "s_key", "left_anti")
        .join(parts, "p_key")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("s_key")).alias("supplier_cnt"))
        .select(
            "p_brand",
            "p_type",
            F.col("p_size").cast("long").alias("p_size"),
            F.col("supplier_cnt").cast("long").alias("supplier_cnt"),
        )
    )
