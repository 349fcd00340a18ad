"""functions/prefixsum: the range-partitioned two-phase cumulative sum —
bit-equality with the single global window, plan cleanliness, and the
tiny-offsets triangle join."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Window
from pyspark.sql import functions as F

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.functions.prefixsum import (
    bucket_prefix_offsets,
    ordered_cumsum,
)
from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.plans import (
    checks,
)


def _rand_df(spark, n=500, seed=7):
    """Skewed decimals with heavy duplication (forces cross-bucket ties)."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.floor(F.pow(F.rand(seed) * 10, 3)) / 100)
            .cast("decimal(18,2)")
            .alias("v"),
        )
    )


def test_ordered_cumsum_equals_global_window_desc_and_asc(spark):
    df = _rand_df(spark)
    for descending in (True, False):
        got = ordered_cumsum(
            df, "v", "v", ["k"], out_col="cum", descending=descending
        )
        head = F.col("v").desc() if descending else F.col("v").asc()
        w = Window.orderBy(head, F.col("k").asc()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        want = df.withColumn("cum", F.sum("v").over(w))
        g = {(r.k, r.cum) for r in got.collect()}
        e = {(r.k, r.cum) for r in want.collect()}
        assert g == e, f"descending={descending}"


def test_ordered_cumsum_plan_has_no_unpartitioned_window(spark):
    df = ordered_cumsum(_rand_df(spark), "v", "v", ["k"], descending=True)
    assert checks.unpartitioned_windows(df) == []


def test_bucket_prefix_offsets_exclusive_and_typed(spark):
    totals = spark.createDataFrame(
        [(0, Decimal("1.50")), (1, Decimal("2.25")), (3, Decimal("4.00"))],
        "b int, t decimal(18,2)",
    )
    got = {
        r.b: r.off
        for r in bucket_prefix_offsets(totals, "b", "t", "off").collect()
    }
    assert got == {
        0: Decimal("0.00"),
        1: Decimal("1.50"),
        3: Decimal("3.75"),
    }


def test_ordered_cumsum_single_row_and_all_equal(spark):
    one = spark.createDataFrame([(1, Decimal("5.00"))], "k long, v decimal(18,2)")
    [r] = ordered_cumsum(one, "v", "v", ["k"], descending=True).collect()
    assert r.cum == Decimal("5.00")
    # all-equal values: every row in one bucket, ties broken by k
    eq = spark.createDataFrame(
        [(k, Decimal("2.00")) for k in range(1, 8)], "k long, v decimal(18,2)"
    )
    rows = sorted(
        ordered_cumsum(eq, "v", "v", ["k"], descending=True).collect(),
        key=lambda r: r.k,
    )
    assert [r.cum for r in rows] == [
        Decimal("2.00") * i for i in range(1, 8)
    ]


def test_ordered_cummax_excl_equals_global_exclusive_window(spark):
    # unique sort key (v may tie, k breaks) — row-exclusive == value-exact
    df = _rand_df(spark, n=400, seed=11)
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.functions.prefixsum import (
        ordered_cummax_excl,
    )

    for descending in (True, False):
        for nb in (2, 7, 64):
            got = ordered_cummax_excl(
                df, "v", "v", ["k"], out_col="cm", descending=descending,
                n_buckets=nb,
            )
            head = F.col("v").desc() if descending else F.col("v").asc()
            w = Window.orderBy(head, F.col("k").asc()).rowsBetween(
                Window.unboundedPreceding, -1
            )
            want = df.withColumn("cm", F.max("v").over(w))
            g = {(r.k, r.cm) for r in got.collect()}
            e = {(r.k, r.cm) for r in want.collect()}
            assert g == e, f"descending={descending} n_buckets={nb}"


def test_ordered_cummax_excl_first_row_null_and_plan_clean(spark):
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.functions.prefixsum import (
        ordered_cummax_excl,
    )

    df = ordered_cummax_excl(_rand_df(spark, n=50), "v", "v", ["k"], out_col="cm")
    rows = df.collect()
    assert sum(1 for r in rows if r.cm is None) == 1  # exactly the global first
    assert checks.unpartitioned_windows(df) == []
