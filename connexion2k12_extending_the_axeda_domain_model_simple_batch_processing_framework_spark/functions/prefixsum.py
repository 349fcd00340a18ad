"""Range-partitioned two-phase prefix sums.

A global cumulative aggregate expressed as ``F.sum(x).over(Window.orderBy(...))``
funnels the ENTIRE relation through one task (Spark itself warns ``WindowExec:
No Partition Defined``) — invisible at test scale, fatal at 100 TB. The fix is
always the same two-phase shape (cf. operators/corpus.py:sequence_pack's
hash-bucketed stream offsets): split the total order into contiguous ranges,
cumulative-sum WITHIN each range in parallel, and add each range's broadcast
prefix offset. Because addition is associative (and the engine keeps DECIMAL
exact), the result is bit-identical to the single-window computation.

This module makes that shape a reusable primitive:

- ``bucket_prefix_offsets`` — the tiny exclusive prefix over per-bucket
  totals, computed with a triangular broadcast self-join instead of a
  partition-less Window, so callers stay clean under the suite-wide
  no-unpartitioned-window plan contract (tests/test_plans.py).
- ``ordered_cumsum`` — the full primitive: global cumulative sum of a value
  column in (range_col [, tiebreaks…]) order. Range boundaries come from one
  ``approx_percentile`` pass (a constant-size mergeable sketch); the bucket id
  is the count of cut points beyond the row's range value, which is monotone
  in the sort order and identical for ties, so bucket-major order IS the
  requested total order.
- ``ordered_cummax_excl`` — the same three-pass shape for the OTHER
  associative-idempotent reduction, EXCLUSIVE running max: each row gets the
  max of ``value_col`` over all strictly-preceding rows (NULL for the global
  first). This is the primitive behind skyline/Pareto-frontier queries
  ("is any earlier point already at least this good?") — the naive
  formulation is either an all-pairs dominance join (quadratic) or a
  partition-less Window (one task at 100 TB); two-phase max is neither.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .checkpoint import cut_lineage

# 64 contiguous value-range buckets: wide enough that no bucket holds more
# than a few percent of the relation even under moderate value skew, small
# enough that the offsets relation broadcast is trivially tiny.
PREFIX_BUCKETS = 64


def bucket_prefix_offsets(
    totals: DataFrame,
    bucket_col: str,
    total_col: str | list[str],
    out_col: str | list[str] = "__boff",
) -> DataFrame:
    """Exclusive prefix sum(s) over a tiny bounded bucket-totals relation:
    each bucket's offset = the sum of every STRICTLY-lower bucket's total.
    Accepts one total column or a list — every column rides the SAME
    triangular join (one plan subtree however many cumulatives a caller
    needs).

    Shape: a triangular broadcast self-join + re-aggregation — O(B²) pairs
    over B = O(dozens) rows, no Window at all. (The obvious
    ``Window.orderBy(bucket)`` is a partition-less WindowExec; harmless on a
    bounded relation but indistinguishable in the plan from the 100 TB
    killer, so the suite-wide plan contract bans the node outright and this
    helper keeps bounded prefix sums expressible.)
    """
    total_cols = [total_col] if isinstance(total_col, str) else list(total_col)
    out_cols = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(total_cols) != len(out_cols):
        raise ValueError("total_col and out_col lengths differ")
    dtypes = dict(totals.dtypes)
    prev = totals.select(
        F.col(bucket_col).alias("__pb"),
        *[F.col(t).alias(f"__pt{i}") for i, t in enumerate(total_cols)],
    )
    return (
        totals.join(F.broadcast(prev), F.col("__pb") < F.col(bucket_col), "left")
        .groupBy(bucket_col, *total_cols)
        .agg(
            *[
                F.coalesce(F.sum(f"__pt{i}"), F.lit(0).cast(dtypes[t])).alias(o)
                for i, (t, o) in enumerate(zip(total_cols, out_cols))
            ]
        )
    )


def _bucketize(
    df: DataFrame, range_col: str, n_buckets: int, descending: bool
) -> DataFrame:
    """Shared pass 0: tag each row with its contiguous range bucket ``__b``.
    Cut points come from one ``approx_percentile`` aggregate (mergeable,
    constant size — the cuts only need to be deterministic and roughly
    balanced); a row's bucket is the count of cuts strictly beyond its range
    value, computed JVM-side over the broadcast cut array, so equal range
    values always share a bucket and bucket-major order IS the requested
    total order."""
    probs = ", ".join(f"{i / n_buckets!r}D" for i in range(1, n_buckets))
    cuts = df.agg(
        F.expr(
            f"approx_percentile(cast({range_col} as double), array({probs}), 10000)"
        ).alias("__cuts")
    )
    xv = F.col(range_col).cast("double")
    beyond = (lambda c: c > xv) if descending else (lambda c: c < xv)
    bucket = F.coalesce(
        F.aggregate(
            "__cuts",
            F.lit(0),
            lambda acc, c: acc + F.when(beyond(c), 1).otherwise(0),
        ),
        F.lit(0),
    )
    return df.crossJoin(F.broadcast(cuts)).withColumn("__b", bucket).drop("__cuts")


def ordered_cumsum(
    df: DataFrame,
    value_col: str | list[str],
    range_col: str,
    tiebreak_cols: list[str],
    out_col: str | list[str] = "cum",
    n_buckets: int = PREFIX_BUCKETS,
    descending: bool = False,
    materialize: bool = True,
) -> DataFrame:
    """Global cumulative sum of ``value_col`` (one column or a list —
    every cumulative rides the SAME bucket pass) in ``(range_col [desc],
    *tiebreak_cols asc)`` order, without a partition-less Window.

    Pass 0 sketches ``n_buckets - 1`` range cut points with one
    ``approx_percentile`` aggregate (mergeable, constant size — NOT an exact
    quantile; the cuts only need to be deterministic and roughly balanced).
    Each row's bucket is the count of cuts strictly beyond its range value —
    computed JVM-side with ``F.aggregate`` over the broadcast cut array —
    so equal range values always share a bucket and bucket-major order is
    exactly the requested total order. Pass 1 aggregates per-bucket totals
    (tiny), prefix-summed by ``bucket_prefix_offsets``; pass 2 runs the
    cumulative Window PARTITIONED by bucket and adds the broadcast offset.
    DECIMAL addition is associative, so the result is bit-identical to the
    single global window at any bucket count.

    ``materialize`` (default True) cuts the input's lineage first
    (functions.checkpoint.cut_lineage): the three passes (cuts, bucket
    totals, final join) are SEPARATE consumers of ``df``, and Spark's
    physical ReuseExchange does NOT collapse them across the crossJoin
    boundary — measured on abc_pareto, the un-materialized plan scanned
    and shuffled the upstream fact table 12×; with the cut it runs once.
    Pass False only when the caller has already materialized ``df``.
    """
    if n_buckets < 2:
        raise ValueError("ordered_cumsum needs n_buckets >= 2")
    if materialize:
        df = cut_lineage(df)
    value_cols = [value_col] if isinstance(value_col, str) else list(value_col)
    out_cols = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(value_cols) != len(out_cols):
        raise ValueError("value_col and out_col lengths differ")
    d = _bucketize(df, range_col, n_buckets, descending)
    totals = d.groupBy("__b").agg(
        *[F.sum(v).alias(f"__btot{i}") for i, v in enumerate(value_cols)]
    )
    offsets = bucket_prefix_offsets(
        totals,
        "__b",
        [f"__btot{i}" for i in range(len(value_cols))],
        [f"__boff{i}" for i in range(len(value_cols))],
    ).select("__b", *[f"__boff{i}" for i in range(len(value_cols))])
    head = F.col(range_col).desc() if descending else F.col(range_col).asc()
    w = (
        Window.partitionBy("__b")
        .orderBy(head, *[F.col(c).asc() for c in tiebreak_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = d.join(F.broadcast(offsets), "__b")
    for v, o, i in zip(value_cols, out_cols, range(len(value_cols))):
        out = out.withColumn(o, F.col(f"__boff{i}") + F.sum(v).over(w))
    return out.drop(
        "__b", *[f"__boff{i}" for i in range(len(value_cols))]
    )


def bucket_prefix_max(
    totals: DataFrame,
    bucket_col: str,
    total_col: str,
    out_col: str = "__bmax",
) -> DataFrame:
    """Exclusive prefix MAX over a tiny bounded bucket-maxima relation: each
    bucket's offset = the max over every STRICTLY-lower bucket's value, NULL
    for the lowest bucket (no earlier bucket constrains it — max has no
    identity element in an unbounded domain, so absence is represented
    honestly as NULL and folded with Spark's null-skipping ``greatest``).
    Same triangular-broadcast-join shape as ``bucket_prefix_offsets``."""
    prev = totals.select(
        F.col(bucket_col).alias("__pb"), F.col(total_col).alias("__pt")
    )
    return (
        totals.join(F.broadcast(prev), F.col("__pb") < F.col(bucket_col), "left")
        .groupBy(bucket_col, total_col)
        .agg(F.max("__pt").alias(out_col))
    )


def ordered_cummax_excl(
    df: DataFrame,
    value_col: str,
    range_col: str,
    tiebreak_cols: list[str],
    out_col: str = "cummax_excl",
    n_buckets: int = PREFIX_BUCKETS,
    descending: bool = False,
    materialize: bool = True,
) -> DataFrame:
    """EXCLUSIVE global running max of ``value_col`` in ``(range_col [desc],
    *tiebreak_cols asc)`` order: each row gets the max over all
    STRICTLY-PRECEDING rows, NULL for the global first row. Max is
    associative and idempotent, so the two-phase result is identical to the
    partition-less window at any bucket count.

    Row-exclusive semantics: rows that compare equal on the FULL sort key
    are excluded from each other in an arbitrary-but-deterministic row
    order — callers wanting value-strict "max over strictly-better sort
    positions" must pass a relation whose sort key is unique (the skyline
    operator dedups to one row per range value first, which also keeps
    this relation a small aggregate rather than the full fact table).

    Same three passes as ``ordered_cumsum``: sketch cuts → per-bucket max +
    exclusive bucket offsets (``bucket_prefix_max``) → per-bucket EXCLUSIVE
    window (``rowsBetween(unboundedPreceding, -1)`` — NULL on each bucket's
    first row) folded with the broadcast offset via null-skipping
    ``greatest``. Cross-bucket correctness needs offsets over
    strictly-PRECEDING range values, and the bucketizer guarantees exactly
    that: ties always share a bucket, so a strictly-lower bucket id implies
    a strictly-preceding range value."""
    if n_buckets < 2:
        raise ValueError("ordered_cummax_excl needs n_buckets >= 2")
    if materialize:
        df = cut_lineage(df)
    d = _bucketize(df, range_col, n_buckets, descending)
    totals = d.groupBy("__b").agg(F.max(value_col).alias("__bmaxv"))
    offsets = bucket_prefix_max(totals, "__b", "__bmaxv", "__boffm").select(
        "__b", "__boffm"
    )
    head = F.col(range_col).desc() if descending else F.col(range_col).asc()
    w = (
        Window.partitionBy("__b")
        .orderBy(head, *[F.col(c).asc() for c in tiebreak_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.join(F.broadcast(offsets), "__b")
        .withColumn(out_col, F.greatest(F.col("__boffm"), F.max(value_col).over(w)))
        .drop("__b", "__boffm")
    )
