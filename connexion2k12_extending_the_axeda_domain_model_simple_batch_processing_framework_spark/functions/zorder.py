"""Z-order (Morton) layout for multi-column data skipping.

Parquet/lakehouse readers skip row groups and files whose min/max stats
exclude the query predicate. Sorting by ONE column gives perfect skipping
on that column and none on others; interleaving the bits of several
bucketed columns (the Z-order curve) gives each of them locality, so a
selective filter on ANY of the z-ordered columns prunes most files — the
layout trick behind DELTA's OPTIMIZE ZORDER BY, built here from plain
column expressions (bit shifts + masks, fully codegen'd; no UDF, no hidden
collect beyond one min/max aggregate per write).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 8  # per-column resolution: 2^8 buckets each


def interleave_bits(bucket_cols: list[Column], bits: int = ZORDER_BITS) -> Column:
    """Morton key: bit ``b`` of column ``i`` lands at position
    ``b * n_cols + i``. Inputs must already be integer buckets in
    [0, 2^bits); the result is a long usable as a range-partition /
    sort key."""
    n = len(bucket_cols)
    key = F.lit(0).cast("long")
    for i, c in enumerate(bucket_cols):
        for b in range(bits):
            key = key + (
                F.shiftleft(
                    F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)),
                    b * n + i,
                )
            )
    return key


def bucketize(col: Column, cmin: Column, cmax: Column, bits: int = ZORDER_BITS) -> Column:
    """Scale a numeric column to an integer bucket in [0, 2^bits) over its
    [min, max] range (broadcast 1-row aggregate at write time)."""
    buckets = (1 << bits) - 1
    span = (cmax - cmin).cast("double")
    frac = F.when(span > 0, (col.cast("double") - cmin.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    return F.least(F.floor(frac * (buckets + 1)).cast("long"), F.lit(buckets))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = ZORDER_BITS,
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet laid out along the Z-order curve of ``cols``.

    One pass computes the per-column min/max (a 1-row broadcast — no
    collect of data rows), a projection computes the Morton key, and a
    range partition + in-partition sort on that key places neighboring
    curve points in the same files, so every z-ordered column's min/max
    spread per file is ~1/2^(bits/n) of its range instead of the full
    range. Readers then prune on ANY of the columns via ordinary
    parquet stats. ``n_files`` plays the role of a target file size at
    100 TB (files ≈ data / target-size)."""
    stats = df.agg(
        *[F.min(c).alias(f"__min_{c}") for c in cols],
        *[F.max(c).alias(f"__max_{c}") for c in cols],
    )
    keyed = df.crossJoin(F.broadcast(stats))
    buckets = [
        bucketize(
            F.col(c), F.col(f"__min_{c}"), F.col(f"__max_{c}"), bits
        )
        for c in cols
    ]
    keyed = keyed.withColumn("__zkey", interleave_bits(buckets, bits)).drop(
        *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols]
    )
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
