"""Input-parallelism helpers.

A small parquet table arrives as ONE scan partition (one file, one split).
That's invisible for scan-shaped queries, but any operator that does heavy
per-row work (regex tokenize + shingle explode) or a nested-loop pair join
on top of that scan serializes through a single task — measured 30x+ of
lost parallelism on the bench. ``spread`` fans such inputs out to the
session's shuffle parallelism; it is a no-op when the input is already at
least that wide (the 100 TB case, where the scan has thousands of splits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition up to the session's shuffle parallelism,
    only when the input is narrower than that. The shuffle moves just the
    raw input rows (cheap — by definition the input is small when this
    fires); every downstream expression then runs data-parallel."""
    target = min_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
