"""Parquet table catalog over the testdata layout.

One parquet file per table under an ``sf_dir``. At 100 TB these would be
partitioned parquet/iceberg tables; the loader is the single place a real
deployment swaps the path scheme. Readers go through ``spark.read.parquet``
so Catalyst keeps predicate pushdown + column pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..domain import TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS); Spark reads it as a raw
        # long (spark.sql.legacy.parquet.nanosAsLong). Truncate to micros —
        # identical to DuckDB's/Arrow's ns→µs conversion.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
