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

# Runtime-settable SQL confs the engine's plans depend on. ``get_spark``
# sets these at build time, but callers may hand us a foreign SparkSession
# (a test harness, a notebook) that lacks them — all are plain SQL confs,
# safe to set on a live session:
#  - nanosAsLong: on Spark <= 4.0, events.parquet's INT64 TIMESTAMP(NANOS)
#    is unreadable (PARQUET_TYPE_ILLEGAL) unless surfaced as a raw long;
#    Spark 4.1+ reads nanos natively as TIMESTAMP_NTZ and ignores this
#    conf, so ``load_table`` branches on the dtype it actually got.
#  - session.timeZone=UTC: pins the TIMESTAMP_NTZ -> TIMESTAMP cast (and
#    every hour/date extraction) to UTC wall clock, so results are
#    identical across Spark versions, host timezones, and the DuckDB
#    oracle (which computes in naive UTC).
#  - InferFiltersFromGenerate exclusion: see session.py — the inferred
#    `size(arr) > 0` filter inlines the whole array-building expression
#    pre-scan and slows the shingle-explode dedup paths 10-20x.
_REQUIRED_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.optimizer.excludedRules": (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    ),
}


def ensure_session_confs(spark: SparkSession) -> None:
    """Set the SQL confs every plan in this package assumes (idempotent)."""
    for key, value in _REQUIRED_CONFS.items():
        if spark.conf.get(key, None) != value:
            spark.conf.set(key, value)


#: session-scoped memo of loaded table DataFrames. ``spark.read.parquet``
#: costs ~100 ms of driver work PER CALL (py4j round trips + relation
#: resolution + footer/schema read) and the suite issues ~600 of them
#: (194 queries x 2-4 tables, twice under min-of-two) — ~60 s/pass of
#: pure plan-construction overhead at sf0.1. The cached object is a LAZY
#: DataFrame (an analyzed plan handle): every action still scans parquet,
#: so nothing about query execution or results changes — this is the
#: in-session analogue of a catalog's resolved-relation cache. Keyed by
#: the owning SparkSession so a new session (whose JVM state is gone)
#: never sees another session's plan.
_TABLE_CACHE: dict = {}


def _session_alive(spark: SparkSession) -> bool:
    try:
        return spark.sparkContext._jsc is not None
    except Exception:
        return False


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # self-heal confs on EVERY call (the foreign-session contract): a
    # caller may have unset them since the cached plan was built
    ensure_session_confs(spark)
    key = (spark, sf_dir, name)
    hit = _TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    for k in [k for k in _TABLE_CACHE if not _session_alive(k[0])]:
        del _TABLE_CACHE[k]
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS). What Spark hands us is
        # version-dependent: <= 4.0 with nanosAsLong gives the raw nano
        # long; 4.1+ reads it natively as TIMESTAMP_NTZ (micro-truncated).
        # Normalize both to TIMESTAMP under the UTC session timezone —
        # value-identical to DuckDB's/Arrow's ns→µs conversion either way.
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type != "timestamp":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _TABLE_CACHE[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.

    Bucketing is the join strategy money buys at 100 TB: two tables
    bucketed on the same key with the same bucket count equi-join with NO
    shuffle on either side (Spark trusts the on-disk hash layout), and a
    sorted bucket upgrades it to a zero-sort merge join. Use for the
    repeatedly-joined spines: task results by batch_id, shingle/band
    tables by doc_id, the IVF inverted file by centroid_id.
    ``sort_col`` defaults to the bucket column.
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(sort_col or bucket_col)
    )
    writer.saveAsTable(table)


def load_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket metadata intact (plain
    ``spark.read.parquet`` on the files would lose the layout and
    reintroduce the shuffle)."""
    ensure_session_confs(spark)
    return spark.table(table)
