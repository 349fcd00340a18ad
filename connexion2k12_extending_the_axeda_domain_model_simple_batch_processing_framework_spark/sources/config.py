"""Framework configuration store — InitializeBatchFramework parity.

The reference persists a ``connexion.batch.Configuration`` extended object
(init/InitializeBatchFramework.groovy:242-275) holding the igniter/finalizer
pool sizes + cron schedules and the platform endpoint credentials, created
once at install time and read by every cron job. Here the configuration is
a one-row DataFrame written to a parquet table: the cluster-friendly
equivalent (every executor can read it; no mutable singleton).

Required-field validation mirrors isValidRequest
(InitializeBatchFramework.groovy:163-171, error id 1001).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CONFIG_SCHEMA = T.StructType(
    [
        T.StructField("igniter_thread_pool_size", T.IntegerType(), False),
        T.StructField("igniter_schedule", T.StringType(), False),
        T.StructField("finalizer_thread_pool_size", T.IntegerType(), False),
        T.StructField("finalizer_schedule", T.StringType(), False),
        T.StructField("platform_host", T.StringType(), False),
        T.StructField("platform_username", T.StringType(), False),
        T.StructField("platform_password", T.StringType(), False),
    ]
)

#: install-time defaults (pool sizes / schedules the reference ships in its
#: request example; hosts/credentials have no defaults — callers must pass
#: them, as in the reference's required-field validation)
DEFAULTS = {
    "igniter_thread_pool_size": 5,
    "igniter_schedule": "0 */5 * * * ?",
    "finalizer_thread_pool_size": 5,
    "finalizer_schedule": "0 */5 * * * ?",
}

REQUIRED = ["platform_host", "platform_username", "platform_password"]


class ConfigurationError(ValueError):
    """Missing required configuration field (reference error id 1001)."""


def build_configuration(spark: SparkSession, **fields) -> DataFrame:
    """Validate + assemble the one-row configuration DataFrame."""
    for name in REQUIRED:
        if not fields.get(name):
            # message shape mirrors InitializeBatchFramework.groovy:167-169
            camel = name.split("_")[0] + "".join(
                w.capitalize() for w in name.split("_")[1:]
            )
            raise ConfigurationError(f"Missing request field '{camel}'.")
    merged = {**DEFAULTS, **fields}
    unknown = set(merged) - {f.name for f in CONFIG_SCHEMA.fields}
    if unknown:
        raise ConfigurationError(f"Unknown configuration fields: {sorted(unknown)}")
    row = tuple(merged[f.name] for f in CONFIG_SCHEMA.fields)
    return spark.createDataFrame([row], CONFIG_SCHEMA)


def save_configuration(config: DataFrame, path: str) -> None:
    """Persist (overwrite-on-reinstall, like forceCreate)."""
    config.write.mode("overwrite").parquet(path)


def load_configuration(spark: SparkSession, path: str) -> dict:
    """Read the stored configuration back as a plain dict (driver-side:
    it's one row of scheduler settings, not data-path work)."""
    rows = spark.read.parquet(path).collect()
    if len(rows) != 1:
        raise ConfigurationError(
            f"configuration table at {path!r} must hold exactly one row, "
            f"found {len(rows)}"
        )
    return rows[0].asDict()
