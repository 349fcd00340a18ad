"""Regression: load_table must work on a SparkSession it did not build.

The driver's correctness harness constructs its own SparkSession without
the confs ``get_spark`` sets (nanosAsLong for the TIMESTAMP(NANOS) events
table, the InferFiltersFromGenerate exclusion). ``load_table`` must set
them at runtime so every query works on a foreign session.
"""

from __future__ import annotations

import pytest

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.sources.catalog import (
    _REQUIRED_CONFS,
    load_table,
)


@pytest.fixture()
def confless(spark):
    """Simulate a foreign session: strip the confs, restore after."""
    saved = {k: spark.conf.get(k, None) for k in _REQUIRED_CONFS}
    for k in _REQUIRED_CONFS:
        spark.conf.unset(k)
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_events_read_fails_without_conf(confless, sf_dir):
    # Sanity: the raw read really does fail on a conf-less session,
    # proving the fixture simulates the driver's environment.
    with pytest.raises(Exception, match="PARQUET_TYPE_ILLEGAL"):
        confless.read.parquet(f"{sf_dir}/events.parquet").limit(1).collect()


def test_load_table_self_heals_events(confless, sf_dir):
    df = load_table(confless, sf_dir, "events")
    rows = df.limit(5).collect()
    assert len(rows) == 5
    assert dict(df.dtypes)["ts"] == "timestamp"
    # and the confs are now in place for subsequent plans
    for k, v in _REQUIRED_CONFS.items():
        assert confless.conf.get(k) == v
