"""Regression: load_table must work on a SparkSession it did not build.

The driver's correctness harness constructs its own SparkSession without
the confs ``get_spark`` sets. ``load_table`` must self-heal at runtime:
set the runtime-settable SQL confs and normalize the events TIMESTAMP
(NANOS) column to TIMESTAMP regardless of what the running Spark version
hands back (raw nano long on <= 4.0 with nanosAsLong, TIMESTAMP_NTZ on
4.1+ where the legacy conf is inert).
"""

from __future__ import annotations

import datetime

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


def test_load_table_self_heals_events(confless, sf_dir):
    df = load_table(confless, sf_dir, "events")
    rows = df.orderBy("event_id").limit(5).collect()
    assert len(rows) == 5
    # normalized to TIMESTAMP (not a raw long, not NTZ) on every version
    assert dict(df.dtypes)["ts"] == "timestamp"
    # and the confs are now in place for subsequent plans
    for k, v in _REQUIRED_CONFS.items():
        assert confless.conf.get(k) == v


def test_events_ts_values_are_utc_micros(confless, sf_dir):
    """The normalized ts must equal the raw parquet nano count truncated
    to micros and interpreted as UTC — the exact values the DuckDB oracle
    computes — independent of which read path the Spark version took."""
    import duckdb

    df = load_table(confless, sf_dir, "events")
    got = [r["ts"] for r in df.orderBy("event_id").limit(3).collect()]
    want = [
        r[0]
        for r in duckdb.sql(
            f"SELECT ts FROM '{sf_dir}/events.parquet' ORDER BY event_id LIMIT 3"
        ).fetchall()
    ]
    assert [g.replace(tzinfo=None) if g.tzinfo else g for g in got] == [
        w.replace(tzinfo=None) for w in want
    ]
    assert all(isinstance(w, datetime.datetime) for w in want)
