"""Streaming PSI drift monitor: frozen baseline, O(bins) state."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
    analytics,
)
from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.streaming import (
    drift,
)

SCHEMA = "event_id long, ts timestamp, value double"


def _drain_bins(spark, src, tmp_path, edges, name):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        drift.psi_bin_stream(stream, edges)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode re-emits running counts; the bin's final count is the max
    rows = spark.sql(
        f"SELECT bin_id, max(n) AS n FROM {name} GROUP BY 1"
    ).collect()
    return {int(r.bin_id): int(r.n) for r in rows}


def test_psi_stream_snapshot_equals_batch(spark, tmp_path):
    """Frozen-baseline streaming PSI ≡ the batch value_psi on the same
    split: drained per-bin counts equal the batch current-half counts,
    and the shared-report snapshot reproduces every output column."""
    events = spark.range(240).select(
        F.col("id").alias("event_id"),
        F.expr("timestamp'2026-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id*60)").alias("ts"),
        F.lit(1).alias("user_id"),
        F.lit("a").alias("event_type"),
        # drifting distribution: values shift upward along the timeline
        (F.col("id") % 37 + (F.col("id") / 10.0)).cast("double").alias("value"),
    )
    events = events.cache()
    [span] = events.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    ).collect()
    mid = (span.lo + span.hi) // 2
    base = events.filter(F.unix_micros("ts") <= mid)
    cur = events.filter(F.unix_micros("ts") > mid)

    edges, baseline_bins = drift.fit_psi_baseline(base)
    assert len(edges) == analytics.PSI_BINS - 1

    src = tmp_path / "psisrc"
    src.mkdir()
    rows = [
        {"event_id": r.event_id, "ts": str(r.ts), "value": r.value}
        for r in cur.orderBy("event_id").collect()
    ]
    half = len(rows) // 2
    for i, chunk in enumerate((rows[:half], rows[half:])):
        with open(src / f"f{i}.json", "w") as f:
            for r in chunk:
                f.write(json.dumps(r) + "\n")
    got_bins = _drain_bins(spark, src, tmp_path, edges, "psibins")

    # drained counts ≡ batch current-half counts
    want_bins = {
        int(r.bin_id): int(r.n)
        for r in drift._bin_ids(cur, edges)
        .groupBy("bin_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got_bins == want_bins

    # shared-report snapshot ≡ the batch operator on the full relation
    [want] = analytics.value_psi(events).collect()
    [got] = drift.psi_snapshot(spark, got_bins, baseline_bins).collect()
    assert (
        got.n_baseline,
        got.n_current,
        got.n_bins_used,
        got.n_degenerate_bins,
        got.psi,
    ) == (
        want.n_baseline,
        want.n_current,
        want.n_bins_used,
        want.n_degenerate_bins,
        want.psi,
    )
    assert got.psi > 0.0  # the drift is real


def test_psi_stream_state_accumulates_across_batches(spark, tmp_path):
    edges = [10.0]
    src = tmp_path / "psisrc2"
    src.mkdir()
    mk = lambda eid, v: {  # noqa: E731
        "event_id": eid,
        "ts": "2026-01-01T00:00:00",
        "value": v,
    }
    with open(src / "f0.json", "w") as f:
        for r in (mk(1, 5.0), mk(2, 15.0)):
            f.write(json.dumps(r) + "\n")
    with open(src / "f1.json", "w") as f:
        for r in (mk(3, 5.0), mk(4, 10.0)):  # tie at the edge -> lower bin
            f.write(json.dumps(r) + "\n")
    got = _drain_bins(spark, src, tmp_path, edges, "psibins2")
    assert got == {0: 3, 1: 1}


def test_fit_psi_baseline_empty_relation_raises_clear_error(spark):
    import pytest

    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.streaming import (
        drift,
    )

    empty = spark.createDataFrame([], "value double")
    with pytest.raises(ValueError, match="empty baseline"):
        drift.fit_psi_baseline(empty)
