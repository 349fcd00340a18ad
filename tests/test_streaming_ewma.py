"""Streaming trailing-EWMA twin: drained snapshot ≡ batch events_value_ewma."""

from __future__ import annotations

import json

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
    analytics,
)
from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.streaming import (
    ewma,
)

SCHEMA = "event_id long, event_time timestamp, event_type string, value double"


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _ev(eid, et, day, hour, value, month=1):
    return {
        "event_id": eid,
        "event_type": et,
        "event_time": f"2026-{month:02d}-{day:02d}T{hour:02d}:00:00",
        "value": value,
    }


def _run(spark, src, tmp_path, name):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        ewma.ewma_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    latest = {}
    for r in spark.sql(f"SELECT * FROM {name}").collect():
        if r.event_type not in latest or r.n_folded > latest[r.event_type].n_folded:
            latest[r.event_type] = r
    return {
        et: (str(r.last_day), r.n_days, r.ewma_value) for et, r in latest.items()
    }


def _batch_want(spark, rows):
    df = spark.createDataFrame(
        [
            (r["event_id"], r["event_time"], 1, r["event_type"], r["value"])
            for r in rows
        ],
        "event_id long, ts_s string, user_id long, event_type string, value double",
    ).selectExpr(
        "event_id", "cast(ts_s as timestamp) AS ts", "user_id", "event_type", "value"
    )
    return {
        r.event_type: (str(r.last_day), r.n_days, r.ewma_value)
        for r in analytics.events_value_ewma(df).collect()
    }


def test_ewma_stream_drained_equals_batch(spark, tmp_path):
    """Two types, multiple days split across three micro-batches, with an
    OUT-OF-ORDER day arriving after the anchor advanced past it and a NULL
    value row — drained snapshots must be bit-equal to the batch twin."""
    src = tmp_path / "src"
    src.mkdir()
    b1 = [
        _ev(1, "click", 1, 9, 10.0),
        _ev(2, "click", 1, 10, 20.0),
        _ev(3, "view", 2, 9, 5.0),
    ]
    b2 = [
        _ev(4, "click", 3, 9, 40.0),
        _ev(5, "click", 2, 9, 30.0),  # out-of-order: day 2 after day 3 opened
        _ev(6, "view", 2, 10, None),  # NULL value: day exists, sum skips
    ]
    b3 = [
        _ev(7, "click", 5, 9, 12.34),
        _ev(8, "view", 6, 9, 7.77),
    ]
    _write(src / "b1.json", b1)
    _write(src / "b2.json", b2)
    _write(src / "b3.json", b3)
    got = _run(spark, src, tmp_path, "ewma_drain")
    want = _batch_want(spark, b1 + b2 + b3)
    assert got == want


def test_ewma_stream_horizon_prunes_state_across_batches(spark, tmp_path):
    """A day more than EWMA_HORIZON_DAYS behind the anchor ages out of
    state (and of the fold) exactly as the batch filter excludes it."""
    src = tmp_path / "src"
    src.mkdir()
    b1 = [_ev(1, "click", 1, 9, 999.0)]  # Jan 1
    b2 = [_ev(2, "click", 1, 9, 5.0, month=3)]  # Mar 1: 59 days later
    _write(src / "b1.json", b1)
    _write(src / "b2.json", b2)
    got = _run(spark, src, tmp_path, "ewma_prune")
    want = _batch_want(spark, b1 + b2)
    assert got == want
    assert got["click"][1] == 1  # n_days: the Jan 1 bucket is gone
    assert got["click"][2] == 5.0


def test_ewma_stream_late_event_inside_horizon_merges(spark, tmp_path):
    """A late arrival for an already-anchored PAST day merges into that
    day's bucket — order across batches is irrelevant inside the horizon."""
    src = tmp_path / "src"
    src.mkdir()
    b1 = [_ev(1, "click", 10, 9, 100.0)]
    b2 = [_ev(2, "click", 8, 9, 60.0)]  # late: two days before the anchor
    _write(src / "b1.json", b1)
    _write(src / "b2.json", b2)
    got = _run(spark, src, tmp_path, "ewma_late")
    want = _batch_want(spark, b1 + b2)
    assert got == want
    assert got["click"][1] == 2


def test_ewma_null_only_first_batch_does_not_crash(spark, tmp_path):
    """A brand-new key whose FIRST micro-batch contains only NULL
    event_time rows must not crash the query (r11 ADVICE: empty buckets
    => ZeroDivisionError); the type stays silent until a real day
    arrives, then reports as if the NULL rows never existed — matching
    the batch twin, which drops NULL-ts rows at the daily grid."""
    src = tmp_path / "src"
    src.mkdir()
    b1 = [
        {"event_id": 1, "event_type": "ghost", "event_time": None, "value": 5.0},
        {"event_id": 2, "event_type": "ghost", "event_time": None, "value": 7.0},
    ]
    b2 = [_ev(3, "ghost", 4, 10, 12.5)]
    _write(src / "b1.json", b1)
    _write(src / "b2.json", b2)
    got = _run(spark, src, tmp_path, "ewma_nullfirst")
    assert got == {"ghost": ("2026-01-04", 1, 12.5)}
