"""Streaming calendar gap-fill twin: O(1) open-day state per type."""

from __future__ import annotations

import json

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.streaming import (
    gapfill,
)

SCHEMA = "event_id long, event_time timestamp, event_type string, value double"


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _ev(eid, et, day, hour, value):
    return {
        "event_id": eid,
        "event_type": et,
        "event_time": f"2026-01-{day:02d}T{hour:02d}:00:00",
        "value": value,
    }


def _run(spark, src, tmp_path, name):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        gapfill.gapfill_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        (r.event_type, str(r.day)): (
            r.n_events,
            r.day_value,
            r.carried_value,
            r.is_gap,
        )
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def _batch_want(spark, rows, drop_last_open_day=True):
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
        temporal,
    )

    df = spark.createDataFrame(
        [
            (r["event_id"], r["event_time"], 1, r["event_type"], r["value"])
            for r in rows
        ],
        "event_id long, ts_s string, user_id long, event_type string, value double",
    ).selectExpr(
        "event_id", "cast(ts_s as timestamp) AS ts", "user_id", "event_type", "value"
    )
    want = {
        (r.event_type, str(r.day)): (
            r.n_events,
            r.day_value,
            r.carried_value,
            r.is_gap,
        )
        for r in temporal.daily_gapfill(df).collect()
    }
    if drop_last_open_day:
        last = {}
        for et, day in want:
            last[et] = max(last.get(et, ""), day)
        want = {k: v for k, v in want.items() if k[1] != last[k[0]]}
    return want


def test_gapfill_stream_drained_equals_batch_closed_days(spark, tmp_path):
    """Drained rows ≡ batch daily_gapfill restricted to CLOSED days
    (everything strictly before each type's last observed day) — gap runs,
    zero-fill, LOCF carried values, and the within-day last under a
    same-day multi-event fold must all match."""
    rows = [
        _ev(1, "a", 1, 9, 10.0),
        _ev(2, "a", 1, 18, 7.5),   # day-1 last -> carried across the gap
        _ev(3, "a", 4, 8, 2.0),    # 2-day gap
        _ev(4, "a", 6, 8, 1.25),   # 1-day gap; day 6 stays OPEN
        _ev(5, "b", 2, 10, 5.0),
        _ev(6, "b", 3, 10, 6.0),   # day 3 stays OPEN for b
    ]
    src = tmp_path / "gfsrc"
    src.mkdir()
    # split mid-gap: day 4 for "a" arrives in a later micro-batch, so the
    # day-1 finalization + both gap rows are emitted from STATE
    _write(src / "f0.json", rows[:2] + rows[4:5])
    _write(src / "f1.json", rows[2:4] + rows[5:6])
    got = _run(spark, src, tmp_path, "gf1")
    want = _batch_want(spark, rows)
    assert got == want
    assert ("a", "2026-01-02") in got and got[("a", "2026-01-02")] == (
        0,
        0.0,
        7.5,
        1,
    )


def test_gapfill_stream_state_survives_micro_batches(spark, tmp_path):
    """A type whose events all land on one day emits nothing (the day
    never closes); a second batch on a later day closes it with the
    correct fold of BOTH batches' same-day events."""
    rows1 = [_ev(1, "c", 1, 9, 1.0), _ev(2, "c", 1, 10, 2.0)]
    rows2 = [_ev(3, "c", 1, 11, 3.0), _ev(4, "c", 2, 9, 4.0)]
    src = tmp_path / "gfsrc2"
    src.mkdir()
    _write(src / "f0.json", rows1)
    _write(src / "f1.json", rows2)
    got = _run(spark, src, tmp_path, "gf2")
    # day 1 closed by the day-2 arrival: 3 events, 1+2+3, last 3.0
    assert got == {("c", "2026-01-01"): (3, 6.0, 3.0, 0)}
