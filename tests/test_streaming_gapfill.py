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


def test_gapfill_stream_null_values_match_batch(spark, tmp_path):
    """NULL values follow the batch twin: counted in n_events, skipped by
    the day sum, and a NULL day-last makes the carried value fall back to
    the last non-NULL day-last (batch max_by keeps NULL x; the LOCF
    window skips it). Includes a NULL-last day whose gap rows must carry
    the PREVIOUS day's value, split across micro-batches."""
    rows = [
        _ev(1, "a", 1, 9, 10.0),
        _ev(2, "a", 1, 18, None),   # day-1 last is NULL -> day_last NULL
        _ev(3, "a", 3, 8, None),    # gap day 2 carries... nothing newer
        _ev(4, "a", 3, 12, 4.0),    # but day-3 last is 4.0
        _ev(5, "a", 5, 8, None),    # day-5 all-NULL, stays... no:
        _ev(6, "a", 6, 8, 9.0),     # closes day 5; day 6 stays OPEN
    ]
    src = tmp_path / "gfnull"
    src.mkdir()
    _write(src / "f0.json", rows[:3])
    _write(src / "f1.json", rows[3:])
    got = _run(spark, src, tmp_path, "gfnull")
    want = _batch_want(spark, rows)
    assert got == want
    # day 1: 2 events, sum skips the NULL, carried is NULL (no prior
    # non-NULL day-last and the day's own last is NULL)
    assert got[("a", "2026-01-01")] == (2, 10.0, None, 0)
    # gap day 2 inherits day 1's NULL carried
    assert got[("a", "2026-01-02")] == (0, 0.0, None, 1)
    # day 3 last is 4.0; gap day 4 carries it
    assert got[("a", "2026-01-04")] == (0, 0.0, 4.0, 1)
    # day 5 is all-NULL: 1 event, 0.0 sum, carried falls BACK to 4.0
    assert got[("a", "2026-01-05")] == (1, 0.0, 4.0, 0)
