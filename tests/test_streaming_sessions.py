"""Streaming gap sessionization: closed sessions match the batch operator."""

from __future__ import annotations

import json

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
    temporal,
)
from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.streaming import (
    sessions,
)

SCHEMA = "user_id long, event_id long, value double, ts timestamp"


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, src, tmp_path, name, one_file_per_batch=False):
    reader = spark.readStream.schema(SCHEMA)
    if one_file_per_batch:
        reader = reader.option("maxFilesPerTrigger", 1)
    stream = reader.json(str(src))
    q = (
        sessions.session_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def _ev(user, eid, value, ts):
    return {"user_id": user, "event_id": eid, "value": value, "ts": ts}


def test_session_stream_matches_batch_closed_sessions(spark, tmp_path):
    src = tmp_path / "sess1"
    src.mkdir()
    rows = [
        # user 1: session A (3 events), 40-min gap, session B (2 events),
        # gap again, then a lone tail event (stays OPEN in the stream)
        _ev(1, 1, 10.0, "2026-01-01T10:00:00"),
        _ev(1, 2, 5.5, "2026-01-01T10:10:00"),
        _ev(1, 3, 1.25, "2026-01-01T10:20:00"),
        _ev(1, 4, 2.0, "2026-01-01T11:00:01"),
        _ev(1, 5, 3.0, "2026-01-01T11:10:00"),
        _ev(1, 6, 9.0, "2026-01-01T12:30:00"),
        # user 2: a single session, then a closing gap event
        _ev(2, 7, 100.0, "2026-01-01T09:00:00"),
        _ev(2, 8, -0.5, "2026-01-01T10:00:00"),
    ]
    _write(src / "f0.json", rows)
    out = _run(spark, src, tmp_path, "sess1")
    got = {
        (r.user_id, r.session_idx): (
            r.session_start.isoformat(),
            r.session_end.isoformat(),
            r.n_events,
            r.sum_value_cents,
        )
        for r in out
    }
    # exactly the CLOSED sessions: user1 A and B; user2's first (closed by
    # event 8 arriving past the gap). Open tails (1,3) and (2,2) not emitted.
    assert got == {
        (1, 1): ("2026-01-01T10:00:00", "2026-01-01T10:20:00", 3, 1675),
        (1, 2): ("2026-01-01T11:00:01", "2026-01-01T11:10:00", 2, 500),
        (2, 1): ("2026-01-01T09:00:00", "2026-01-01T09:00:00", 1, 10000),
    }

    # batch parity on the same rows: every closed streaming session equals
    # the batch operator's session at the same (user, idx) grain
    events = spark.createDataFrame(
        [(r["user_id"], r["event_id"], r["value"], r["ts"].replace("T", " "))
         for r in rows],
        "user_id long, event_id long, value double, ts string",
    ).selectExpr("user_id", "event_id", "value", "cast(ts as timestamp) ts")
    batch = {
        (r.user_id, r.session_idx): (
            r.session_start.isoformat(),
            r.session_end.isoformat(),
            r.n_events,
            int(r.sum_value * 100),
        )
        for r in temporal.sessionize(events).collect()
    }
    for k, v in got.items():
        assert batch[k] == v


def test_session_stream_state_survives_micro_batches(spark, tmp_path):
    src = tmp_path / "sess2"
    src.mkdir()
    # session spans two micro-batches: must close as ONE 3-event session
    _write(src / "f0.json", [
        _ev(5, 1, 1.0, "2026-01-01T10:00:00"),
        _ev(5, 2, 1.0, "2026-01-01T10:05:00"),
    ])
    _write(src / "f1.json", [
        _ev(5, 3, 1.0, "2026-01-01T10:10:00"),   # extends the open session
        _ev(5, 4, 7.0, "2026-01-01T12:00:00"),   # gap -> closes it
    ])
    out = _run(spark, src, tmp_path, "sess2", one_file_per_batch=True)
    assert len(out) == 1
    r = out[0]
    assert (r.user_id, r.session_idx, r.n_events, r.sum_value_cents) == (5, 1, 3, 300)
    assert r.session_end.isoformat() == "2026-01-01T10:10:00"
