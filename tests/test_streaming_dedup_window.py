"""Streaming windowed dup-suppression twin: O(1) last-timestamp state per
payload identity; drained additive increments ≡ batch event_dedup_report."""

from __future__ import annotations

import json

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.streaming import (
    dedup_window,
)

SCHEMA = (
    "event_id long, event_time timestamp, user_id long,"
    " event_type string, value double"
)


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _ev(eid, user, et, sec, value):
    return {
        "event_id": eid,
        "user_id": user,
        "event_type": et,
        "event_time": f"2026-01-01T00:{sec // 60:02d}:{sec % 60:02d}",
        "value": value,
    }


def _run(spark, src, tmp_path, name):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        dedup_window.dedup_window_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # drained additive increments -> per-type totals
    return {
        r.event_type: (r.n_events, r.n_duplicates, r.n_kept)
        for r in spark.sql(
            f"SELECT event_type, sum(n_events) AS n_events,"
            f" sum(n_duplicates) AS n_duplicates,"
            f" sum(n_events) - sum(n_duplicates) AS n_kept"
            f" FROM {name} GROUP BY event_type"
        ).collect()
    }


def _batch_want(spark, rows):
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
        temporal,
    )

    df = spark.createDataFrame(
        [
            (
                r["event_id"],
                r["event_time"],
                r["user_id"],
                r["event_type"],
                r["value"],
            )
            for r in rows
        ],
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double",
    ).selectExpr(
        "event_id",
        "cast(ts_s as timestamp) AS ts",
        "user_id",
        "event_type",
        "value",
    )
    return {
        r.event_type: (r.n_events, r.n_duplicates, r.n_kept)
        for r in temporal.event_dedup_report(df).collect()
    }


def test_dedup_window_stream_drained_equals_batch(spark, tmp_path):
    """Chain-collapse across a retry storm that SPANS the micro-batch
    boundary (the head lives in state), identity separation by user/type/
    value, an out-of-window repeat, and a NULL-value identity group."""
    rows = [
        _ev(1, 1, "click", 0, 1.0),
        _ev(2, 1, "click", 3, 1.0),   # +3s  -> dup of 1
        _ev(3, 1, "click", 6, 1.0),   # +3s  -> dup of 2 (chain, 6s from head)
        # batch boundary lands here: 4 and 5 are judged against STATE
        _ev(4, 1, "click", 9, 1.0),   # +3s  -> dup of 3
        _ev(5, 1, "click", 20, 1.0),  # +11s -> NOT a dup (window 5s)
        _ev(6, 1, "click", 21, 2.0),  # different value -> separate identity
        _ev(7, 2, "click", 21, 1.0),  # different user -> separate identity
        _ev(8, 1, "view", 22, 1.0),   # different type -> separate identity
        _ev(9, 1, "view", 23, 1.0),   # +1s -> dup
        _ev(10, 3, "buy", 0, None),
        _ev(11, 3, "buy", 2, None),   # NULL payload identity groups too
    ]
    src = tmp_path / "dwsrc"
    src.mkdir()
    _write(src / "f0.json", rows[:3])
    _write(src / "f1.json", rows[3:])
    got = _run(spark, src, tmp_path, "dw1")
    want = _batch_want(spark, rows)
    assert got == want
    assert got["click"] == (7, 3, 4)
    assert got["view"] == (2, 1, 1)
    assert got["buy"] == (2, 1, 1)


def test_dedup_window_stream_state_eviction(spark, tmp_path):
    """Watermark-driven TTL: an identity idle past horizon + window is
    EVICTED from state (numRowsTotal drops), and output still equals the
    batch report — eviction is provably invisible (any event admitted
    after the timeout has gap > window, hence non-dup either way)."""
    rows = [
        _ev(1, 1, "click", 0, 1.0),   # identity A — will go idle
        _ev(2, 2, "click", 0, 1.0),   # identity B — stays active
    ]
    late = [
        # jumps event time 100s ahead; with horizon 1s the watermark
        # passes A's last(0s) + window(5s) and A's state times out
        _ev(3, 2, "click", 100, 1.0),
    ]
    final = [_ev(4, 2, "click", 101, 1.0)]  # timeout fires this batch
    src = tmp_path / "dwsrc3"
    src.mkdir()
    _write(src / "f0.json", rows)
    _write(src / "f1.json", late)
    _write(src / "f2.json", final)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        dedup_window.dedup_window_stream(stream, horizon_us=1_000_000)
        .writeStream.format("memory")
        .queryName("dw3")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dw3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    progresses = [json.loads(p.json) for p in q.recentProgress]
    state_rows = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in progresses
        if p.get("stateOperators")
    ]
    assert max(state_rows) == 2          # both identities were live
    assert state_rows[-1] == 1           # A evicted, only B remains
    got = {
        r.event_type: (r.n_events, r.n_duplicates)
        for r in spark.sql(
            "SELECT event_type, sum(n_events) AS n_events,"
            " sum(n_duplicates) AS n_duplicates FROM dw3 GROUP BY event_type"
        ).collect()
    }
    bw = _batch_want(spark, rows + late + final)
    assert got == {k: (v[0], v[1]) for k, v in bw.items()}


def test_dedup_window_stream_exact_window_edge(spark, tmp_path):
    """A gap of exactly window_us is a duplicate (<=, the batch rule) —
    integer-microsecond compare, across a batch boundary."""
    rows = [_ev(1, 9, "ping", 0, 7.0), _ev(2, 9, "ping", 5, 7.0)]
    src = tmp_path / "dwsrc2"
    src.mkdir()
    _write(src / "f0.json", rows[:1])
    _write(src / "f1.json", rows[1:])
    got = _run(spark, src, tmp_path, "dw2")
    assert got == _batch_want(spark, rows)
    assert got["ping"] == (2, 1, 1)
