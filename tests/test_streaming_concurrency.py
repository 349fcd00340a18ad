"""Streaming peak-concurrency twin: one folded-prefix + horizon-buffer
state row; drained last snapshot ≡ batch peak_concurrency."""

from __future__ import annotations

import json

import pytest

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
    temporal,
)
from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.streaming import (
    concurrency,
)

SESS_SCHEMA = (
    "user_id long, session_idx long, session_start timestamp,"
    " session_end timestamp"
)


def _events_df(spark, rows):
    return spark.createDataFrame(
        [(i, ts, u, "e", 1.0) for i, (u, ts) in enumerate(rows)],
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double",
    ).selectExpr(
        "event_id", "cast(ts_s as timestamp) AS ts", "user_id",
        "event_type", "value",
    )


def _run(spark, src, tmp_path, name, horizon_us=concurrency.CONCURRENCY_HORIZON_US):
    stream = (
        spark.readStream.schema(SESS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        concurrency.concurrency_stream(stream, horizon_us=horizon_us)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    return rows


def _write_sessions(path, sess_rows):
    with open(path, "w") as f:
        for r in sess_rows:
            f.write(
                json.dumps(
                    {
                        "user_id": r.user_id,
                        "session_idx": r.session_idx,
                        "session_start": r.session_start.isoformat(),
                        "session_end": r.session_end.isoformat(),
                    }
                )
                + "\n"
            )


def _pin(spark, tmp_path, events, splits, name, horizon_us):
    """Feed the batch sessionizer's closed sessions to the stream in the
    given micro-batch splits; assert the drained LAST snapshot equals the
    batch sweep."""
    sess = temporal.sessionize(events).select(
        "user_id", "session_idx", "session_start", "session_end"
    ).collect()
    # deliver in close order (end_us): long sessions arrive late relative
    # to their start boundary — the reorder the buffer must absorb
    sess.sort(key=lambda r: (r.session_end, r.user_id, r.session_idx))
    src = tmp_path / f"{name}_src"
    src.mkdir()
    lo = 0
    for i, hi in enumerate([*splits, len(sess)]):
        _write_sessions(src / f"f{i}.json", sess[lo:hi])
        lo = hi
    rows = _run(spark, src, tmp_path, name, horizon_us)
    [want] = temporal.peak_concurrency(events).collect()
    got = rows[-1]
    assert (got.n_sessions, got.peak_concurrency, got.first_peak_ts) == (
        want.n_sessions,
        want.peak_concurrency,
        want.first_peak_ts,
    )
    return rows


def test_concurrency_stream_drained_equals_batch(spark, tmp_path):
    """Overlapping sessions from interleaved users, a zero-length
    session, equal-microsecond meeting points, split so a long session's
    start boundary arrives after a later short session's whole interval."""
    rows = [
        (1, "2026-01-01T00:00:00"),  # u1 long session 00:00–01:10
        (1, "2026-01-01T00:20:00"),
        (1, "2026-01-01T00:40:00"),
        (1, "2026-01-01T01:10:00"),
        (2, "2026-01-01T00:05:00"),  # u2 short session inside u1's
        (2, "2026-01-01T00:06:00"),
        (3, "2026-01-01T00:05:30"),  # u3 zero-length session inside both
        (4, "2026-01-01T02:00:00"),  # u4 disjoint later
        (2, "2026-01-01T02:00:00"),  # u2 second session meets u4 exactly
    ]
    ev = _events_df(spark, rows)
    got_rows = _pin(spark, tmp_path, ev, [2, 4], "pc1",
                    concurrency.CONCURRENCY_HORIZON_US)
    # snapshots are monotone in n_sessions and peak
    ns = [r.n_sessions for r in got_rows]
    pk = [r.peak_concurrency for r in got_rows]
    assert ns == sorted(ns) and pk == sorted(pk)
    assert got_rows[-1].peak_concurrency == 3  # u1+u2+u3 at 00:05:30


def test_concurrency_stream_horizon_compaction_same_answer(spark, tmp_path):
    """A tiny horizon forces the folded-prefix compaction path; the
    drained answer is unchanged (the fold carries exactly what the batch
    prefix sum carries across partitions)."""
    rows = [
        (u, f"2026-01-01T{h:02d}:00:00")
        for h in range(10)
        for u in range(1, 3 + (h % 2))
    ]
    ev = _events_df(spark, rows)
    # sessions are <= 1 h apart per user; 2 h horizon is tight but valid
    _pin(spark, tmp_path, ev, [4, 9, 14], "pc2", 2 * 3600 * 1_000_000)


def test_concurrency_stream_horizon_violation_raises(spark, tmp_path):
    """A session reaching behind the folded horizon kills the query loud
    (silent corruption of the folded prefix is never acceptable)."""
    sess_rows = [
        # newest end 10:00 with a 30-min horizon folds everything < 09:30
        {"user_id": 1, "session_idx": 1,
         "session_start": "2026-01-01T00:00:00",
         "session_end": "2026-01-01T10:00:00"},
    ]
    late = [
        {"user_id": 2, "session_idx": 1,
         "session_start": "2026-01-01T01:00:00",
         "session_end": "2026-01-01T01:05:00"},
    ]
    src = tmp_path / "pc3_src"
    src.mkdir()
    for i, batch in enumerate([sess_rows, late]):
        with open(src / f"f{i}.json", "w") as f:
            for r in batch:
                f.write(json.dumps(r) + "\n")
    from pyspark.sql.streaming import StreamingQueryException

    with pytest.raises(StreamingQueryException):
        stream = (
            spark.readStream.schema(SESS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = (
            concurrency.concurrency_stream(
                stream, horizon_us=30 * 60 * 1_000_000
            )
            .writeStream.format("memory")
            .queryName("pc3")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_pc3"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        if q.exception() is not None:
            raise q.exception()
