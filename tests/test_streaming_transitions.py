"""Streaming transition-matrix twin: O(1) last-event state per user."""

from __future__ import annotations

import json

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.streaming import (
    transitions,
)

SCHEMA = "user_id long, event_id long, event_type string, event_time timestamp"


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _ev(user, eid, et, ts):
    return {"user_id": user, "event_id": eid, "event_type": et, "event_time": ts}


def _run(spark, src, tmp_path, name):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        transitions.transitions_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        f"SELECT prev_type, next_type, sum(n) AS n FROM {name} GROUP BY 1, 2"
    ).collect()
    return {(r.prev_type, r.next_type): r.n for r in rows}


def test_transitions_stream_drained_equals_batch(spark, tmp_path):
    """Drained pair counts must equal the batch event_transitions matrix
    EXACTLY under in-order delivery — including the pair completed ACROSS
    the micro-batch boundary (the one the last-event state exists for)
    and same-timestamp ties ordered by event_id."""
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
        temporal,
    )

    base = "2026-01-01T10:{:02d}:{:02d}"
    rows = []
    eid = 0
    for u in range(1, 6):
        for i in range(7):
            et = ["view", "click", "buy"][(u * 3 + i * i) % 3]
            rows.append(_ev(u, eid, et, base.format(i, u % 60)))
            eid += 1
    # a same-timestamp tie inside user 1 (ordered by event_id)
    rows.append(_ev(1, eid, "view", base.format(0, 1)))
    eid += 1
    rows.sort(key=lambda r: (r["event_time"], r["event_id"]))
    src = tmp_path / "trsrc"
    src.mkdir()
    cut = len(rows) // 2  # users span the boundary mid-history
    _write(src / "f0.json", rows[:cut])
    _write(src / "f1.json", rows[cut:])
    got = _run(spark, src, tmp_path, "tr1")

    batch_df = spark.createDataFrame(
        [(r["user_id"], r["event_id"], r["event_type"], r["event_time"]) for r in rows],
        "user_id long, event_id long, event_type string, ts string",
    ).selectExpr("user_id", "event_id", "event_type", "cast(ts as timestamp) AS ts")
    want = {
        (r.prev_type, r.next_type): r.n_transitions
        for r in temporal.event_transitions(batch_df).collect()
    }
    assert got == want
    assert sum(got.values()) == len(rows) - 5  # chains: n_events - n_users


def test_transitions_stream_state_is_single_row(spark, tmp_path):
    """A user with a long history emits pairs every batch while the state
    stays one (ts, type) row — no growth with history length (checked via
    the documented state schema and the chain arithmetic: k batches of
    m events each yield m·k − 1 pairs total)."""
    src = tmp_path / "trsrc2"
    src.mkdir()
    eid = 0
    for b in range(4):
        rows = []
        for i in range(10):
            rows.append(
                _ev(7, eid, ["a", "b"][eid % 2], f"2026-01-02T0{b}:00:{i:02d}")
            )
            eid += 1
        _write(src / f"f{b}.json", rows)
    got = _run(spark, src, tmp_path, "tr2")
    assert sum(got.values()) == 4 * 10 - 1
    # strict alternation: only a->b and b->a ever occur
    assert set(got) == {("a", "b"), ("b", "a")}


def test_transitions_stream_state_survives_query_restart(spark, tmp_path):
    """True checkpoint recovery: a SECOND streaming query started on the
    same checkpoint after the first one stopped must restore each user's
    last-event state from the state store — the pair spanning the two
    QUERIES (not just two micro-batches) is emitted exactly once, and
    the combined drained output equals the batch matrix."""
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
        temporal,
    )

    src = tmp_path / "trsrc3"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_tr3")
    rows1 = [_ev(9, 1, "view", "2026-01-03T10:00:00"),
             _ev(9, 2, "click", "2026-01-03T10:00:10")]
    rows2 = [_ev(9, 3, "buy", "2026-01-03T10:00:20"),
             _ev(9, 4, "view", "2026-01-03T10:00:30")]
    _write(src / "f0.json", rows1)

    out_dir = str(tmp_path / "tr3_out")

    def run_once():
        # the memory sink refuses checkpoint recovery; a FILE sink is the
        # restartable shape a real deployment uses
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        q = (
            transitions.transitions_stream(stream)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    _write(src / "f1.json", rows2)
    run_once()  # NEW query, same checkpoint: state must come back
    got = {
        (r.prev_type, r.next_type): r.n
        for r in spark.read.parquet(out_dir)
        .groupBy("prev_type", "next_type")
        .sum("n")
        .withColumnRenamed("sum(n)", "n")
        .collect()
    }
    rows = rows1 + rows2
    batch_df = spark.createDataFrame(
        [(r["user_id"], r["event_id"], r["event_type"], r["event_time"]) for r in rows],
        "user_id long, event_id long, event_type string, ts string",
    ).selectExpr("user_id", "event_id", "event_type", "cast(ts as timestamp) AS ts")
    want = {
        (r.prev_type, r.next_type): r.n_transitions
        for r in temporal.event_transitions(batch_df).collect()
    }
    assert got == want
    # the cross-QUERY pair (click -> buy) exists and was not duplicated
    assert got[("click", "buy")] == 1
