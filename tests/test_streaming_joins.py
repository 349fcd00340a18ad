"""Watermarked stream-stream interval join: click→purchase attribution."""

from __future__ import annotations

import json

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.streaming import (
    joins,
)

SCHEMA = "user_id long, event_id long, event_type string, ts timestamp"


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _ev(user, eid, etype, ts):
    return {"user_id": user, "event_id": eid, "event_type": etype, "ts": ts}


def _run(spark, src, tmp_path, name, one_file_per_batch=False):
    reader = spark.readStream.schema(SCHEMA)
    if one_file_per_batch:
        reader = reader.option("maxFilesPerTrigger", 1)
    stream = reader.json(str(src))
    q = (
        joins.click_purchase_join(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_stream_join_window_bounds_and_cross_user_isolation(spark, tmp_path):
    src = tmp_path / "ssj1"
    src.mkdir()
    rows = [
        _ev(1, 1, "click", "2026-01-01T10:00:00"),
        _ev(1, 2, "click", "2026-01-01T10:30:00"),
        _ev(1, 3, "purchase", "2026-01-01T10:45:00"),  # matches clicks 1 AND 2
        _ev(1, 4, "purchase", "2026-01-01T11:20:00"),  # only click 2 (1 is >60min old)
        _ev(2, 5, "click", "2026-01-01T10:40:00"),     # other user: no cross-match
        _ev(2, 6, "purchase", "2026-01-01T10:39:00"),  # BEFORE its user's click
        _ev(3, 7, "purchase", "2026-01-01T10:00:00"),  # user with no clicks
    ]
    _write(src / "f0.json", rows)
    out = _run(spark, src, tmp_path, "ssj1")
    got = {(r.purchase_id, r.click_id) for r in out}
    assert got == {(3, 1), (3, 2), (4, 2)}
    lag = {(r.purchase_id, r.click_id): r.lag_us for r in out}
    assert lag[(3, 2)] == 15 * 60 * 1_000_000


def test_stream_join_matches_across_micro_batches(spark, tmp_path):
    src = tmp_path / "ssj2"
    src.mkdir()
    # click arrives in batch 0, purchase in batch 1: the click must be
    # buffered in the join state and still match
    _write(src / "f0.json", [_ev(9, 1, "click", "2026-01-01T09:00:00")])
    _write(src / "f1.json", [_ev(9, 2, "purchase", "2026-01-01T09:20:00")])
    out = _run(spark, src, tmp_path, "ssj2", one_file_per_batch=True)
    assert {(r.purchase_id, r.click_id) for r in out} == {(2, 1)}
