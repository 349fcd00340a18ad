"""Streaming SCD2 maintenance (streaming/cdc.py): drained-stream equality
with the batch scd2_build, bucket-level incrementality, and replay
idempotence of the snapshot protocol."""

from __future__ import annotations

import json
import os

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators.process import (
    scd2_build,
)
from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.streaming import (
    cdc,
)

SCHEMA = "user_id long, valid_from timestamp, event_id long, score double"


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _u(user, ts, eid, score):
    return {"user_id": user, "valid_from": ts, "event_id": eid, "score": score}


ROWS = [
    # batch 0: two users
    [
        _u(1, "2026-01-01T10:00:00", 1, 1.0),
        _u(2, "2026-01-01T09:00:00", 2, 5.0),
    ],
    # batch 1: user 1 gets a new version; user 3 appears
    [
        _u(1, "2026-01-01T12:00:00", 3, 2.0),
        _u(3, "2026-01-01T11:00:00", 4, 9.0),
    ],
    # batch 2: late-arriving EARLIER version for user 1 (re-versioning
    # must renumber: the 10:00 row becomes v2's predecessor's successor…
    # i.e. the whole chain for user 1 is rebuilt)
    [
        _u(1, "2026-01-01T08:00:00", 5, 0.5),
    ],
]


def _drain(spark, tmp_path, name):
    src = tmp_path / "updates"
    src.mkdir(exist_ok=True)
    for i, rows in enumerate(ROWS):
        _write(src / f"b{i}.json", rows)
    table = str(tmp_path / "scd2_table")
    q = (
        cdc.scd2_stream_writer(
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(src)),
            table,
            str(tmp_path / f"ckpt_{name}"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return table


def _snapshot(df):
    return {
        (r.user_id, r.dim_version): (
            r.valid_from,
            r.valid_to,
            r.is_current,
            r.score,
        )
        for r in df.collect()
    }


def test_stream_scd2_equals_batch_rebuild(spark, tmp_path):
    table = _drain(spark, tmp_path, "cdc1")
    got = cdc.read_scd2(spark, table)
    assert got is not None
    all_updates = spark.createDataFrame(
        [tuple(r.values()) for batch in ROWS for r in batch],
        "user_id long, valid_from string, event_id long, score double",
    ).selectExpr("user_id", "CAST(valid_from AS TIMESTAMP) AS valid_from",
                 "event_id", "score")
    want = scd2_build(all_updates)
    assert _snapshot(got.drop("kb")) == _snapshot(want)
    # the late-arriving 08:00 update re-versioned user 1's chain: v1=08:00
    chain = {
        r.dim_version: (str(r.valid_from), r.is_current)
        for r in got.filter("user_id = 1").collect()
    }
    assert chain[1] == ("2026-01-01 08:00:00", False)
    assert chain[3] == ("2026-01-01 12:00:00", True)


def test_scd2_apply_rewrites_only_touched_buckets(spark, tmp_path):
    # drive the apply step directly (stream micro-batch file order is not
    # contractual) — the single-user batch 2 must rewrite ONLY user 1's
    # bucket, not the whole table
    table = str(tmp_path / "scd2_direct")
    for i, rows in enumerate(ROWS):
        batch = spark.createDataFrame(
            [tuple(r.values()) for r in rows],
            "user_id long, valid_from string, event_id long, score double",
        ).selectExpr(
            "user_id", "CAST(valid_from AS TIMESTAMP) AS valid_from",
            "event_id", "score",
        )
        cdc.scd2_apply_batch(batch, i, table)
    v2 = [d for d in os.listdir(f"{table}/v=2") if d.startswith("kb=")]
    assert len(v2) == 1
    # and earlier untouched buckets still resolve from their old versions
    users = {r.user_id for r in cdc.read_scd2(spark, table).collect()}
    assert users == {1, 2, 3}


def _batch_df(spark, rows):
    return spark.createDataFrame(
        [tuple(r.values()) for r in rows],
        "user_id long, valid_from string, event_id long, score double",
    ).selectExpr(
        "user_id", "CAST(valid_from AS TIMESTAMP) AS valid_from",
        "event_id", "score",
    )


def test_scd2_replay_is_idempotent(spark, tmp_path):
    # drive the apply step directly so batch-id ↔ content is pinned (a
    # file stream's micro-batch order is not contractual)
    table = str(tmp_path / "scd2_replay")
    for i, rows in enumerate(ROWS):
        cdc.scd2_apply_batch(_batch_df(spark, rows), i, table)
    before = _snapshot(cdc.read_scd2(spark, table).drop("kb"))
    # at-least-once replay of the LAST micro-batch with the same batch_id:
    # the as-of (< batch_id) read skips its own previous output and the
    # snapshot dir is overwritten, not appended — the table is unchanged
    cdc.scd2_apply_batch(_batch_df(spark, ROWS[2]), 2, table)
    after = _snapshot(cdc.read_scd2(spark, table).drop("kb"))
    assert after == before


def _dirs(table, prefix):
    return [d for d in os.listdir(table) if d.startswith(prefix)]


def test_scd2_compact_preserves_reads_and_prunes(spark, tmp_path):
    table = str(tmp_path / "scd2_compact")
    for i, rows in enumerate(ROWS):
        cdc.scd2_apply_batch(_batch_df(spark, rows), i, table)
    before = _snapshot(cdc.read_scd2(spark, table).drop("kb"))
    cdc.scd2_compact(spark, table)
    # (a) post-compact reads ≡ pre-compact reads
    after = _snapshot(cdc.read_scd2(spark, table).drop("kb"))
    assert after == before
    # superseded v= dirs expired, one base generation remains
    assert _dirs(table, "v=") == []
    assert _dirs(table, "base=") == ["base=2"]
    # (c) replay of a FOLDED batch across the compact is an idempotent
    # no-op (its effect is already in the base, and its pre-batch
    # snapshots are gone — the apply must not touch the table)
    assert cdc.scd2_apply_batch(_batch_df(spark, ROWS[2]), 2, table) is False
    assert _snapshot(cdc.read_scd2(spark, table).drop("kb")) == before
    # new batches keep applying on top of the base
    cdc.scd2_apply_batch(
        _batch_df(spark, [_u(2, "2026-01-02T00:00:00", 9, 7.0)]), 3, table
    )
    got = cdc.read_scd2(spark, table)
    chain = {
        r.dim_version: r.is_current for r in got.filter("user_id = 2").collect()
    }
    assert chain == {1: False, 2: True}
    # untouched users still resolve from the base
    assert {r.user_id for r in got.collect()} == {1, 2, 3}


def test_scd2_dir_count_bounded_under_long_stream(spark, tmp_path):
    # 50 applied batches with compact_every-style cadence: snapshot-dir
    # count stays bounded by the compaction interval, not batch count
    table = str(tmp_path / "scd2_long")
    every = 10
    for i in range(50):
        rows = [_u(i % 7, f"2026-01-01T{i % 24:02d}:{i % 60:02d}:00", 100 + i, float(i))]
        cdc.scd2_apply_batch(_batch_df(spark, rows), i, table)
        if i % every == every - 1:
            cdc.scd2_compact(spark, table)
    assert len(_dirs(table, "v=")) <= every
    assert len(_dirs(table, "base=")) == 1
    # the compacted table still equals the batch rebuild over the full log
    all_rows = [
        _u(i % 7, f"2026-01-01T{i % 24:02d}:{i % 60:02d}:00", 100 + i, float(i))
        for i in range(50)
    ]
    want = scd2_build(_batch_df(spark, all_rows))
    got = cdc.read_scd2(spark, table).drop("kb")
    assert _snapshot(got) == _snapshot(want)


def test_scd2_refuses_reset_checkpoint_epoch(spark, tmp_path):
    # batch ids restarting below the high water (checkpoint reset/swap)
    # must be refused, not silently resolved under existing versions
    import pytest

    table = str(tmp_path / "scd2_epoch")
    for i, rows in enumerate(ROWS):
        cdc.scd2_apply_batch(_batch_df(spark, rows), i, table)
    with pytest.raises(ValueError, match="high water"):
        cdc.scd2_apply_batch(_batch_df(spark, ROWS[0]), 0, table)
    # replay AT the high water stays legal and idempotent
    before = _snapshot(cdc.read_scd2(spark, table).drop("kb"))
    cdc.scd2_apply_batch(_batch_df(spark, ROWS[2]), 2, table)
    assert _snapshot(cdc.read_scd2(spark, table).drop("kb")) == before


def test_point_in_time_read_over_streamed_table(spark, tmp_path):
    # the live-table read path: stream-maintained SCD2 + batch facts
    # enrichment ≡ batch scd2_point_in_time over the full update log
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators.process import (
        scd2_point_in_time,
        scd2_point_in_time_from,
    )

    table = str(tmp_path / "scd2_pit")
    for i, rows in enumerate(ROWS):
        cdc.scd2_apply_batch(_batch_df(spark, rows), i, table)
    cdc.scd2_compact(spark, table)  # reads also work across a compact
    facts = spark.createDataFrame(
        [
            (1, "2026-01-01T09:30:00", 10),   # between v1(08:00) and v2(10:00)
            (1, "2026-01-01T23:00:00", 11),   # current version
            (2, "2026-01-01T08:59:00", 12),   # before first version -> NULLs
            (3, "2026-01-01T11:00:00", 13),   # exactly at valid_from
        ],
        "user_id long, ts string, fact_id long",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "fact_id")
    live = cdc.read_scd2(spark, table).drop("kb")
    got = scd2_point_in_time_from(live, facts)
    all_updates = _batch_df(spark, [r for batch in ROWS for r in batch])
    want = scd2_point_in_time(all_updates, facts)
    key = lambda df: {
        (r.fact_id): (r.user_id, r.dim_version, r.score) for r in df.collect()
    }
    assert key(got) == key(want)
    assert key(got)[10] == (1, 1, 0.5)
    assert key(got)[12] == (2, None, None)


def test_stream_writer_compacts_on_cadence(spark, tmp_path):
    # compact_every wired through the actual foreachBatch writer: drain
    # 3 micro-batches with compact_every=2 -> at least one compaction ran
    # (a base generation exists), dir growth is bounded, and the table
    # still equals the batch rebuild
    src = tmp_path / "updates_c"
    src.mkdir()
    for i, rows in enumerate(ROWS):
        _write(src / f"b{i}.json", rows)
    table = str(tmp_path / "scd2_table_c")
    q = (
        cdc.scd2_stream_writer(
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(src)),
            table,
            str(tmp_path / "ckpt_c"),
            compact_every=2,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(_dirs(table, "base=")) == 1
    assert len(_dirs(table, "v=")) <= 2
    all_updates = _batch_df(spark, [r for batch in ROWS for r in batch])
    want = scd2_build(all_updates)
    got = cdc.read_scd2(spark, table).drop("kb")
    assert _snapshot(got) == _snapshot(want)


DROWS = [
    # batch 0: users 1, 2 get versions
    [dict(_u(1, "2026-01-01T10:00:00", 1, 1.0), op="U"),
     dict(_u(2, "2026-01-01T09:00:00", 2, 5.0), op="U")],
    # batch 1: user 1 DELETED; user 2 updated
    [dict(_u(1, "2026-01-01T12:00:00", 3, 0.0), op="D"),
     dict(_u(2, "2026-01-01T13:00:00", 4, 6.0), op="U")],
    # batch 2: user 1 returns (re-versioned after the tombstone)
    [dict(_u(1, "2026-01-01T14:00:00", 5, 9.0), op="U")],
]


def _dbatch(spark, rows):
    return spark.createDataFrame(
        [tuple(r.values()) for r in rows],
        "user_id long, valid_from string, event_id long, score double, op string",
    ).selectExpr(
        "user_id", "CAST(valid_from AS TIMESTAMP) AS valid_from",
        "event_id", "score", "op",
    )


def test_cdc_apply_with_tombstones_matches_batch_rebuild(spark, tmp_path):
    # the read-back-as-update-log protocol must stay lossless under
    # deletes: stored tombstones reconstruct the log, so later rewrites
    # of the bucket do NOT resurrect pre-delete versions
    table = str(tmp_path / "scd2_del")
    for i, rows in enumerate(DROWS):
        cdc.scd2_apply_batch(_dbatch(spark, rows), i, table, op_col="op")
    got = cdc.read_scd2(spark, table)
    # current-readers drop the stored tombstone markers
    versions = cdc.read_scd2_current(spark, table).drop("kb", "op")
    all_log = _dbatch(spark, [r for b in DROWS for r in b])
    want = scd2_build(all_log, op_col="op").drop("op")
    assert _snapshot(versions) == _snapshot(want)
    # user 1: v1 closed by the tombstone at 12:00, v2 current from 14:00
    u1 = {r.dim_version: (str(r.valid_from), str(r.valid_to), r.is_current)
          for r in versions.filter("user_id = 1").collect()}
    assert u1[1] == ("2026-01-01 10:00:00", "2026-01-01 12:00:00", False)
    assert u1[2][0] == "2026-01-01 14:00:00" and u1[2][2] is True
    # the tombstone itself is stored (dim_version NULL, op = D)
    t = got.filter("dim_version IS NULL").collect()
    assert len(t) == 1 and t[0].op == "D" and t[0].user_id == 1
    # replay idempotence holds with deletes too
    before = _snapshot(got.drop("kb", "op"))
    cdc.scd2_apply_batch(_dbatch(spark, DROWS[2]), 2, table, op_col="op")
    assert _snapshot(cdc.read_scd2(spark, table).drop("kb", "op")) == before
    # and compaction preserves tombstones (the log stays lossless)
    cdc.scd2_compact(spark, table)
    after = cdc.read_scd2(spark, table)
    assert _snapshot(after.drop("kb", "op")) == before
    assert after.filter("dim_version IS NULL").count() == 1


def test_compact_cadence_survives_empty_boundary_batches(spark, tmp_path):
    # the cadence keys on UNCOMPACTED DEPTH (high_water - compacted_through),
    # so an empty or already-folded boundary batch cannot skip a whole
    # compaction cycle: the next applied batch triggers the overdue fold
    table = str(tmp_path / "scd2_cad")
    every = 3
    empty = _batch_df(spark, []).limit(0)
    for i in range(12):
        # every 3rd batch id is EMPTY -- under boundary-id keying with
        # compact_every=3 these are exactly the batches that would have
        # compacted (ids 2, 5, 8, 11), so compaction would never run
        batch = empty if i % every == every - 1 else _batch_df(
            spark, [_u(i % 4, f"2026-01-01T{i:02d}:00:00", 100 + i, float(i))]
        )
        cdc.scd2_apply_batch(batch, i, table)
        cdc.scd2_maybe_compact(spark, table, every)
    # depth-keyed cadence compacted anyway: a base exists and the live
    # snapshot-dir count respects the retention bound
    assert len(_dirs(table, "base=")) == 1
    assert len(_dirs(table, "v=")) <= every
    # reads unaffected
    all_rows = [
        _u(i % 4, f"2026-01-01T{i:02d}:00:00", 100 + i, float(i))
        for i in range(12)
        if i % every != every - 1
    ]
    want = scd2_build(_batch_df(spark, all_rows))
    got = cdc.read_scd2(spark, table).drop("kb")
    assert _snapshot(got) == _snapshot(want)
