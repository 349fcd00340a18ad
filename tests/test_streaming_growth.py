"""Streaming growth accounting: drained-stream ≡ batch, replay
idempotence, the retraction-free churn overlay, and compaction."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
    temporal,
)
from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.sources.catalog import (
    load_table,
)
from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.streaming import (
    growth,
)


def _report_dict(df):
    return {
        r.period: (r.n_active, r.n_new, r.n_retained, r.n_resurrected, r.n_churned)
        for r in df.collect()
    }


def _batch_dict(events, period="day"):
    return _report_dict(temporal.growth_accounting(events, period=period))


def test_growth_stream_drained_equals_batch(spark, sf_dir, tmp_path):
    """The full sf0.001 events table drained through three time-ordered
    micro-batches materializes exactly the batch report — including the
    trailing-churn overlay for users idle at the frontier."""
    events = load_table(spark, sf_dir, "events")
    # three period-monotone slices (the documented ordering contract)
    q = events.selectExpr(
        "percentile_disc(0.33) WITHIN GROUP (ORDER BY unix_micros(ts)) AS c1",
        "percentile_disc(0.66) WITHIN GROUP (ORDER BY unix_micros(ts)) AS c2",
    ).collect()[0]
    us = F.unix_micros(F.col("ts"))
    slices = [
        events.filter(us <= q.c1),
        events.filter((us > q.c1) & (us <= q.c2)),
        events.filter(us > q.c2),
    ]
    tbl = str(tmp_path / "growth")
    for i, sl in enumerate(slices):
        assert growth.growth_apply_batch(sl, i, tbl)
    got = _report_dict(growth.read_growth_report(spark, tbl))
    want = _batch_dict(events)
    assert got == want


def test_growth_stream_writer_end_to_end(spark, sf_dir, tmp_path):
    """Same equality through the real foreachBatch writer (file-source
    micro-batches, availableNow)."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 3 == 0
    )
    rows = sorted(
        (
            {
                "event_id": r.event_id,
                "ts": r.ts.isoformat(),
                "user_id": r.user_id,
            }
            for r in events.collect()
        ),
        key=lambda d: d["ts"],
    )
    src = tmp_path / "evsrc"
    src.mkdir()
    third = max(1, len(rows) // 3)
    for i in range(3):
        chunk = rows[i * third :] if i == 2 else rows[i * third : (i + 1) * third]
        with open(src / f"b{i}.json", "w") as f:
            for r in chunk:
                f.write(json.dumps(r) + "\n")
        # the file source orders micro-batches by modification time; same-
        # mtime files can reorder and break the per-user period-monotone
        # contract — pin strictly increasing mtimes
        os.utime(src / f"b{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    tbl = str(tmp_path / "growth_w")
    q = (
        growth.growth_stream_writer(
            stream, tbl, str(tmp_path / "ckpt"), compact_every=2
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _report_dict(growth.read_growth_report(spark, tbl))
    assert got == _batch_dict(events)


def test_growth_gap_churn_moves_from_overlay_to_increment(spark, tmp_path):
    """The retraction-free argument, pinned: a user idle at the frontier
    shows TRAILING churn (overlay); when they return, the same churn row
    re-appears as a GAP increment and the overlay drops them — the report
    is identical before-and-after except for the return's own activity."""
    import datetime as dt

    def ev(eid, user, day):
        return (eid, dt.datetime(2026, 1, day, 8, 0), user, "v", 1.0, "{}")

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    tbl = str(tmp_path / "g")
    # b0: users 1,2 on d1; user 2 on d2; user 1 idle -> trailing churn d2
    b0 = spark.createDataFrame([ev(1, 1, 1), ev(2, 2, 1), ev(3, 2, 2)], schema)
    assert growth.growth_apply_batch(b0, 0, tbl)
    rep0 = _report_dict(growth.read_growth_report(spark, tbl))
    assert rep0 == {
        dt.date(2026, 1, 1): (2, 2, 0, 0, 0),
        dt.date(2026, 1, 2): (1, 0, 1, 0, 1),  # user 1: overlay churn
    }
    # increments alone must NOT contain the overlay churn yet
    inc0 = growth._resolve_increments(spark, tbl)
    assert inc0.agg(F.sum("n_churned")).collect()[0][0] == 0

    # b1: user 1 returns on d4 -> resurrected; churn at d2 becomes a GAP
    # increment; user 2 idle since d2 -> trailing churn d3
    b1 = spark.createDataFrame([ev(4, 1, 4)], schema)
    assert growth.growth_apply_batch(b1, 1, tbl)
    rep1 = _report_dict(growth.read_growth_report(spark, tbl))
    assert rep1 == {
        dt.date(2026, 1, 1): (2, 2, 0, 0, 0),
        dt.date(2026, 1, 2): (1, 0, 1, 0, 1),  # unchanged row, now from inc
        dt.date(2026, 1, 3): (0, 0, 0, 0, 1),  # user 2 trailing churn
        dt.date(2026, 1, 4): (1, 0, 0, 1, 0),
    }
    inc1 = growth._resolve_increments(spark, tbl)
    assert inc1.agg(F.sum("n_churned")).collect()[0][0] == 1  # the gap row


def test_growth_replay_is_idempotent_and_epoch_guarded(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    q = events.selectExpr(
        "percentile_disc(0.5) WITHIN GROUP (ORDER BY unix_micros(ts)) AS c"
    ).collect()[0]
    us = F.unix_micros(F.col("ts"))
    b0 = events.filter(us <= q.c)
    b1 = events.filter(us > q.c)
    tbl = str(tmp_path / "g")
    assert growth.growth_apply_batch(b0, 0, tbl)
    assert growth.growth_apply_batch(b1, 1, tbl)
    once = _report_dict(growth.read_growth_report(spark, tbl))
    # replay of the last committed batch: no-op, identical report
    assert growth.growth_apply_batch(b1, 1, tbl) is False
    assert _report_dict(growth.read_growth_report(spark, tbl)) == once
    # a batch id below high water is a reset checkpoint: refused loudly
    import pytest

    with pytest.raises(ValueError, match="high water"):
        growth.growth_apply_batch(b0, 0, tbl)


def test_growth_crash_recompute_from_prior_state(spark, sf_dir, tmp_path):
    """Crash between the batch's dir writes and the meta write: the replay
    recomputes from the PRIOR state snapshot and converges on the same
    report (exactly-once by idempotence)."""
    events = load_table(spark, sf_dir, "events")
    q = events.selectExpr(
        "percentile_disc(0.5) WITHIN GROUP (ORDER BY unix_micros(ts)) AS c"
    ).collect()[0]
    us = F.unix_micros(F.col("ts"))
    b0 = events.filter(us <= q.c)
    b1 = events.filter(us > q.c)
    tbl = str(tmp_path / "g")
    assert growth.growth_apply_batch(b0, 0, tbl)
    assert growth.growth_apply_batch(b1, 1, tbl)
    want = _report_dict(growth.read_growth_report(spark, tbl))
    # simulate the crash: rewind meta to before batch 1 (dirs committed)
    growth._write_meta(tbl, {"high_water": 0, "compacted_through": -1})
    assert growth.growth_apply_batch(b1, 1, tbl)  # replay recomputes
    assert _report_dict(growth.read_growth_report(spark, tbl)) == want


def test_growth_compact_preserves_report_and_crash_window(
    spark, sf_dir, tmp_path
):
    events = load_table(spark, sf_dir, "events")
    qs = events.selectExpr(
        "percentile_disc(0.33) WITHIN GROUP (ORDER BY unix_micros(ts)) AS c1",
        "percentile_disc(0.66) WITHIN GROUP (ORDER BY unix_micros(ts)) AS c2",
    ).collect()[0]
    us = F.unix_micros(F.col("ts"))
    slices = [
        events.filter(us <= qs.c1),
        events.filter((us > qs.c1) & (us <= qs.c2)),
        events.filter(us > qs.c2),
    ]
    tbl = str(tmp_path / "g")
    for i, sl in enumerate(slices):
        assert growth.growth_apply_batch(sl, i, tbl)
    want = _report_dict(growth.read_growth_report(spark, tbl))

    growth.growth_compact(spark, tbl)
    assert _report_dict(growth.read_growth_report(spark, tbl)) == want
    assert growth._versions(tbl, "inc") == []
    assert growth._versions(tbl, "inc_base") == [2]
    assert len(growth._versions(tbl, "state")) == 1

    # stale-meta crash window: base committed, meta rewound — the
    # base-derived floor must keep folded increments from double-counting
    growth._write_meta(tbl, {"high_water": 2, "compacted_through": -1})
    assert _report_dict(growth.read_growth_report(spark, tbl)) == want
    # the next compact finishes the interrupted one (meta catch-up)
    growth.growth_compact(spark, tbl)
    assert growth._read_meta(tbl)["compacted_through"] == 2
    assert _report_dict(growth.read_growth_report(spark, tbl)) == want

    # a torn (uncommitted) base is invisible to readers
    torn = os.path.join(tbl, "inc_base", "v=9")
    os.makedirs(os.path.join(torn, "_temporary"))
    assert growth._versions(tbl, "inc_base") == [2]
    assert _report_dict(growth.read_growth_report(spark, tbl)) == want


def _ev_rows(spark, rows):
    import datetime as dt

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    return spark.createDataFrame(
        [
            (eid, dt.datetime(2026, 1, day, 8, 0), user, "v", 1.0, "{}")
            for eid, user, day in rows
        ],
        schema,
    )


def test_growth_apply_crash_window_reads_consistently(spark, tmp_path):
    """Crash BETWEEN the inc write and the state write of batch b: the
    committed inc/v=b must stay invisible until its state lands,
    otherwise a user who resurrected in b would have their churn counted
    twice at the same period — once from the gap-churn increment, once
    from the trailing-churn overlay the stale state still derives."""
    import shutil

    tbl = str(tmp_path / "g")
    # b0: users 1,2 on d1; user 2 on d2 — user 1 idle at the frontier
    assert growth.growth_apply_batch(_ev_rows(spark, [(1, 1, 1), (2, 2, 1), (3, 2, 2)]), 0, tbl)
    rep0 = _report_dict(growth.read_growth_report(spark, tbl))

    # b1: user 1 returns on d4 (gap churn at d2 becomes an increment).
    # Simulate the crash: full apply, then remove state/v=1 and rewind
    # meta — exactly the on-disk picture of a crash after the inc commit.
    b1 = _ev_rows(spark, [(4, 1, 4)])
    assert growth.growth_apply_batch(b1, 1, tbl)
    want = _report_dict(growth.read_growth_report(spark, tbl))
    shutil.rmtree(os.path.join(tbl, "state", "v=1"))
    growth._write_meta(tbl, {"high_water": 0, "compacted_through": -1})

    # the torn batch must be invisible: report == pre-batch report (the
    # unfixed reader showed n_churned=2 at d2 — inc gap churn + stale
    # overlay for the same user)
    assert _report_dict(growth.read_growth_report(spark, tbl)) == rep0

    # replay converges on the full report
    assert growth.growth_apply_batch(b1, 1, tbl)
    assert _report_dict(growth.read_growth_report(spark, tbl)) == want


def test_growth_compact_never_folds_an_unpaired_increment(spark, tmp_path):
    """growth_compact during the same crash window must not bake the
    orphan inc/v=b into a base generation — a base outrunning the state
    would pair b's churn with the pre-b overlay permanently."""
    import shutil

    tbl = str(tmp_path / "g")
    assert growth.growth_apply_batch(_ev_rows(spark, [(1, 1, 1), (2, 2, 1), (3, 2, 2)]), 0, tbl)
    rep0 = _report_dict(growth.read_growth_report(spark, tbl))
    b1 = _ev_rows(spark, [(4, 1, 4)])
    assert growth.growth_apply_batch(b1, 1, tbl)
    want = _report_dict(growth.read_growth_report(spark, tbl))
    shutil.rmtree(os.path.join(tbl, "state", "v=1"))
    growth._write_meta(tbl, {"high_water": 0, "compacted_through": -1})

    growth.growth_compact(spark, tbl)
    # the fold stopped at the state ceiling: base=v0, orphan inc/v=1 kept
    assert growth._versions(tbl, "inc_base") == [0]
    assert growth._versions(tbl, "inc") == [1]
    assert _report_dict(growth.read_growth_report(spark, tbl)) == rep0

    assert growth.growth_apply_batch(b1, 1, tbl)
    assert _report_dict(growth.read_growth_report(spark, tbl)) == want


def test_growth_compact_keeps_the_replay_floor_snapshot(spark, tmp_path):
    """growth_compact while an un-acknowledged state/v=b is on disk (apply
    crashed before its meta write) must keep state/v=b−1: that snapshot is
    what batch b's replay reads, and pruning to the single newest dir
    would make the replay recompute from an EMPTY state."""
    tbl = str(tmp_path / "g")
    assert growth.growth_apply_batch(_ev_rows(spark, [(1, 1, 1), (2, 2, 1), (3, 2, 2)]), 0, tbl)
    b1 = _ev_rows(spark, [(4, 1, 4)])
    assert growth.growth_apply_batch(b1, 1, tbl)
    want = _report_dict(growth.read_growth_report(spark, tbl))
    # crash before the meta write: both v=1 dirs committed, meta at 0
    growth._write_meta(tbl, {"high_water": 0, "compacted_through": -1})

    growth.growth_compact(spark, tbl)
    # the meta-acknowledged snapshot (v=0) survives alongside the pending one
    assert growth._versions(tbl, "state") == [0, 1]

    # replay of batch 1 reads state/v=0 and converges
    assert growth.growth_apply_batch(b1, 1, tbl)
    assert _report_dict(growth.read_growth_report(spark, tbl)) == want
    # a post-replay compact prunes the superseded snapshot
    growth.growth_compact(spark, tbl)
    assert growth._versions(tbl, "state") == [1]
    assert _report_dict(growth.read_growth_report(spark, tbl)) == want
