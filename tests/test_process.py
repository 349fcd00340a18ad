"""ProcessBatch parity: first-wins upsert, duplicate-asset errors
(reference: internal/ProcessBatch.groovy:142-187)."""

from __future__ import annotations

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
    process,
)


def _tasks(spark):
    rows = [
        # (batch, task, model, serial, asset)
        (1, 1, "M1", "S1", "A1"),
        (1, 2, "M1", "S1", "A1-dup"),  # duplicate (model, serial) → error
        (1, 3, "M1", "S2", "A2"),  # same model, new serial → ok (model upsert idempotent)
        (2, 1, "M2", "S1", "B1"),  # same serial under another model → ok
        (2, 2, "M1", "S1", "late"),  # later batch, same key → error
    ]
    return spark.createDataFrame(
        rows,
        "batch_id long, task_number long, model_name string, serial_number string, asset_name string",
    )


def test_first_wins_and_duplicate_errors(spark):
    out = {(r.batch_id, r.task_number): r for r in process.process_tasks(_tasks(spark)).collect()}
    assert out[(1, 1)].ok is True and out[(1, 1)].reason is None
    assert out[(1, 2)].ok is False
    assert out[(1, 2)].reason == (
        "Asset with model number = 'M1' and serial number = 'S1' could not be created."
    )
    assert out[(1, 3)].ok is True
    assert out[(2, 1)].ok is True
    assert out[(2, 2)].ok is False


def test_existing_assets_always_conflict(spark):
    existing = spark.createDataFrame([("M1", "S2")], "model_name string, serial_number string")
    out = {
        (r.batch_id, r.task_number): r
        for r in process.process_tasks(_tasks(spark), existing_assets=existing).collect()
    }
    assert out[(1, 3)].ok is False  # pre-existing asset blocks the claim
    assert out[(1, 1)].ok is True


def test_created_assets_is_winner_set(spark):
    rows = process.created_assets(_tasks(spark)).collect()
    got = {(r.model_name, r.serial_number): r.asset_name for r in rows}
    assert got == {("M1", "S1"): "A1", ("M1", "S2"): "A2", ("M2", "S1"): "B1"}


def test_distinct_models(spark):
    got = {r.model_name for r in process.distinct_models(_tasks(spark)).collect()}
    assert got == {"M1", "M2"}


def test_latest_wins_merge_version_and_tie_semantics(spark):
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
        process,
    )

    base = spark.createDataFrame(
        [(1, "old-a", 3), (2, "old-b", 5), (3, "old-c", 2)],
        "doc_id long, text string, version long",
    )
    updates = spark.createDataFrame(
        [
            (1, "new-a", 4),   # higher version -> wins
            (2, "new-b", 4),   # LOWER version -> base survives
            (3, "new-c", 2),   # same version -> update wins (newer feed)
        ],
        "doc_id long, text string, version long",
    )
    out = {
        r.doc_id: (r.text, r.version, r.src)
        for r in process.latest_wins_merge(base, updates).collect()
    }
    assert out == {
        1: ("new-a", 4, "update"),
        2: ("old-b", 5, "base"),
        3: ("new-c", 2, "update"),
    }


def test_scd2_build_intervals(spark):
    updates = spark.createDataFrame(
        [
            (1, "2026-01-01 10:00:00", 10, 1.0),
            (1, "2026-01-01 12:00:00", 11, 2.0),
            (2, "2026-01-01 09:00:00", 12, 5.0),
        ],
        "user_id long, valid_from_s string, event_id long, score double",
    ).selectExpr(
        "user_id", "CAST(valid_from_s AS TIMESTAMP) AS valid_from", "event_id", "score"
    )
    rows = {
        (r.user_id, r.dim_version): r
        for r in process.scd2_build(updates).collect()
    }
    assert rows[(1, 1)].valid_to == rows[(1, 2)].valid_from
    assert rows[(1, 2)].valid_to is None and rows[(1, 2)].is_current
    assert not rows[(1, 1)].is_current
    assert rows[(2, 1)].valid_to is None and rows[(2, 1)].is_current


def test_scd2_point_in_time_semantics(spark):
    # dim: v1 @10:00 (score 1), v2 @12:00 (score 2); user 2 has a
    # zero-width v1 (two updates at the same instant, lower event_id loses)
    dim = spark.createDataFrame(
        [
            (1, "2026-01-01 10:00:00", 10, 1.0),
            (1, "2026-01-01 12:00:00", 11, 2.0),
            (2, "2026-01-01 09:00:00", 12, 7.0),
            (2, "2026-01-01 09:00:00", 13, 8.0),
        ],
        "user_id long, vf string, event_id long, score double",
    ).selectExpr("user_id", "CAST(vf AS TIMESTAMP) AS valid_from", "event_id", "score")
    facts = spark.createDataFrame(
        [
            (100, 1, "2026-01-01 09:30:00"),  # before first version -> NULLs
            (101, 1, "2026-01-01 11:59:00"),  # inside v1
            (102, 1, "2026-01-01 12:00:00"),  # AT the v2 boundary -> v2 (ASOF >=)
            (103, 2, "2026-01-01 09:00:00"),  # same-instant double update -> survivor
        ],
        "fact_id long, user_id long, ts_s string",
    ).selectExpr("fact_id", "user_id", "CAST(ts_s AS TIMESTAMP) AS ts")
    out = {
        r.fact_id: (r.dim_version, r.score)
        for r in process.scd2_point_in_time(dim, facts).collect()
    }
    assert out[100] == (None, None)
    assert out[101] == (1, 1.0)
    assert out[102] == (2, 2.0)
    # the zero-width interval (event 12) is skipped; event 13's version wins
    assert out[103] == (2, 8.0)


def test_scd2_tombstones_close_intervals_and_null_facts(spark):
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators.process import (
        scd2_build,
        scd2_point_in_time,
    )

    # user 1: v1 at 10:00, DELETED at 12:00, v2 at 14:00 (re-versioned)
    # user 2: only a delete (no prior version) — degenerate tombstone
    updates = spark.createDataFrame(
        [
            (1, "2026-01-01 10:00:00", 1, 1.0, "U"),
            (1, "2026-01-01 12:00:00", 2, 0.0, "D"),
            (1, "2026-01-01 14:00:00", 3, 3.0, "U"),
            (2, "2026-01-01 09:00:00", 4, 0.0, "D"),
        ],
        "user_id long, valid_from string, event_id long, score double, op string",
    ).selectExpr(
        "user_id", "CAST(valid_from AS TIMESTAMP) AS valid_from",
        "event_id", "score", "op",
    )
    hist = scd2_build(updates, op_col="op")
    rows = {(r.user_id, r.dim_version): r for r in hist.collect()}
    # tombstones emit no version rows; the delete closed v1 at 12:00
    assert set(rows) == {(1, 1), (1, 2)}
    assert str(rows[(1, 1)].valid_to) == "2026-01-01 12:00:00"
    assert rows[(1, 1)].is_current is False
    assert rows[(1, 2)].valid_to is None and rows[(1, 2)].is_current

    facts = spark.createDataFrame(
        [
            (1, "2026-01-01 11:00:00", 10),  # inside v1
            (1, "2026-01-01 13:00:00", 11),  # in the deleted gap -> NULLs
            (1, "2026-01-01 12:00:00", 12),  # exactly at the delete -> NULLs
            (1, "2026-01-01 15:00:00", 13),  # inside v2
            (2, "2026-01-01 10:00:00", 14),  # after a bare delete -> NULLs
        ],
        "user_id long, ts string, fact_id long",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "fact_id")
    got = {
        r.fact_id: (r.dim_version, r.score)
        for r in scd2_point_in_time(updates, facts, op_col="op").collect()
    }
    assert got[10] == (1, 1.0)
    assert got[11] == (None, None)
    assert got[12] == (None, None)
    assert got[13] == (2, 3.0)
    assert got[14] == (None, None)
    # without op_col the same updates behave as pure upserts (3 versions)
    assert scd2_build(updates.drop("op")).filter("user_id = 1").count() == 3


def test_scd2_snapshot_diff_taxonomy(spark):
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators.process import (
        scd2_snapshot_diff,
    )

    updates = spark.createDataFrame(
        [
            # user 1: v1 before t1, v2 between t1 and t2 -> changed
            (1, "2026-01-01 08:00:00", 1, 1.0, "U"),
            (1, "2026-01-01 12:00:00", 2, 2.0, "U"),
            # user 2: single version before t1, untouched -> unchanged
            (2, "2026-01-01 08:30:00", 3, 5.0, "U"),
            # user 3: first appears between t1 and t2 -> added
            (3, "2026-01-01 13:00:00", 4, 7.0, "U"),
            # user 4: exists at t1, DELETED before t2 -> removed
            (4, "2026-01-01 09:00:00", 5, 9.0, "U"),
            (4, "2026-01-01 14:00:00", 6, 0.0, "D"),
        ],
        "user_id long, valid_from string, event_id long, score double, op string",
    ).selectExpr(
        "user_id", "CAST(valid_from AS TIMESTAMP) AS valid_from",
        "event_id", "score", "op",
    )
    out = {
        r.user_id: (r.change, r.version_t1, r.version_t2, r.value_t1, r.value_t2)
        for r in scd2_snapshot_diff(
            updates, "2026-01-01 10:00:00", "2026-01-01 16:00:00", op_col="op"
        ).collect()
    }
    assert out[1] == ("changed", 1, 2, 1.0, 2.0)
    assert out[2] == ("unchanged", 1, 1, 5.0, 5.0)
    assert out[3] == ("added", None, 1, None, 7.0)
    assert out[4] == ("removed", 1, None, 9.0, None)


def test_scd2_snapshot_diff_property(spark):
    """Hypothesis: the diff report agrees with a brute-force per-key
    replay (latest non-deleted update at or before each probe decides
    the state) for arbitrary update streams with deletes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators.process import (
        scd2_snapshot_diff,
    )

    @settings(max_examples=12, deadline=None)
    @given(
        ups=st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=4),   # user
                st.integers(min_value=0, max_value=23),  # hour
                st.booleans(),                           # delete?
            ),
            min_size=1,
            max_size=14,
            unique_by=lambda u: (u[0], u[1]),  # one event per (key, ts)
        ),
        t1h=st.integers(min_value=0, max_value=23),
        t2h=st.integers(min_value=0, max_value=23),
    )
    def check(ups, t1h, t2h):
        rows = [
            (u, f"2026-01-01 {h:02d}:00:00", i + 1, float(i), "D" if d else "U")
            for i, (u, h, d) in enumerate(ups)
        ]
        updates = spark.createDataFrame(
            rows,
            "user_id long, valid_from string, event_id long, score double, op string",
        ).selectExpr(
            "user_id", "CAST(valid_from AS TIMESTAMP) AS valid_from",
            "event_id", "score", "op",
        )
        t1 = f"2026-01-01 {min(t1h, t2h):02d}:30:00"
        t2 = f"2026-01-01 {max(t1h, t2h):02d}:30:00"
        got = {
            r.user_id: r.change
            for r in scd2_snapshot_diff(updates, t1, t2, op_col="op").collect()
        }

        # brute force: state at t = the latest event at-or-before t per
        # key; deletes clear it. Versions number the upserts in ts order.
        def state(t):
            out = {}
            for u in {r[0] for r in rows}:
                evs = sorted(
                    (r for r in rows if r[0] == u and r[1] <= t),
                    key=lambda r: r[1],
                )
                if not evs or evs[-1][4] == "D":
                    continue
                version = sum(1 for r in evs if r[4] == "U")
                out[u] = version
            return out

        s1, s2 = state(t1), state(t2)
        want = {}
        for u in set(s1) | set(s2):
            if u not in s1:
                want[u] = "added"
            elif u not in s2:
                want[u] = "removed"
            elif s1[u] == s2[u]:
                want[u] = "unchanged"
            else:
                want[u] = "changed"
        assert got == want

    check()
