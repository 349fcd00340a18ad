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
