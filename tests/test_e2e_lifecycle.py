"""End-to-end batch lifecycle journey — the reference's full operational
flow chained through the engine's operators on one dataset:

CreateBatch (CSV ingest) → AnalyzeBatch (validation) → BatchIgniter (pick)
→ ProcessBatch (upsert + dup errors) → GetBatch (status) → BatchFinalizer
(terminal states) → GetBatchErrors (error report) → DeleteBatch (guarded).

Each stage consumes the previous stage's DataFrame exactly as a deployment
would; assertions pin the cross-stage invariants the per-operator tests
cannot see (counts surviving joins, state transitions driven by real task
outcomes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.domain import (
    STATE_COMPLETE_WITH_ERROR,
    STATE_IN_PROCESS,
    STATE_NOT_STARTED,
    STATE_SUCCESS,
)
from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
    lifecycle,
    process,
)
from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators.analyze import (
    validate_tasks,
)
from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.sources.csv_tasks import (
    read_task_file,
)


def test_full_batch_journey(spark, tmp_path):
    # --- CreateBatch: two uploaded CSV task files → parsed task lines
    f1 = tmp_path / "batch1.csv"
    f1.write_text(
        "ModelA,S1,Asset-1\n"
        "ModelA,S2,Asset-2\n"
        "ModelA,S2,Asset-2-dup\n"  # duplicate serial → ProcessBatch error
        "bad line with, too, many, commas\n"  # AnalyzeBatch reject
    )
    f2 = tmp_path / "batch2.csv"
    f2.write_text("ModelB,S10,Asset-10\nModelB,S11,Asset-11\n")

    t1 = read_task_file(spark, str(f1), batch_id=1)
    t2 = read_task_file(spark, str(f2), batch_id=2)
    tasks = t1.unionByName(t2)
    assert tasks.count() == 6

    # --- AnalyzeBatch: validation split
    analyzed = validate_tasks(tasks)
    valid = analyzed.filter(F.col("valid"))
    invalid = analyzed.filter(~F.col("valid"))
    assert valid.count() == 5
    inv = invalid.collect()
    assert len(inv) == 1 and "comma" in inv[0].reason

    # --- batch anchors (CreateBatch): size = VALID task count per batch
    sizes = valid.groupBy("batch_id").agg(F.count(F.lit(1)).alias("size"))
    batches = sizes.select(
        "batch_id",
        F.lit(STATE_NOT_STARTED).alias("state"),
        F.col("batch_id").cast("timestamp").alias("inception_time"),
        "size",
    )

    # --- BatchIgniter: picks the oldest NOT_STARTED first
    picked = lifecycle.igniter_pick(batches, pool_size=1)
    assert [r.batch_id for r in picked.collect()] == [1]
    ignited = lifecycle.mark_in_process(batches, picked.select("batch_id"))
    states = {r.batch_id: r.state for r in ignited.collect()}
    assert states == {1: STATE_IN_PROCESS, 2: STATE_NOT_STARTED}

    # --- ProcessBatch over every valid task (both batches)
    results = process.process_tasks(valid)
    by_task = {(r.batch_id, r.task_number): r for r in results.collect()}
    assert len(by_task) == 5
    dup_errors = [r for r in by_task.values() if not r.ok]
    assert len(dup_errors) == 1
    assert "could not be created" in dup_errors[0].reason
    assert dup_errors[0].batch_id == 1

    # --- GetBatch: status counts reflect the outcomes
    status = {r.batch_id: r for r in lifecycle.batch_status(batches, results).collect()}
    assert (status[1].completed_count, status[1].success_count, status[1].error_count) == (3, 2, 1)
    assert (status[2].completed_count, status[2].error_count) == (2, 0)

    # --- BatchFinalizer: batch 1 errored, batch 2 clean
    final = {r.batch_id: r for r in lifecycle.finalize_batches(batches, results).collect()}
    assert final[1].final_state == STATE_COMPLETE_WITH_ERROR
    assert final[2].final_state == STATE_SUCCESS

    # --- GetBatchErrors: the dup-serial error grouped under its task
    errors = lifecycle.batch_errors(results.filter(~F.col("ok"))).collect()
    assert len(errors) == 1
    assert errors[0].error_count == 1

    # --- DeleteBatch: IN_PROCESS batch 1 is protected, NOT_STARTED 2 deletable
    after_ignite = ignited
    criteria = spark.createDataFrame([(1,), (2,)], "batch_id long")
    survivors = lifecycle.delete_batches(after_ignite, criteria)
    assert [r.batch_id for r in survivors.collect()] == [1]
    rejected = lifecycle.delete_batches_rejected(after_ignite, criteria).collect()
    assert {r.batch_id for r in rejected} == {1}
