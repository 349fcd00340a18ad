"""ProcessBatch parity — entity creation as distributed upsert.

The reference walks tasks serially: ``createModel`` is an idempotent store
(duplicate models swallowed, ProcessBatch.groovy:142-153) and
``createAsset`` fails on duplicate (model, serial) pairs
(ProcessBatch.groovy:175-187), producing one SuccessAnchor or ErrorAnchor
per task. Distributed re-expression: "first writer wins" is a window (or
min-aggregate) over the natural key; later claimants become error rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distinct_models(tasks: DataFrame) -> DataFrame:
    """The model table ProcessBatch would have created: one row per distinct
    model_name. A single shuffle-dedup with map-side partial aggregation."""
    return tasks.select("model_name").where(F.col("model_name").isNotNull()).distinct()


def process_tasks(tasks: DataFrame, existing_assets: DataFrame | None = None) -> DataFrame:
    """Run every task: first task (lowest task_number) to claim a
    (model_name, serial_number) wins and creates the asset; subsequent tasks
    for the same key produce the reference's duplicate-asset error. Tasks
    joined against ``existing_assets`` (model_name, serial_number) always
    error, mirroring EntityAlreadyExistsException on pre-existing assets.

    Returns TASK_RESULT-shaped rows (batch_id, task_number, ok, reason).
    One shuffle on the natural key for the window; the existing-assets probe
    is a broadcast join for dimension-sized asset registries, shuffle join
    otherwise.
    """
    key = [F.col("model_name"), F.col("serial_number")]
    w = Window.partitionBy(*key).orderBy(F.col("batch_id").asc(), F.col("task_number").asc())
    claimed = tasks.withColumn("_claim", F.row_number().over(w))

    if existing_assets is not None:
        existing = existing_assets.select(
            F.col("model_name"), F.col("serial_number"), F.lit(True).alias("_exists")
        )
        claimed = claimed.join(existing, ["model_name", "serial_number"], "left")
    else:
        claimed = claimed.withColumn("_exists", F.lit(None).cast("boolean"))

    dup = (F.col("_claim") > 1) | F.col("_exists").isNotNull()
    reason = F.when(
        dup,
        F.concat(
            F.lit("Asset with model number = '"),
            F.col("model_name"),
            F.lit("' and serial number = '"),
            F.col("serial_number"),
            F.lit("' could not be created."),
        ),
    )
    return claimed.select(
        "batch_id",
        "task_number",
        (~dup).alias("ok"),
        reason.alias("reason"),
    )


def created_assets(tasks: DataFrame) -> DataFrame:
    """The asset table after processing: the winning claimant per key."""
    w = Window.partitionBy("model_name", "serial_number").orderBy(
        F.col("batch_id").asc(), F.col("task_number").asc()
    )
    return (
        tasks.withColumn("_claim", F.row_number().over(w))
        .filter(F.col("_claim") == 1)
        .select("model_name", "serial_number", "asset_name")
    )


def latest_wins_merge(
    base: DataFrame,
    updates: DataFrame,
    key_col: str = "doc_id",
    version_col: str = "version",
) -> DataFrame:
    """Snapshot merge with LAST-writer-wins semantics — the CDC-compaction
    twin of ``process_tasks``' first-wins claim: a base snapshot plus an
    updates batch collapse to one row per key, the row with the highest
    (version, is_update) pair. An update at the same version as base wins
    (updates are the newer feed); within a side the highest version wins.

    This is the MERGE INTO / upsert-compaction every incremental corpus
    needs when a crawler re-fetches pages: schema-aligned union, one
    shuffle on the key, max_by per key — no join, so the plan cost is one
    pass over |base| + |updates| however often it runs. Rows keep a
    ``src`` marker ('base' | 'update') so audits can count effective
    overwrites.

    Column contract: both inputs share the same schema (plus key/version);
    output = that schema + src.
    """
    tagged = base.withColumn("src", F.lit("base")).unionByName(
        updates.withColumn("src", F.lit("update"))
    )
    pick = Window.partitionBy(key_col).orderBy(
        F.col(version_col).desc(),
        F.when(F.col("src") == "update", 1).otherwise(0).desc(),
    )
    return (
        tagged.withColumn("_rk", F.row_number().over(pick))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
