"""Task validation — parity with AnalyzeBatch.groovy.

The reference visits each line serially and records an error when a line has
more than MAXIMUM_COMMAS commas or fails the task regex
(AnalyzeBatch.groovy:140-151 ``analyzeTasks``). Here validation is a single
narrow projection over the task table: pure JVM-side column expressions
(no UDFs), so whole-stage codegen keeps the scan→filter→project pipeline in
one stage regardless of scale. Error rows are a filter, not a driver loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..domain import (
    ASSET_NAME_MAX,
    MAXIMUM_COMMAS,
    MAXIMUM_TASK_COUNT,
    MODEL_NAME_MAX,
    SERIAL_MAX,
    TASK_PATTERN,
)


def comma_count(col: Column) -> Column:
    """Number of commas in a line (reference: ``task.count(/,/)``)."""
    return F.length(col) - F.length(F.regexp_replace(col, ",", ""))


def validate_tasks(tasks: DataFrame, line_col: str = "raw_line") -> DataFrame:
    """Annotate each task with validity + the reference's error reasons.

    Returns the input plus ``n_commas``, ``valid``, ``reason`` and ``field``
    columns. Reason strings mirror AnalyzeBatch.groovy error ids 1031; the
    ``field`` column names the first CSV field violating its own cap from
    the task regex (AnalyzeBatch.groovy:89 — model 1-100 word chars,
    serial/asset 1-200 word chars or dashes), which is what a user
    debugging a rejected upload needs. ``field`` is NULL for valid lines
    and for the line-level comma error (no single field to blame).
    """
    line = F.col(line_col)
    n_commas = comma_count(line)
    matches = line.rlike(TASK_PATTERN)
    reason = (
        F.when(
            n_commas > MAXIMUM_COMMAS,
            F.lit(
                "Task contains too many ',' (comma) characters. "
                f"Maximum allowed is ({MAXIMUM_COMMAS})."
            ),
        )
        .when(~matches, F.lit("Task has invalid form."))
        .otherwise(F.lit(None).cast("string"))
    )
    # F.get returns NULL past the end (unlike ANSI element_at, which
    # throws), so short lines fall through to "missing field invalid".
    parts = F.split(line, ",", -1)
    model_ok = F.coalesce(F.get(parts, 0).rlike(rf"^\w{{1,{MODEL_NAME_MAX}}}$"), F.lit(False))
    serial_ok = F.coalesce(F.get(parts, 1).rlike(rf"^[\w-]{{1,{SERIAL_MAX}}}$"), F.lit(False))
    asset_ok = F.coalesce(F.get(parts, 2).rlike(rf"^[\w-]{{1,{ASSET_NAME_MAX}}}$"), F.lit(False))
    field = (
        F.when(n_commas > MAXIMUM_COMMAS, F.lit(None).cast("string"))
        .when(matches, F.lit(None).cast("string"))
        .when(~model_ok, F.lit("model_name"))
        .when(~serial_ok, F.lit("serial_number"))
        .when(~asset_ok, F.lit("asset_name"))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        tasks.withColumn("n_commas", n_commas)
        .withColumn("valid", reason.isNull())
        .withColumn("reason", reason)
        .withColumn("field", field)
    )


def analyze_batch(tasks: DataFrame, batch_col: str = "batch_id") -> DataFrame:
    """Per-batch analysis summary — AnalyzeBatch's success contract
    (``{"result": {"taskCount": N}}``) plus the oversize check
    (error 1030 when taskCount > MAXIMUM_TASK_COUNT).

    One hash-aggregate with map-side partial aggregation; at 100 TB this is
    a single shuffle on batch_id.
    """
    validated = validate_tasks(tasks)
    return validated.groupBy(batch_col).agg(
        F.count(F.lit(1)).alias("task_count"),
        F.sum(F.when(~F.col("valid"), 1).otherwise(0)).alias("invalid_count"),
        (F.count(F.lit(1)) > MAXIMUM_TASK_COUNT).alias("exceeds_maximum"),
    )
