"""CSV task-file source.

Parity: CreateBatch.groovy request contract — an uploaded CSV where each line
is ``ModelName,SerialNumber,AssetName[,Properties,AssetGroup]``. The
reference streams the file line-by-line through a ``LineNumberReader``
(AnalyzeBatch.groovy:101-107); here a task file of any size is a distributed
``spark.read.text`` scan. Line numbering is per-file split-offset math —
no stage ever funnels the data through a single partition (the r1 global
window did; see read_task_file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: monotonically_increasing_id layout: partition id in the upper 31 bits,
#: per-partition record number in the lower 33.
_MID_RECORD_MASK = (1 << 33) - 1


def read_task_file(spark: SparkSession, path: str, batch_id: int = 1) -> DataFrame:
    """Read a raw CSV task upload into the TASK_SCHEMA shape.

    Line numbers are 1-based within each file, like the reference's
    LineNumberReader loop (AnalyzeBatch.groovy ``tasks.eachLine { task,
    lineNumber -> ... }`` — one uploaded file per batch).

    Scale shape: each scan split already knows its local 0-based record
    offset (the low bits of ``monotonically_increasing_id``); the only
    coordination needed is each split's starting offset within its file,
    computed from the per-(file, split) row counts — one tiny row per
    split — with a cumulative-sum window over THOSE, then broadcast-joined
    back. The data itself is never globally sorted or single-partitioned
    (the r1 version's ``Window.orderBy(monotonic_id)`` was; a 10 TB upload
    would have serialized through one task).
    """
    lines = spark.read.text(path).select(
        F.col("value").alias("raw_line"),
        F.col("_metadata.file_path").alias("_file"),
        F.spark_partition_id().alias("_split"),
        F.monotonically_increasing_id().bitwiseAND(F.lit(_MID_RECORD_MASK)).alias("_local"),
    )
    counts = lines.groupBy("_file", "_split").agg(F.count(F.lit(1)).alias("_n"))
    w = (
        Window.partitionBy("_file")
        .orderBy("_split")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_file", "_split", F.coalesce(F.sum("_n").over(w), F.lit(0)).alias("_start")
    )
    numbered = (
        lines.join(F.broadcast(offsets), ["_file", "_split"])
        .withColumn("task_number", F.col("_start") + F.col("_local") + 1)
        .drop("_file", "_split", "_local", "_start")
    )
    return parse_task_lines(numbered, batch_id=batch_id)


def parse_task_lines(df: DataFrame, batch_id: int = 1, line_col: str = "raw_line") -> DataFrame:
    """Split raw task lines into typed fields.

    Only the first three comma-separated fields are addressed (``F.get``
    returns NULL past the end for short lines); any trailing
    property/group segments remain visible in ``raw_line``. Matches
    ProcessBatch.groovy's ``task.split(/,/)`` destructuring.
    """
    parts = F.split(F.col(line_col), ",")
    return df.select(
        F.lit(batch_id).cast("long").alias("batch_id"),
        F.col("task_number").cast("long").alias("task_number"),
        F.col(line_col).alias("raw_line"),
        F.get(parts, 0).alias("model_name"),
        F.get(parts, 1).alias("serial_number"),
        F.get(parts, 2).alias("asset_name"),
    )
