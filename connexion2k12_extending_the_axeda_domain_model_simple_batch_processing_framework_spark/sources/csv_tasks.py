"""CSV task-file source.

Parity: CreateBatch.groovy request contract — an uploaded CSV where each line
is ``ModelName,SerialNumber,AssetName[,Properties,AssetGroup]``. The
reference streams the file line-by-line through a ``LineNumberReader``
(AnalyzeBatch.groovy:101-107); here a task file of any size is a distributed
``spark.read.text`` scan, and line numbering is a window over a monotonic
file order — at 100 TB you'd carry an explicit line_number column from the
producer, so the window is only the compatibility path for raw uploads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_task_file(spark: SparkSession, path: str, batch_id: int = 1) -> DataFrame:
    """Read a raw CSV task upload into the TASK_SCHEMA shape.

    Line numbers are 1-based like the reference's LineNumberReader loop
    (AnalyzeBatch.groovy ``tasks.eachLine { task, lineNumber -> ... }``).
    """
    lines = spark.read.text(path).select(F.col("value").alias("raw_line"))
    w = Window.orderBy(F.monotonically_increasing_id())
    numbered = lines.withColumn("task_number", F.row_number().over(w))
    return parse_task_lines(numbered, batch_id=batch_id)


def parse_task_lines(df: DataFrame, batch_id: int = 1, line_col: str = "raw_line") -> DataFrame:
    """Split raw task lines into typed fields.

    ``split`` with a limit keeps any trailing property/group segments intact
    in the raw line while extracting the three addressed fields, matching
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
