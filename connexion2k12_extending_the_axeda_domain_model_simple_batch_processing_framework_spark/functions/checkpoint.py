"""Lineage-cutting for iterative DataFrame algorithms.

Iterative operators (connected components, k-means) double their plan depth
every round unless the lineage is cut. ``localCheckpoint`` is the fast
default, but its blocks live on executors — on a real cluster a lost
executor invalidates them mid-iteration and fails the job. When the caller
has configured a reliable checkpoint dir (``sc.setCheckpointDir``), use the
durable ``checkpoint()`` path instead; HDFS/object-store blocks survive
executor loss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and truncate its lineage.

    Uses reliable ``checkpoint()`` when the SparkContext has a checkpoint
    dir configured, else ``localCheckpoint`` (single-process local runs,
    where executor loss means the whole app is gone anyway).
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
