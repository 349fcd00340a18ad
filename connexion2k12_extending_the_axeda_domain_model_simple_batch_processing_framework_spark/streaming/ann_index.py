"""Streaming maintenance of a persisted IVF ANN index.

The batch side builds and persists the index once (``similarity.ivf_build``
→ ``ivf_save``: tiny centroid table + inverted file partitioned by
centroid_id). Under a live ingest pipeline the index goes stale as new
vectors land; retraining per batch is wasteful (the coarse quantizer is
trained on a sample and drifts slowly — faiss's train-once/add-many
design). This module wires ``similarity.ivf_add``'s assignment step into a
Structured Streaming ``foreachBatch`` sink: each micro-batch assigns ONLY
the arriving vectors against the frozen centroids (one Arrow pass over the
batch — nothing touches the stored corpus) and appends them to the
inverted file, preserving the partitioned-by-centroid layout so probes
stay partition-pruned.

Delivery semantics: the checkpoint gives at-least-once ``foreachBatch``
invocations — a crash between the parquet append and the checkpoint
commit can replay one micro-batch, duplicating its vectors in the
inverted file (duplicate neighbor rows in probes, ranks unchanged for
distinct ids). Production hardening is the standard idempotent-sink
pattern: write each micro-batch to a ``batch_id``-keyed subdirectory (or
a transactional table format) so replays overwrite instead of append.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import similarity


def ivf_stream_writer(
    vectors: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """A configured ``writeStream`` (foreachBatch) that keeps the persisted
    IVF index at ``index_path`` fresh under a vector ingest stream; the
    caller picks the trigger and calls ``.start()``.

    Per micro-batch: load the frozen centroid table (nlist rows), assign
    the batch with the same sequential-fold Arrow pass the batch path uses
    (``similarity._assign`` — bit-identical to ``ivf_add``), and append
    the new rows to the inverted file's centroid_id partitions. Probe
    results over the maintained index equal the batch ``ivf_add`` result
    for the same vectors (asserted in tests).
    """

    def _append_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        spark = batch_df.sparkSession
        centroids = spark.read.parquet(f"{index_path}/centroids")
        batch = batch_df.select(
            F.col(id_col).alias("vid"), F.col(vec_col).alias("cv")
        )
        similarity._assign(batch, centroids).write.mode("append").partitionBy(
            "centroid_id"
        ).parquet(f"{index_path}/assignments")

    return (
        vectors.writeStream.foreachBatch(_append_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
