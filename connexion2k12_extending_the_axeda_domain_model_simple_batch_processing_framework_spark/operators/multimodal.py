"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so the (C-library) codec work happens vectorized per batch,
never per-row over Py4J. The actual codecs aren't available in this
container, so ``decode_stub`` is a clearly-marked deterministic fake — the
Spark-side contract (schema, batching, partition preservation) is real and
tested; swap ``_fake_decode`` for PIL/libav calls in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, byte_len long, n_frames long, format string"
)

FRAME_BYTES = 1024  # fake codec: one "frame" per KiB of payload


def with_binary_payload(documents: DataFrame) -> DataFrame:
    """Attach a binary payload column (utf-8 bytes of the text stand in for
    a real media blob) plus a metadata struct — the multimodal table shape."""
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("fake/v1").alias("codec"),
            F.col("source").alias("origin"),
        ).alias("media_meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for a media decoder.

    A real implementation would be, e.g.::

        img = PIL.Image.open(io.BytesIO(payload))   # not in this container

    and would raise NotImplementedError if the codec is unsupported.
    """
    byte_len = len(payload)
    n_frames = byte_len // FRAME_BYTES + 1
    return byte_len, n_frames, "fake/v1"


def decode_stub(media: DataFrame) -> DataFrame:
    """Vectorized 'decode' over the payload column via mapInPandas.

    Arrow moves each partition to Python in columnar batches; the iterator
    contract keeps memory bounded (one batch in flight). Partitioning is
    preserved — no shuffle — so this pipelines between scan and downstream
    filters at 100 TB.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": decoded.map(lambda d: d[0]),
                    "n_frames": decoded.map(lambda d: d[1]),
                    "format": decoded.map(lambda d: d[2]),
                }
            )

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)
