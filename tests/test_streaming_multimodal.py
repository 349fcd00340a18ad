"""Multimodal decode under Structured Streaming: the Arrow mapInPandas
contract (decode_image / decode_audio) is partition-local with no
shuffle, so the same operators run unchanged inside a streaming
pipeline — the ingest shape for a multimodal corpus at 100 TB (decode
at the edge of the stream, never a batch re-scan). A drained stream
must equal the batch decode bit-for-bit."""

from __future__ import annotations

import json

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
    multimodal as mm,
)

DOCS = [
    {"doc_id": 1, "text": "alpha beta"},
    {"doc_id": 2, "text": ""},
    {"doc_id": 3, "text": "gamma delta epsilon"},
    {"doc_id": 4, "text": "zeta"},
]


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _drain_stream(spark, tmp_path, name, transform):
    src = tmp_path / f"src_{name}"
    src.mkdir()
    _write(src / "b0.json", DOCS[:2])
    _write(src / "b1.json", DOCS[2:])
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(f"mm_{name}")
        .option(
            "checkpointLocation", str(tmp_path / f"ckpt_{name}")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM mm_{name}")


def test_streaming_image_decode_equals_batch(spark, tmp_path):
    got = _drain_stream(
        spark, tmp_path, "img",
        lambda s: mm.decode_image(mm.with_ppm_payload(s)),
    )
    batch = mm.decode_image(
        mm.with_ppm_payload(
            spark.createDataFrame(
                [(d["doc_id"], d["text"]) for d in DOCS],
                "doc_id long, text string",
            )
        )
    )
    key = lambda df: {
        r.doc_id: (r.width, r.height, r.mean_r, r.mean_g, r.mean_b, r.err)
        for r in df.collect()
    }
    assert key(got) == key(batch)


def test_streaming_audio_decode_equals_batch(spark, tmp_path):
    got = _drain_stream(
        spark, tmp_path, "aud",
        lambda s: mm.decode_audio(mm.with_wav_payload(s)),
    )
    batch = mm.decode_audio(
        mm.with_wav_payload(
            spark.createDataFrame(
                [(d["doc_id"], d["text"]) for d in DOCS],
                "doc_id long, text string",
            )
        )
    )
    key = lambda df: {
        r.doc_id: (r.n_channels, r.n_frames, r.rms_l, r.rms_r, r.err)
        for r in df.collect()
    }
    assert key(got) == key(batch)
