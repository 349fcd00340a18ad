"""Streaming per-domain admission cap: keyed-state budget across batches."""

from __future__ import annotations

import json
import os

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.streaming import (
    ratelimit,
)

SCHEMA = "doc_id long, url string"


def _write(path, rows, mtime):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.utime(path, (mtime, mtime))


def _run(spark, src, tmp_path, name, cap):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        ratelimit.domain_cap_stream(stream, cap=cap)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_domain_budget_spans_micro_batches(spark, tmp_path):
    """cap=3 for example.com: 2 docs admitted in batch 1 leave ONE slot —
    batch 2's lowest doc_id takes it, the rest are rejected. A second
    domain keeps its own budget, and subdomains share one. Batch order is
    pinned by file modification times (the file source's availableNow
    ordering) with maxFilesPerTrigger=1; crossing the budget between
    batches proves the admitted count survives the state store."""
    src = tmp_path / "docs"
    src.mkdir()
    _write(src / "b0.json", [
        {"doc_id": 1, "url": "https://www.example.com/a"},
        {"doc_id": 2, "url": "https://cdn.example.com/b"},
        {"doc_id": 10, "url": "https://solo.other.org/x"},
    ], mtime=1_600_000_000)
    _write(src / "b1.json", [
        {"doc_id": 3, "url": "https://blog.example.com/c"},
        {"doc_id": 4, "url": "https://www.example.com/d"},
        {"doc_id": 5, "url": "https://www.example.com/e"},
        {"doc_id": 11, "url": "https://solo.other.org/y"},
    ], mtime=1_600_000_600)
    out = _run(spark, src, tmp_path, "ratelim1", cap=3)
    ex = {r.doc_id: r for r in out if r.domain == "example.com"}
    assert {d for d, r in ex.items() if r.admitted} == {1, 2, 3}
    assert {d for d, r in ex.items() if not r.admitted} == {4, 5}
    assert [ex[d].admit_seq for d in sorted(ex)] == [1, 2, 3, 4, 5]
    other = {r.doc_id: r for r in out if r.domain == "other.org"}
    assert all(r.admitted for r in other.values()) and len(other) == 2
