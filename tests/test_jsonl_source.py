"""JSONL document source: schema parse, reject routing, round-trip; and the
compaction sink's file sizing."""

from __future__ import annotations

import json

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.sources import (
    jsonl,
    sinks,
)


def _write_lines(path, lines):
    with open(path, "w") as f:
        for line in lines:
            f.write(line + "\n")


def test_jsonl_parses_and_routes_rejects(spark, tmp_path):
    src = tmp_path / "corpus"
    src.mkdir()
    good = {"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11}
    _write_lines(
        src / "a.jsonl",
        [
            json.dumps(good),
            '{"doc_id": 2, "text": "second doc"}',  # missing optional fields: ok
            "{not json at all",  # malformed → reject
            '{"doc_id": 3}',  # no text → reject
            '{"text": "no id"}',  # no doc_id → reject
            '{"doc_id": "abc", "text": "bad id type"}',  # uncastable id → reject
        ],
    )
    docs, rejects = jsonl.read_jsonl_documents(spark, str(src))
    got = {r.doc_id: r for r in docs.collect()}
    assert set(got) == {1, 2}
    assert got[1].lang == "en" and got[1].n_chars == 11
    assert got[2].text == "second doc" and got[2].lang is None

    bad = rejects.collect()
    assert len(bad) == 4
    assert all(r.src_file.endswith("a.jsonl") for r in bad)
    assert any("not json" in r.raw_line for r in bad)


def test_jsonl_round_trip(spark, tmp_path):
    src = tmp_path / "rt"
    src.mkdir()
    _write_lines(
        src / "in.jsonl",
        [json.dumps({"doc_id": i, "text": f"doc {i}"}) for i in range(20)],
    )
    docs, rejects = jsonl.read_jsonl_documents(spark, str(src))
    assert rejects.count() == 0
    out = tmp_path / "out"
    jsonl.write_jsonl(docs, str(out))
    docs2, rejects2 = jsonl.read_jsonl_documents(spark, str(out))
    assert rejects2.count() == 0
    assert sorted(r.doc_id for r in docs2.collect()) == list(range(20))


def test_write_compacted_single_file_for_small_input(spark, tmp_path):
    df = spark.range(1000).selectExpr("id", "repeat('x', 10) AS pad")
    n = sinks.write_compacted(df, str(tmp_path / "small"), target_mb=256)
    assert n == 1
    files = [p for p in (tmp_path / "small").iterdir() if p.suffix == ".parquet"]
    assert len(files) == 1


def test_write_compacted_splits_when_over_target(spark, tmp_path):
    """Compaction sizes from SCAN stats (real file bytes) — a stored table
    bigger than the target splits into multiple balanced files."""
    import random

    rng = random.Random(7)
    staged = str(tmp_path / "staged")
    # incompressible payload so the parquet files measure > 2 MB on disk
    spark.createDataFrame(
        [(i, "".join(rng.choices("abcdefghijklmnop", k=2048))) for i in range(2000)],
        "id long, pad string",
    ).write.parquet(staged)
    df = spark.read.parquet(staged)
    n = sinks.write_compacted(df, str(tmp_path / "big"), target_mb=1)
    assert n > 1
    files = [p for p in (tmp_path / "big").iterdir() if p.suffix == ".parquet"]
    assert len(files) == n
