"""Streaming dup-cluster maintenance: drained-stream ≡ batch
connected components, retraction-free cluster merges, replay
idempotence, crash windows, and compaction."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
    dedup,
)
from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.sources.catalog import (
    load_table,
)
from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.streaming import (
    dedup_index,
)


def _clusters(df):
    return {(r.doc_id, r.cluster_id) for r in df.collect()}


def _batch_clusters(documents):
    return _clusters(dedup.dup_clusters(documents))


def _doc(doc_id, text):
    return (doc_id, text, "s", "en")


_SCHEMA = "doc_id long, text string, source string, lang string"


def test_dedup_stream_drained_equals_batch(spark, sf_dir, tmp_path):
    """The sf0.001 documents table drained through three doc_id-sliced
    micro-batches maintains exactly the batch dup_clusters table."""
    docs = load_table(spark, sf_dir, "documents")
    slices = [
        docs.filter(F.col("doc_id") % 3 == i).select("doc_id", "text")
        for i in range(3)
    ]
    tbl = str(tmp_path / "dd")
    for i, sl in enumerate(slices):
        assert dedup_index.dedup_apply_batch(sl, i, tbl)
    got = _clusters(dedup_index.read_dup_clusters(spark, tbl))
    want = _batch_clusters(docs)
    assert got == want
    # canonical id set matches keep_canonical's
    keep = {
        r.doc_id for r in dedup.keep_canonical(docs).select("doc_id").collect()
    }
    assert {
        r.doc_id
        for r in dedup_index.read_canonical_ids(spark, tbl).collect()
    } == keep


def test_dedup_cross_batch_cluster_merge_is_retraction_free(spark, tmp_path):
    """A bridge doc arriving later merges two existing clusters: the read
    resolves every member to the global minimum WITHOUT rewriting the
    earlier batches' rows (the merge lives as an edge)."""
    # T and U share no LSH band; W (one word from each) bridges both —
    # verified deterministic under the md5-seeded minhash family
    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    u = "oak beta gamma delta epsilon elm eta theta iota kappa"
    w = "alpha beta gamma delta epsilon elm eta theta iota kappa"
    b0 = spark.createDataFrame(
        [_doc(1, t), _doc(2, t), _doc(10, u), _doc(11, u)], _SCHEMA
    )
    tbl = str(tmp_path / "dd")
    assert dedup_index.dedup_apply_batch(b0.select("doc_id", "text"), 0, tbl)
    assert _clusters(dedup_index.read_dup_clusters(spark, tbl)) == {
        (1, 1), (2, 1), (10, 10), (11, 10),
    }
    docs_v0 = spark.read.parquet(f"{tbl}/docs/v=0").collect()

    # bridge: doc 5 duplicates BOTH texts' shingle space via concatenation
    b1 = spark.createDataFrame([_doc(5, w)], _SCHEMA)
    assert dedup_index.dedup_apply_batch(b1.select("doc_id", "text"), 1, tbl)
    assert _clusters(dedup_index.read_dup_clusters(spark, tbl)) == {
        (1, 1), (2, 1), (5, 1), (10, 1), (11, 1),
    }
    # batch 0's rows are bit-identical — the merge is an edge, not a rewrite
    assert spark.read.parquet(f"{tbl}/docs/v=0").collect() == docs_v0
    merges = spark.read.parquet(f"{tbl}/merges/v=1").collect()
    assert {(r.label_a, r.label_b) for r in merges} == {(1, 10)}
    # matches the batch operator over the full corpus
    assert _clusters(dedup_index.read_dup_clusters(spark, tbl)) == (
        _batch_clusters(b0.unionByName(b1))
    )


def test_dedup_replay_is_idempotent_and_epoch_guarded(spark, tmp_path):
    t = "alpha beta gamma delta epsilon zeta"
    b0 = spark.createDataFrame([_doc(1, t), _doc(2, t)], _SCHEMA).select(
        "doc_id", "text"
    )
    b1 = spark.createDataFrame([_doc(3, t)], _SCHEMA).select("doc_id", "text")
    tbl = str(tmp_path / "dd")
    assert dedup_index.dedup_apply_batch(b0, 0, tbl)
    assert dedup_index.dedup_apply_batch(b1, 1, tbl)
    once = _clusters(dedup_index.read_dup_clusters(spark, tbl))
    # completed-batch replay: acknowledged, skipped
    assert dedup_index.dedup_apply_batch(b1, 1, tbl) is False
    assert _clusters(dedup_index.read_dup_clusters(spark, tbl)) == once
    with pytest.raises(ValueError, match="high water"):
        dedup_index.dedup_apply_batch(b0, 0, tbl)
    # re-arrived doc_ids inside an accepted batch are ignored
    b2 = spark.createDataFrame([_doc(3, t), _doc(4, t)], _SCHEMA).select(
        "doc_id", "text"
    )
    assert dedup_index.dedup_apply_batch(b2, 2, tbl)
    assert _clusters(dedup_index.read_dup_clusters(spark, tbl)) == {
        (1, 1), (2, 1), (3, 1), (4, 1),
    }


def test_dedup_apply_crash_window_reads_consistently(spark, tmp_path):
    """Crash between the buckets/merges writes and the docs write (the
    commit marker): the torn batch is invisible — reads equal the
    pre-batch table — and the replay converges."""
    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    u = "oak beta gamma delta epsilon elm eta theta iota kappa"  # verified band-disjoint from t
    b0 = spark.createDataFrame(
        [_doc(1, t), _doc(2, t), _doc(10, u)], _SCHEMA
    ).select("doc_id", "text")
    b1 = spark.createDataFrame([_doc(11, u)], _SCHEMA).select("doc_id", "text")
    tbl = str(tmp_path / "dd")
    assert dedup_index.dedup_apply_batch(b0, 0, tbl)
    rep0 = _clusters(dedup_index.read_dup_clusters(spark, tbl))
    assert dedup_index.dedup_apply_batch(b1, 1, tbl)
    want = _clusters(dedup_index.read_dup_clusters(spark, tbl))
    # simulate the crash: docs/v=1 (written last) lost, meta rewound
    shutil.rmtree(os.path.join(tbl, "docs", "v=1"))
    dedup_index._write_meta(tbl, {"high_water": 0, "compacted_through": -1})
    assert _clusters(dedup_index.read_dup_clusters(spark, tbl)) == rep0
    # replay rewrites every dir and converges
    assert dedup_index.dedup_apply_batch(b1, 1, tbl)
    assert _clusters(dedup_index.read_dup_clusters(spark, tbl)) == want


def test_dedup_compact_preserves_clusters_and_crash_windows(spark, tmp_path):
    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    u = "oak beta gamma delta epsilon elm eta theta iota kappa"
    w = "alpha beta gamma delta epsilon elm eta theta iota kappa"  # verified: shares a band with BOTH t and u
    tbl = str(tmp_path / "dd")
    batches = [
        [(1, t), (2, t)],
        [(10, u), (11, u)],
        [(5, w)],  # bridge merges the two clusters
    ]
    full = []
    for i, rows in enumerate(batches):
        full += rows
        df = spark.createDataFrame(
            [_doc(d, x) for d, x in rows], _SCHEMA
        ).select("doc_id", "text")
        assert dedup_index.dedup_apply_batch(df, i, tbl)
    want = _clusters(dedup_index.read_dup_clusters(spark, tbl))
    assert want == {(1, 1), (2, 1), (5, 1), (10, 1), (11, 1)}

    dedup_index.dedup_compact(spark, tbl)
    assert _clusters(dedup_index.read_dup_clusters(spark, tbl)) == want
    # deltas folded, merge edges applied-and-pruned, labels path-compressed
    assert dedup_index._versions(tbl, "docs") == []
    assert dedup_index._versions(tbl, "merges") == []
    assert dedup_index._versions(tbl, "docs_base") == [2]
    base = spark.read.parquet(f"{tbl}/docs_base/v=2")
    assert {(r.doc_id, r.label) for r in base.collect()} == {
        (1, 1), (2, 1), (5, 1), (10, 1), (11, 1),
    }

    # stale-meta crash window: bases committed, meta rewound — per-table
    # base floors keep folded deltas from double-reading, and re-applying
    # a retained merge edge to compacted labels is a no-op
    dedup_index._write_meta(tbl, {"high_water": 2, "compacted_through": -1})
    assert _clusters(dedup_index.read_dup_clusters(spark, tbl)) == want
    dedup_index.dedup_compact(spark, tbl)
    assert dedup_index._read_meta(tbl)["compacted_through"] == 2
    assert _clusters(dedup_index.read_dup_clusters(spark, tbl)) == want

    # a torn (uncommitted) base is invisible
    torn = os.path.join(tbl, "docs_base", "v=9")
    os.makedirs(os.path.join(torn, "_temporary"))
    assert dedup_index._base_version(tbl, "docs") == 2
    assert _clusters(dedup_index.read_dup_clusters(spark, tbl)) == want

    # growth continues on top of the compacted base
    df = spark.createDataFrame([_doc(0, u)], _SCHEMA).select("doc_id", "text")
    assert dedup_index.dedup_apply_batch(df, 3, tbl)
    assert _clusters(dedup_index.read_dup_clusters(spark, tbl)) == {
        (0, 0), (1, 0), (2, 0), (5, 0), (10, 0), (11, 0),
    }
    full.append((0, u))
    docs_df = spark.createDataFrame([_doc(d, x) for d, x in full], _SCHEMA)
    assert _clusters(dedup_index.read_dup_clusters(spark, tbl)) == (
        _batch_clusters(docs_df)
    )


def test_dedup_compact_never_folds_an_unacknowledged_batch(spark, tmp_path):
    """Compaction folds only meta-acknowledged versions: a committed
    docs/v=b whose meta write crashed stays a delta, so its replay's
    overwrite cannot double against a base."""
    t = "alpha beta gamma delta epsilon zeta"
    b0 = spark.createDataFrame([_doc(1, t), _doc(2, t)], _SCHEMA).select(
        "doc_id", "text"
    )
    b1 = spark.createDataFrame([_doc(3, t)], _SCHEMA).select("doc_id", "text")
    tbl = str(tmp_path / "dd")
    assert dedup_index.dedup_apply_batch(b0, 0, tbl)
    assert dedup_index.dedup_apply_batch(b1, 1, tbl)
    want = _clusters(dedup_index.read_dup_clusters(spark, tbl))
    dedup_index._write_meta(tbl, {"high_water": 0, "compacted_through": -1})

    dedup_index.dedup_compact(spark, tbl)
    assert dedup_index._versions(tbl, "docs_base") == [0]
    assert dedup_index._versions(tbl, "docs") == [1]  # pending, not folded
    assert _clusters(dedup_index.read_dup_clusters(spark, tbl)) == want

    assert dedup_index.dedup_apply_batch(b1, 1, tbl)  # replay
    assert _clusters(dedup_index.read_dup_clusters(spark, tbl)) == want
    dedup_index.dedup_compact(spark, tbl)
    assert dedup_index._versions(tbl, "docs") == []
    assert _clusters(dedup_index.read_dup_clusters(spark, tbl)) == want


def test_dedup_stream_writer_end_to_end(spark, sf_dir, tmp_path):
    """Drained ≡ batch through the real foreachBatch writer with
    mid-stream compaction (file-source micro-batches, availableNow)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 2 == 0
    )
    rows = [
        {"doc_id": r.doc_id, "text": r.text}
        for r in docs.select("doc_id", "text").collect()
    ]
    src = tmp_path / "docsrc"
    src.mkdir()
    third = max(1, len(rows) // 3)
    for i in range(3):
        chunk = rows[i * third :] if i == 2 else rows[i * third : (i + 1) * third]
        with open(src / f"b{i}.json", "w") as f:
            for r in chunk:
                f.write(json.dumps(r) + "\n")
        # pin strictly increasing mtimes: the file source orders
        # micro-batches by modification time
        os.utime(src / f"b{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    tbl = str(tmp_path / "dd_w")
    q = (
        dedup_index.dedup_stream_writer(
            stream, tbl, str(tmp_path / "ckpt"), compact_every=2
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = _clusters(dedup_index.read_dup_clusters(spark, tbl))
    assert got == _batch_clusters(docs)


def test_dedup_replay_uncommits_stale_docs_before_merge_rewrite(
    spark, tmp_path, monkeypatch
):
    """The r9-advice recovery window: the first attempt at a merge-bearing
    batch committed docs/v=1 but crashed before meta; if the REPLAY then
    crashes mid-merges-rewrite, a concurrent reader must still see the
    table as if the batch never ran — never batch-1 docs resolved against
    torn (pre-merge) edges. The apply un-commits the stale docs dir up
    front, and version visibility keys on the docs marker, so the whole
    version vanishes for the entire replay window."""
    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    u = "oak beta gamma delta epsilon elm eta theta iota kappa"
    w = "alpha beta gamma delta epsilon elm eta theta iota kappa"  # bridge
    b0 = spark.createDataFrame(
        [_doc(1, t), _doc(2, t), _doc(10, u), _doc(11, u)], _SCHEMA
    ).select("doc_id", "text")
    b1 = spark.createDataFrame([_doc(5, w)], _SCHEMA).select("doc_id", "text")
    tbl = str(tmp_path / "dd")
    assert dedup_index.dedup_apply_batch(b0, 0, tbl)
    rep0 = _clusters(dedup_index.read_dup_clusters(spark, tbl))
    assert dedup_index.dedup_apply_batch(b1, 1, tbl)  # merges (1,10)
    want = _clusters(dedup_index.read_dup_clusters(spark, tbl))
    assert want == {(1, 1), (2, 1), (5, 1), (10, 1), (11, 1)}

    # crash 1: meta write lost AFTER docs/v=1 committed
    dedup_index._write_meta(tbl, {"high_water": 0, "compacted_through": -1})
    # crash 2: the replay dies exactly at the merges/v=1 rewrite
    from pyspark.sql.readwriter import DataFrameWriter

    orig = DataFrameWriter.parquet

    def crashing(self, path, *a, **kw):
        if path.endswith("merges/v=1"):
            raise RuntimeError("simulated crash mid-merges rewrite")
        return orig(self, path, *a, **kw)

    monkeypatch.setattr(DataFrameWriter, "parquet", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        dedup_index.dedup_apply_batch(b1, 1, tbl)
    monkeypatch.setattr(DataFrameWriter, "parquet", orig)

    # the stale docs commit marker is gone: reads == the pre-batch table
    # (pre-fix, this window served doc 5 labeled 1 while 10/11 still
    # resolved to cluster 10 — the torn pre-merge view)
    assert not os.path.isfile(os.path.join(tbl, "docs", "v=1", "_SUCCESS"))
    assert _clusters(dedup_index.read_dup_clusters(spark, tbl)) == rep0
    # and the next clean replay converges
    assert dedup_index.dedup_apply_batch(b1, 1, tbl)
    assert _clusters(dedup_index.read_dup_clusters(spark, tbl)) == want
