"""Streamed PQ maintenance: the compressed half of the IVFPQ artifact
stays fresh under a vector ingest stream — drained codes ≡ batch encode,
maintained two-stage probe ≡ batch probe, replay/epoch/crash windows,
and compaction."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
    similarity,
)
from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.sources.catalog import (
    load_table,
)
from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.streaming import (
    ann_index,
)


def _mini_ivfpq(spark, sf_dir, tmp_path):
    """Base index + frozen PQ artifacts trained/encoded on vec_id < 400;
    vec_id >= 400 arrives by stream."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 400)
    cent, base_assign = similarity.ivf_build(base, nlist=8, iters=2)
    idx = str(tmp_path / "idx")
    similarity.ivf_save(cent, base_assign, idx)
    books = similarity.pq_train_residual(base, cent)
    base_codes = similarity.pq_encode_residual(base_assign, cent, books)
    pq = str(tmp_path / "pq")
    similarity.pq_save(books, base_codes, pq)
    new_df = emb.filter(F.col("vec_id") >= 400)
    return emb, cent, base_assign, books, new_df, idx, pq


def _code_set(df):
    return {
        (r.vec_id, r.centroid_id, tuple(r.codes)) for r in df.collect()
    }


def _batch_codes(cent, base_assign, books, new_df):
    combined = similarity.ivf_add(cent, base_assign, new_df)
    return similarity.pq_encode_residual(combined, cent, books), combined


def test_streamed_codes_equal_batch_encode(spark, sf_dir, tmp_path):
    """Drained stream ≡ batch: the resolved codes table after streaming
    the new vectors equals one pq_encode_residual over the batch-extended
    inverted file (codebooks frozen — the faiss add-many contract)."""
    emb, cent, base_assign, books, new_df, idx, pq = _mini_ivfpq(
        spark, sf_dir, tmp_path
    )
    b0 = new_df.filter(F.col("vec_id") % 2 == 0)
    b1 = new_df.filter(F.col("vec_id") % 2 == 1)
    assert ann_index.ivf_pq_append_batch(b0, 0, idx, pq)
    assert ann_index.ivf_pq_append_batch(b1, 1, idx, pq)
    want, _ = _batch_codes(cent, base_assign, books, new_df)
    assert _code_set(ann_index.read_pq_codes(spark, pq)) == _code_set(want)


def test_maintained_refine_probe_equals_batch(spark, sf_dir, tmp_path):
    """The deployable two-stage compressed probe over the LIVE artifacts
    (maintained inverted file + maintained codes) is row-identical to the
    same probe over batch-built artifacts for the same vectors."""
    emb, cent, base_assign, books, new_df, idx, pq = _mini_ivfpq(
        spark, sf_dir, tmp_path
    )
    assert ann_index.ivf_pq_append_batch(new_df, 0, idx, pq)
    queries = emb.filter(F.col("vec_id") % 100 == 1)

    got = ann_index.ivf_pq_probe_maintained(
        spark, idx, pq, queries, k=5, refine=2
    ).collect()
    codes, combined = _batch_codes(cent, base_assign, books, new_df)
    corpus = combined.select(
        F.col("vid").alias("vec_id"), F.col("cv").alias("embedding")
    )
    want = similarity.ivf_pq_refine_probe(
        cent, combined, codes, books, corpus, queries, k=5, refine=2
    ).collect()
    key = lambda r: (r.query_id, r.rk)  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)
    # the compressed path sees the streamed vectors (freshness)
    assert any(r.neighbor_id >= 400 for r in got)


def test_pq_append_replay_idempotent_and_epoch_guarded(
    spark, sf_dir, tmp_path
):
    emb, cent, base_assign, books, new_df, idx, pq = _mini_ivfpq(
        spark, sf_dir, tmp_path
    )
    b0 = new_df.filter(F.col("vec_id") % 2 == 0)
    b1 = new_df.filter(F.col("vec_id") % 2 == 1)
    assert ann_index.ivf_pq_append_batch(b0, 0, idx, pq)
    assert ann_index.ivf_pq_append_batch(b1, 1, idx, pq)
    once = _code_set(ann_index.read_pq_codes(spark, pq))
    # at-least-once replay of the newest batch: overwrite, identical bytes
    assert ann_index.ivf_pq_append_batch(b1, 1, idx, pq)
    assert _code_set(ann_index.read_pq_codes(spark, pq)) == once
    # one code row per vector — no duplicates anywhere
    codes = ann_index.read_pq_codes(spark, pq)
    assert codes.count() == codes.select("vec_id").distinct().count()
    with pytest.raises(ValueError, match="high water"):
        ann_index.ivf_pq_append_batch(b0, 0, idx, pq)


def test_codes_lag_crash_window_serves_consistent_older_view(
    spark, sf_dir, tmp_path
):
    """Crash between the float-delta write and the code-delta write: the
    new vectors are float-searchable but invisible to the compressed
    probe — an older consistent view, never a torn one. The replay
    converges both halves."""
    emb, cent, base_assign, books, new_df, idx, pq = _mini_ivfpq(
        spark, sf_dir, tmp_path
    )
    b0 = new_df.filter(F.col("vec_id") % 2 == 0)
    b1 = new_df.filter(F.col("vec_id") % 2 == 1)
    assert ann_index.ivf_pq_append_batch(b0, 0, idx, pq)
    pre = _code_set(ann_index.read_pq_codes(spark, pq))
    assert ann_index.ivf_pq_append_batch(b1, 1, idx, pq)
    want = _code_set(ann_index.read_pq_codes(spark, pq))
    # simulate: codes delta of batch 1 lost, pq meta rewound (the float
    # half committed — ivf meta stays at 1)
    shutil.rmtree(os.path.join(pq, "codes_deltas", "v=1"))
    ann_index._write_pq_meta(pq, {"high_water": 0, "compacted_through": -1})
    assert _code_set(ann_index.read_pq_codes(spark, pq)) == pre
    # float half still serves b1's vectors
    inv = ann_index.read_ivf_assignments(spark, idx)
    assert inv.filter(F.col("vid") >= 400).count() == new_df.count()
    # replay re-encodes batch 1 (the float half overwrites its own delta)
    assert ann_index.ivf_pq_append_batch(b1, 1, idx, pq)
    assert _code_set(ann_index.read_pq_codes(spark, pq)) == want


def test_pq_stream_compact_preserves_codes_and_crash_window(
    spark, sf_dir, tmp_path
):
    emb, cent, base_assign, books, new_df, idx, pq = _mini_ivfpq(
        spark, sf_dir, tmp_path
    )
    b0 = new_df.filter(F.col("vec_id") % 2 == 0)
    b1 = new_df.filter(F.col("vec_id") % 2 == 1)
    assert ann_index.ivf_pq_append_batch(b0, 0, idx, pq)
    assert ann_index.ivf_pq_append_batch(b1, 1, idx, pq)
    want = _code_set(ann_index.read_pq_codes(spark, pq))

    ann_index.pq_stream_compact(spark, pq)
    assert _code_set(ann_index.read_pq_codes(spark, pq)) == want
    assert ann_index._pq_delta_versions(pq) == []
    assert ann_index._pq_base_generations(pq) == [1]

    # stale-meta crash window: base committed, meta rewound — the
    # base-derived floor keeps folded deltas from double-resolving
    ann_index._write_pq_meta(pq, {"high_water": 1, "compacted_through": -1})
    assert _code_set(ann_index.read_pq_codes(spark, pq)) == want
    ann_index.pq_stream_compact(spark, pq)
    assert ann_index._read_pq_meta(pq)["compacted_through"] == 1
    assert _code_set(ann_index.read_pq_codes(spark, pq)) == want

    # a torn (uncommitted) base generation is invisible
    torn = os.path.join(pq, "codes_base=9")
    os.makedirs(os.path.join(torn, "_temporary"))
    assert ann_index._pq_base_generations(pq) == [1]
    assert _code_set(ann_index.read_pq_codes(spark, pq)) == want


def test_ivfpq_stream_writer_end_to_end(spark, sf_dir, tmp_path):
    """Both halves maintained through the real foreachBatch writer with
    mid-stream compaction (parquet file source preserves the float
    embedding type, availableNow)."""
    emb, cent, base_assign, books, new_df, idx, pq = _mini_ivfpq(
        spark, sf_dir, tmp_path
    )
    src = tmp_path / "vecsrc"
    src.mkdir()
    slices = [
        new_df.filter(F.col("vec_id") % 3 == i).select("vec_id", "embedding")
        for i in range(3)
    ]
    for i, sl in enumerate(slices):
        d = str(src / f"b{i}")
        sl.coalesce(1).write.mode("overwrite").parquet(d)
        files = [n for n in os.listdir(d) if n.endswith(".parquet")]
        # one data file per slice, strictly increasing mtimes (the file
        # source orders micro-batches by modification time)
        assert len(files) == 1
        os.utime(
            os.path.join(d, files[0]), (1_700_000_000 + i, 1_700_000_000 + i)
        )
        os.replace(
            os.path.join(d, files[0]), str(src / f"slice{i}.parquet")
        )
        shutil.rmtree(d)
        os.utime(
            str(src / f"slice{i}.parquet"),
            (1_700_000_000 + i, 1_700_000_000 + i),
        )
    schema = new_df.select("vec_id", "embedding").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        ann_index.ivf_pq_stream_writer(
            stream, idx, pq, str(tmp_path / "ckpt"), compact_every=2
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    want, _ = _batch_codes(cent, base_assign, books, new_df)
    assert _code_set(ann_index.read_pq_codes(spark, pq)) == _code_set(want)


def test_pq_compact_idle_stream_reclaims_folded_deltas(
    spark, sf_dir, tmp_path
):
    """Crash between the base write and the meta write, then NO further
    ingest: the next compact's no-live branch must still prune the folded
    delta dirs (reads were already floor-based — this is pure garbage
    collection an idle stream would otherwise never perform)."""
    emb, cent, base_assign, books, new_df, idx, pq = _mini_ivfpq(
        spark, sf_dir, tmp_path
    )
    b0 = new_df.filter(F.col("vec_id") % 2 == 0)
    b1 = new_df.filter(F.col("vec_id") % 2 == 1)
    assert ann_index.ivf_pq_append_batch(b0, 0, idx, pq)
    assert ann_index.ivf_pq_append_batch(b1, 1, idx, pq)
    want = _code_set(ann_index.read_pq_codes(spark, pq))

    # simulate the crash state by hand: base=1 committed, meta stale,
    # folded deltas v=0/v=1 still on disk
    ann_index.read_pq_codes(spark, pq).write.mode("overwrite").partitionBy(
        "centroid_id"
    ).parquet(f"{pq}/codes_base=1")
    assert ann_index._pq_delta_versions(pq) == [0, 1]
    assert _code_set(ann_index.read_pq_codes(spark, pq)) == want

    ann_index.pq_stream_compact(spark, pq)  # no live deltas
    assert ann_index._read_pq_meta(pq)["compacted_through"] == 1
    assert ann_index._pq_delta_versions(pq) == []  # reclaimed
    assert _code_set(ann_index.read_pq_codes(spark, pq)) == want


def test_read_probe_results_pre_meta_sink_stays_readable(
    spark, sf_dir, tmp_path
):
    """Migration fallback: a probe sink written before the r9 meta
    protocol has committed v= dirs and no _probe_meta.json — every
    committed dir is served until the first post-upgrade batch writes the
    meta and the high-water rule takes over. A PRESENT meta at -1 (crash
    before the first ack) still hides everything."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 400)
    cent, base_assign = similarity.ivf_build(base, nlist=8, iters=2)
    idx = str(tmp_path / "idx")
    similarity.ivf_save(cent, base_assign, idx)
    queries = emb.filter(F.col("vec_id") % 100 == 1)
    out = str(tmp_path / "probe_out")
    assert ann_index.ivf_probe_batch(queries, 0, idx, out, k=5)
    want = sorted(
        ann_index.read_probe_results(spark, out).collect(),
        key=lambda r: (r.query_id, r.rk),
    )
    # pre-meta sink: delete the meta file → still readable, same rows
    os.remove(os.path.join(out, ann_index._PROBE_META))
    got = sorted(
        ann_index.read_probe_results(spark, out).collect(),
        key=lambda r: (r.query_id, r.rk),
    )
    assert got == want
    # present-but-unacknowledging meta keeps hiding committed dirs
    ann_index._write_probe_meta(out, {"high_water": -1})
    with pytest.raises(FileNotFoundError):
        ann_index.read_probe_results(spark, out)
