"""Sinks (anchor store, reports, notifications) and skew helpers."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.functions import (
    skew,
)
from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.sources import (
    sinks,
)


def test_anchor_store_partitioned_by_state(spark, tmp_path):
    anchors = spark.createDataFrame(
        [
            (1, "b1", "NOT_STARTED"),
            (2, "b2", "IN_PROCESS"),
            (3, "b3", "SUCCESS"),
            (4, "b4", "SUCCESS"),
        ],
        "batch_id long, name string, state string",
    )
    path = str(tmp_path / "anchors")
    sinks.write_anchor_store(anchors, path)
    # physical layout: one directory per state (partition pruning surface)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("state="))
    assert dirs == ["state=IN_PROCESS", "state=NOT_STARTED", "state=SUCCESS"]
    back = sinks.read_anchor_store(spark, path)
    assert back.count() == 4
    # a state-filtered read scans only that partition's files
    only = back.filter(F.col("state") == "SUCCESS")
    assert only.count() == 2
    scan = only._sc._jvm.PythonSQLUtils.explainString(only._jdf.queryExecution(), "formatted")
    assert "PartitionFilters" in scan


def test_batch_report_csv_roundtrip(spark, tmp_path):
    report = spark.createDataFrame(
        [(1, "SUCCESS", 10), (2, "IN_PROCESS", 4)],
        "batch_id long, state string, size long",
    )
    path = str(tmp_path / "report")
    sinks.write_batch_report_csv(report, path)
    back = spark.read.option("header", "true").csv(path)
    assert back.count() == 2
    assert set(back.columns) == {"batch_id", "state", "size"}


def test_finalization_notifications_shape_and_filter(spark):
    finalized = spark.createDataFrame(
        [
            (1, "nightly", "SUCCESS", 5, 0, "ops@example.com"),
            (2, "adhoc", "COMPLETE_WITH_ERROR", 3, 2, None),
            (3, "bulk", "SUCCESS", 9, 0, ""),
        ],
        "batch_id long, name string, state string, success_count long,"
        " error_count long, notify_email string",
    )
    rows = sinks.finalization_notifications(finalized).collect()
    assert len(rows) == 1  # no-email batches dropped, like the reference
    r = rows[0]
    assert r.notify_email == "ops@example.com"
    assert r.subject == 'Batch "nightly" finished: SUCCESS'
    assert r.body == "succeeded=5 failed=0"


def test_send_email_is_an_explicit_stub(spark):
    df = spark.range(1)
    with pytest.raises(NotImplementedError):
        sinks.send_email(df)


def test_salted_join_matches_plain_join(spark):
    # one hot key (1) with many rows + normal keys
    big = spark.createDataFrame(
        [(1, i) for i in range(200)] + [(2, 900), (3, 901)],
        "k long, payload long",
    )
    small = spark.createDataFrame([(1, "hot"), (2, "a"), (4, "unmatched")], "k long, v string")
    plain = big.join(small, "k").select("k", "payload", "v")
    salted = skew.salted_join(big, small, on="k", n_salts=4, salt_source="payload").select(
        "k", "payload", "v"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_spreads_hot_key(spark):
    big = spark.createDataFrame([(1, i) for i in range(100)], "k long, payload long")
    salted = skew.with_salt(big, 4, "payload")
    n_buckets = salted.select(skew.SALT).distinct().count()
    assert n_buckets == 4  # the hot key's rows really do scatter


def test_two_phase_count_matches_group_count(spark):
    df = spark.createDataFrame(
        [(1, i) for i in range(50)] + [(2, 1), (2, 2), (3, 7)], "k long, payload long"
    )
    got = {r.k: r["count"] for r in skew.two_phase_count(df, "k", salt_source="payload").collect()}
    assert got == {1: 50, 2: 2, 3: 1}


def test_export_jsonl_roundtrip_and_determinism(spark, tmp_path, sf_dir):
    from pyspark.sql import functions as F

    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.sources.sinks import (
        export_jsonl,
        read_jsonl_export,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    p1, p2 = str(tmp_path / "x1"), str(tmp_path / "x2")
    export_jsonl(docs, p1, n_shards=4)
    export_jsonl(docs.repartition(13), p2, n_shards=4)

    back = read_jsonl_export(spark, p1)
    assert back.count() == docs.count()
    # full fidelity: every (doc_id, text, source) row survives the trip
    orig = {(r.doc_id, r.text, r.source) for r in docs.collect()}
    got = {(r.doc_id, r.text, r.source) for r in back.collect()}
    assert got == orig
    assert set(back.select("export_shard").distinct().toPandas()["export_shard"]) <= set(range(4))

    # deterministic placement: same rows land in the same shard no matter
    # the input partitioning
    s1 = {(r.doc_id, r.export_shard) for r in read_jsonl_export(spark, p1).select("doc_id", "export_shard").collect()}
    s2 = {(r.doc_id, r.export_shard) for r in read_jsonl_export(spark, p2).select("doc_id", "export_shard").collect()}
    assert s1 == s2

    # byte-identical shards: same content AND same in-file order
    import glob

    def shard_bytes(base):
        out = {}
        for d in glob.glob(f"{base}/export_shard=*"):
            blobs = [open(f, "rb").read() for f in sorted(glob.glob(f"{d}/part-*"))]
            out[d.rsplit("=", 1)[1]] = b"".join(blobs)
        return out

    assert shard_bytes(p1) == shard_bytes(p2)


def test_write_compacted_orc_roundtrip(spark, tmp_path):
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.sources.sinks import (
        write_compacted,
    )

    df = spark.range(0, 5000).selectExpr("id", "id * 2 AS metric")
    n = write_compacted(df, str(tmp_path / "orc_out"), target_mb=256, fmt="orc")
    assert n >= 1
    back = spark.read.orc(str(tmp_path / "orc_out"))
    assert back.count() == 5000
    assert {r.id for r in back.limit(5).collect()} <= set(range(5000))


def test_export_sorted_total_order_across_shards(spark, tmp_path, sf_dir):
    """Range-partitioned export: rows sorted within each shard AND shard
    ranges non-overlapping in shard-id order — a loader reading shards
    sequentially sees one global order. No single-partition sort in the
    plan."""
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.sources.catalog import (
        load_table,
    )
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.sources.sinks import (
        export_sorted,
        sorted_export_manifest,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    path = str(tmp_path / "sorted")
    export_sorted(docs, path, order_col="doc_id", n_shards=8)

    manifest = sorted_export_manifest(spark, path).collect()
    assert sum(m["n_rows"] for m in manifest) == docs.count()
    ordered = sorted(manifest, key=lambda m: m["export_shard"])
    for a, b in zip(ordered, ordered[1:]):
        assert a["max_order"] <= b["min_order"], (a, b)
    # within-shard order: read one shard file directly
    one = spark.read.parquet(path).filter(
        F.col("export_shard") == ordered[0]["export_shard"]
    )
    ids = [r["doc_id"] for r in one.collect()]
    assert ids == sorted(ids)


def test_export_jsonl_crash_retry_is_byte_identical(spark, tmp_path, sf_dir):
    """Exactly-once-by-idempotence: a job that crashed mid-write leaves
    partial shard directories; the RETRY (mode=overwrite, the default)
    must replace them with byte-identical output — same shard membership,
    same in-file order, same bytes — as a never-crashed run. Placement is
    the md5 hash bucket and in-shard order is the sort on the shard key,
    so re-execution cannot depend on shuffle-fetch order or task timing."""
    import glob
    import shutil

    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.sources.sinks import (
        export_jsonl,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    clean, crashed = str(tmp_path / "clean"), str(tmp_path / "crashed")
    export_jsonl(docs, clean, n_shards=4)

    # simulate the crash debris a killed job leaves behind: a complete
    # run, minus one shard, plus a truncated part file and a stale
    # temporary directory
    export_jsonl(docs, crashed, n_shards=4)
    shards = sorted(glob.glob(f"{crashed}/export_shard=*"))
    shutil.rmtree(shards[0])
    part = sorted(glob.glob(f"{shards[1]}/part-*"))[0]
    blob = open(part, "rb").read()
    open(part, "wb").write(blob[: len(blob) // 2])  # torn write
    (tmp_path / "crashed" / "_temporary").mkdir()
    (tmp_path / "crashed" / "_temporary" / "junk").write_text("partial")

    # the retry: same call, overwrite semantics
    export_jsonl(docs, crashed, n_shards=4)

    def shard_bytes(base):
        out = {}
        for d in glob.glob(f"{base}/export_shard=*"):
            blobs = [open(f, "rb").read() for f in sorted(glob.glob(f"{d}/part-*"))]
            out[d.rsplit("=", 1)[1]] = b"".join(blobs)
        return out

    assert shard_bytes(crashed) == shard_bytes(clean)
    assert not (tmp_path / "crashed" / "_temporary").exists()


def test_exports_readable_by_external_duckdb_loader(spark, tmp_path, sf_dir):
    """The export artifacts must round-trip through an EXTERNAL consumer,
    not just Spark: DuckDB stands in for the training loader. jsonl
    shards: full content fidelity + ascending in-shard order read
    straight off the line files; sorted parquet: walking shards in id
    order with in-file row order yields the one global doc_id order the
    curriculum contract promises."""
    import glob

    import duckdb

    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.sources.catalog import (
        load_table,
    )
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.sources.sinks import (
        export_jsonl,
        export_sorted,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    jp, sp = str(tmp_path / "jsonl"), str(tmp_path / "sorted")
    export_jsonl(docs, jp, n_shards=4)
    export_sorted(docs, sp, order_col="doc_id", n_shards=8)
    want = {(r.doc_id, r.text, r.source) for r in docs.collect()}

    con = duckdb.connect()
    try:
        # jsonl: parse each line as JSON, keeping the loader-visible
        # in-file order (read_text + explicit line ordinals)
        rows = con.execute(
            "WITH f AS (SELECT filename, "
            "  string_split(rtrim(content, chr(10)), chr(10)) AS lines "
            "  FROM read_text(?)), "
            "x AS (SELECT filename, unnest(range(1, len(lines) + 1)) AS rn, "
            "  lines FROM f) "
            "SELECT filename, rn, "
            "       CAST(json_extract_string(lines[rn], 'doc_id') AS BIGINT), "
            "       json_extract_string(lines[rn], 'text'), "
            "       json_extract_string(lines[rn], 'source') "
            "FROM x",
            [f"{jp}/export_shard=*/part-*"],
        ).fetchall()
        assert {(r[2], r[3], r[4]) for r in rows} == want
        by_file: dict = {}
        for fn, rn, did, _t, _s in rows:
            by_file.setdefault(fn, []).append((rn, did))
        for fn, pairs in by_file.items():
            ids = [d for _rn, d in sorted(pairs)]
            assert ids == sorted(ids), fn  # in-shard ascending order

        # sorted parquet: shards in id order -> one global total order
        srows = con.execute(
            "SELECT export_shard, filename, file_row_number, doc_id "
            "FROM read_parquet(?, hive_partitioning=true, "
            "                  filename=true, file_row_number=true) "
            "ORDER BY export_shard, filename, file_row_number",
            [f"{sp}/export_shard=*/*.parquet"],
        ).fetchall()
        stream = [r[3] for r in srows]
        assert stream == sorted(r[0] for r in want)
        assert len(glob.glob(f"{sp}/export_shard=*")) == 8
    finally:
        con.close()
