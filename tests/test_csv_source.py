"""CSV task-file source: line numbering + field splitting
(reference: CreateBatch.groovy request contract)."""

from __future__ import annotations

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.sources.csv_tasks import (
    parse_task_lines,
    read_task_file,
)


def test_read_task_file_numbers_lines(spark, tmp_path):
    p = tmp_path / "tasks.csv"
    p.write_text("M1,S1,A1\nM2,S2,A2\nM3,S3,A3\n")
    rows = read_task_file(spark, str(p), batch_id=7).orderBy("task_number").collect()
    assert [r.task_number for r in rows] == [1, 2, 3]
    assert all(r.batch_id == 7 for r in rows)
    assert rows[1].model_name == "M2"
    assert rows[2].asset_name == "A3"


def test_parse_task_lines_extracts_first_three_fields(spark):
    df = spark.createDataFrame(
        [(1, "M,S,A,prop1,group1"), (2, "M2,S2")],
        "task_number long, raw_line string",
    )
    rows = parse_task_lines(df).orderBy("task_number").collect()
    # extra property/group segments stay in raw_line; 3 fields extracted
    assert rows[0].model_name == "M"
    assert rows[0].serial_number == "S"
    assert rows[0].asset_name == "A"
    assert rows[0].raw_line == "M,S,A,prop1,group1"
    # short line → missing third field is null
    assert rows[1].asset_name is None


def test_read_task_file_numbers_across_splits(spark, tmp_path):
    """Numbering must be correct when the file scans as multiple splits."""
    p = tmp_path / "many.csv"
    n = 5000
    p.write_text("".join(f"M{i},S{i},A{i}\n" for i in range(1, n + 1)))
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")  # force splits
    try:
        df = read_task_file(spark, str(p))
        rows = df.select("task_number", "model_name").collect()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    assert len(rows) == n
    got = {r.task_number: r.model_name for r in rows}
    assert len(got) == n  # task numbers unique
    assert got[1] == "M1" and got[n] == f"M{n}"
    # every line number maps to the matching file line
    assert all(got[i] == f"M{i}" for i in range(1, n + 1, 997))


def test_read_task_file_plan_has_no_single_partition_exchange(spark, tmp_path):
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.plans.checks import (
        plan_string,
    )

    p = tmp_path / "tasks.csv"
    p.write_text("M1,S1,A1\nM2,S2,A2\n")
    plan = plan_string(read_task_file(spark, str(p)))
    # the line data must never funnel through one partition; the only
    # exchanges allowed are the tiny per-split counts aggregation + its
    # window, and the broadcast back
    assert "Exchange SinglePartition" not in plan
