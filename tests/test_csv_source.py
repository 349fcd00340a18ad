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
