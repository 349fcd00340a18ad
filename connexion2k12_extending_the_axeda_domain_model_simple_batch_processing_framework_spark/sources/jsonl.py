"""JSONL document source — the interchange format training corpora ship in.

Mirrors the reference's ingest contract (``CreateBatch.groovy`` accepts an
upload, validates every line, and routes bad lines to an error report): here
each JSON line becomes a document row, and malformed lines are routed to a
rejects DataFrame instead of failing the job or silently disappearing.

Scale design: the file is read as text and parsed with ``from_json`` — a
pure projection, so parsing is scan-parallel (one task per split, no
driver involvement, no caching). The PERMISSIVE-mode alternative
(``spark.read.json`` + ``_corrupt_record``) cannot filter on the corrupt
column without caching the whole input — a non-starter at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical documents-table shape (matches testdata documents.parquet)
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl_documents(
    spark: SparkSession, path: str, schema: T.StructType = DOCUMENTS_SCHEMA
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus → ``(documents, rejects)``.

    A line is rejected when it is not valid JSON or lacks the required
    ``doc_id``/``text`` fields; rejects carry the raw line plus its file so
    an audit can trace every dropped byte (same spirit as the reference's
    per-line error anchors, ``internal/AnalyzeBatch.groovy``).
    """
    raw = spark.read.text(path).select(
        F.col("value"), F.input_file_name().alias("src_file")
    )
    parsed = raw.select(
        F.from_json("value", schema).alias("r"), "value", "src_file"
    )
    ok = F.col("r").isNotNull() & F.col("r.doc_id").isNotNull() & F.col(
        "r.text"
    ).isNotNull()
    docs = parsed.filter(ok).select("r.*")
    rejects = parsed.filter(~ok).select(
        F.col("value").alias("raw_line"), "src_file"
    )
    return docs, rejects


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write a corpus back out as JSONL (one dir of part files; at scale
    you size partitions upstream — see sinks.write_compacted)."""
    df.write.mode("overwrite").json(path)
