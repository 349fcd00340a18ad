"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query on sf0.001; ``queries``/``oracle_sql``
expose every SURVEY.md §2 operator for the DuckDB correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark import (
    queries as q,
)

FLAGSHIP_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the GetBatch-parity batch status aggregation (orders ⋈
    lineitem task outcomes) on sf0.001."""
    return q.q_batch_status(spark, FLAGSHIP_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """Static oracle strings plus data-dependent twins (e.g. ann_ivf_topk's
    centroid literals) built for the gate's sf_dir — the driver runs at
    sf0.01, which is the default; override with $SPARK_GRAFT_ORACLE_SF_DIR
    when gating a different scale (tools/parity.py does)."""
    return q.finalize_oracles()
