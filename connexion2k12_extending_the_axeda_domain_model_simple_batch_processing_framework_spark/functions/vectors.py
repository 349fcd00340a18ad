"""Vector math over ``array<float>`` embedding columns.

All arithmetic happens in **double** after an explicit element cast, folded
left-to-right with ``aggregate`` — sequential accumulation in index order,
which the DuckDB oracle mirrors with ``list_reduce`` so dot products are
bit-identical across engines (see SURVEY.md §6). No UDFs: these are
codegen'd JVM expressions, the scale path for 100 TB of embeddings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
