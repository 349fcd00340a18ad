"""Physical-plan assertion helpers.

The 100 TB contract isn't just "right answers" — it's "right plans": filters
pushed to the parquet scan, dimension joins broadcast, no row-at-a-time
Python evaluation in hot paths, whole-stage codegen spanning the pipeline.
These helpers turn those properties into testable assertions
(tests/test_plans.py) so a refactor that silently de-optimizes a plan fails
CI the same way a wrong answer would.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (what ``df.explain(mode)`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def count_broadcast_joins(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan_string(df)))


def count_shuffle_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators (excludes broadcast exchanges).

    Parses the SIMPLE-mode plan: formatted mode prints exchanges as
    ``Exchange (5)`` with the partitioning on a detail line, so the
    operator+arguments regex silently matched nothing there (every
    count was 0 and upper-bound assertions passed vacuously)."""
    plan = plan_string(df, "simple")
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning|\bExchange SinglePartition", plan))


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lists on every parquet scan in the plan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan_string(df))


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    return any(fragment in p for p in pushed_filters(df))


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — the column-pruning evidence. Greedy to
    the line's last '>' so nested types (map/array/struct) don't truncate
    the capture at their inner closing bracket."""
    return re.findall(r"ReadSchema: struct<(.*)>", plan_string(df))


def uses_python_eval(df: DataFrame) -> bool:
    """True when the plan contains row-at-a-time Python evaluation
    (BatchEvalPython) — the slow path our hot-path operators must avoid.
    ArrowEvalPython / MapInPandas (vectorized) are reported separately."""
    return "BatchEvalPython" in plan_string(df)


def uses_arrow_eval(df: DataFrame) -> bool:
    plan = plan_string(df)
    return "ArrowEvalPython" in plan or "MapInPandas" in plan


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Window nodes with an EMPTY partitionSpec in the optimized logical
    plan — the shape that funnels the whole relation through one task at
    scale (Spark warns ``WindowExec: No Partition Defined``).

    A window whose input subtree contains a GlobalLimit is exempt: the
    relation feeding it is bounded by construction (the pagination shape —
    ORDER BY + LIMIT k, then row_number over the k rows), so the single
    task sees k rows regardless of data scale. Everything else is a
    100 TB defect; tests/test_plans.py sweeps every registered query with
    this and fails on any hit (the abc_pareto r9 regression class).

    A partitionSpec made ENTIRELY of foldable expressions
    (``partitionBy(lit(1))``) counts as empty: it is the identical
    runtime shape — one task, the same "No Partition Defined" warning —
    merely disguised from a naive isEmpty check (two salted-top-k final
    ranks hid this way until the r10 parity-log grep; both now finish
    with orderBy+limit TakeOrdered instead).
    """

    def has_limit(node) -> bool:
        if node.getClass().getSimpleName() in ("GlobalLimit", "Limit"):
            return True
        kids = node.children()
        return any(has_limit(kids.apply(i)) for i in range(kids.size()))

    bad: list[str] = []

    def effectively_empty(spec) -> bool:
        if spec.isEmpty():
            return True
        return all(spec.apply(i).foldable() for i in range(spec.size()))

    def walk(node) -> None:
        if (
            node.getClass().getSimpleName() == "Window"
            and effectively_empty(node.partitionSpec())
            and not has_limit(node)
        ):
            bad.append(node.simpleString(120))
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return bad


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans in the EXECUTED plan.

    Under AQE the pre-execution plan is just ``AdaptiveSparkPlan
    isFinalPlan=false`` with no codegen annotation, so this runs the query
    (cheap at test scale) and inspects the final physical plan.
    """
    df.collect()  # a write would execute a cloned QueryExecution; collect
    # materializes AQE's final plan on THIS one.
    executed = df._jdf.queryExecution().executedPlan().toString()
    return len(set(re.findall(r"\*\((\d+)\)|WholeStageCodegen \((\d+)\)", executed)))
