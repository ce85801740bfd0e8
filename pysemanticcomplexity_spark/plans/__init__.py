"""Plan-inspection helpers used by tests and benchmarks to assert that the
physical plan is the intended one (pushdown reached the scan, joins went
broadcast, codegen spans exist)."""
from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["executed_plan", "read_schema_of_scan", "has_broadcast_join",
           "count_shuffles"]


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def read_schema_of_scan(df: DataFrame) -> str:
    """The ReadSchema fragment of the (first) file scan, '' if none."""
    for line in executed_plan(df).splitlines():
        if "ReadSchema" in line:
            return line.split("ReadSchema:", 1)[1].strip()
    return ""


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def has_wholestage_codegen(df: DataFrame) -> bool:
    """executedPlan().toString() marks codegen stages with a '*(n)' prefix."""
    plan = executed_plan(df)
    return "*(" in plan or "WholeStageCodegen" in plan


def count_shuffles(df: DataFrame) -> int:
    plan = executed_plan(df)
    return plan.count("Exchange hashpartitioning") + \
        plan.count("Exchange rangepartitioning")
