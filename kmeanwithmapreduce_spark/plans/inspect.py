"""Plan inspection helpers: programmatic access to the formatted
physical plan, used by tests to pin the scale-critical plan properties
(predicate pushdown, column pruning, broadcast joins, partial
aggregation) so regressions fail loudly instead of silently costing a
shuffle at 100 TB."""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    spark = df.sparkSession
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def plan_has(df: DataFrame, *needles: str, mode: str = "formatted") -> bool:
    plan = explain_str(df, mode)
    return all(n in plan for n in needles)


def count_nodes(plan: str, node_name: str) -> int:
    """Count physical-plan nodes by their detail headers ('(N) NodeName'),
    since formatted explain prints each node twice (tree + details)."""
    import re

    return len(re.findall(rf"^\(\d+\) {node_name}\b", plan, re.MULTILINE))
