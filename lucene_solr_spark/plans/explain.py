"""Physical-plan introspection helpers.

The reference's "optimizer" is the scorer-tree construction
(Boolean2ScorerSupplier) plus index pushdown; in this engine Catalyst
owns those decisions, and these helpers make the resulting plans
assertable in tests — the plan IS the performance contract at 100 TB:

- filters must reach the parquet scan (PushedFilters),
- partition-directory pruning must fire for term_bucket reads
  (PartitionFilters),
- small dims must broadcast (BroadcastHashJoin),
- column pruning must shrink ReadSchema.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "partition_filters",
    "join_strategies",
    "read_schemas",
]


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list:
    """All PushedFilters entries across the plan's scans."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def partition_filters(df: DataFrame) -> list:
    return re.findall(r"PartitionFilters: \[([^\]]*)\]", formatted_plan(df))


def join_strategies(df: DataFrame) -> list:
    """Join operator names appearing in the physical plan."""
    plan = formatted_plan(df)
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)",
        plan,
    )


def read_schemas(df: DataFrame) -> list:
    return re.findall(r"ReadSchema: (struct<[^>]*>)", formatted_plan(df))
