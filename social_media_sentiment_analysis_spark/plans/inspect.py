"""Physical-plan inspection helpers — the engine's plan-quality contract.

Used by tests/test_plans.py to pin the plans we want: broadcast joins for
small dims, TakeOrderedAndProject for top-k, pushed parquet filters, pruned
read schemas, bounded exchange counts. A correctness-green query with a
regressed plan (a broadcast that became a sort-merge, a filter that stopped
pushing down) fails these checks instead of silently becoming a 100 TB
bottleneck.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """explain('formatted') as a string — unlike the simple plan string, scan
    details (ReadSchema, PushedFilters) are printed untruncated."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges)."""
    return physical_plan(df).count("Exchange hashpartitioning") + \
        physical_plan(df).count("Exchange rangepartitioning")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in physical_plan(df)


def is_top_k(df: DataFrame) -> bool:
    """True when limit+orderBy planned as TakeOrderedAndProject
    (per-partition heaps; no global sort)."""
    return "TakeOrderedAndProject" in physical_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def scan_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every parquet scan — column-pruning check."""
    return re.findall(r"ReadSchema: struct<([^>\n]*)>", formatted_plan(df))


def codegen_stage_count(df: DataFrame) -> int:
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)",
                              physical_plan(df))))
