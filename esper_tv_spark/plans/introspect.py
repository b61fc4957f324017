"""Physical-plan introspection: assert the plan you meant to write.

The 100 TB contract for every operator in this engine:
- filters reach the parquet scan (PushedFilters non-empty when expected)
- column pruning happened (ReadSchema ⊂ table schema)
- small dims broadcast (BroadcastHashJoin, not SortMergeJoin)
- shuffle count is what the algebra requires, not what sloppy plan
  construction added

Used by tests (test_plans.py) so plan regressions fail CI, mirroring how the
reference exposed EXPLAIN ANALYZE for its Postgres plans
(/root/reference/app/query/base_models.py:21-30).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters clauses appearing in parquet scans."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", physical_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — the column-pruning evidence."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", physical_plan(df))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def count_shuffles(df: DataFrame) -> int:
    """Number of exchange operators (shuffles) in the plan."""
    return len(re.findall(r"Exchange (?:hash|range|Single)", physical_plan(df)))


def codegen_stage_count(df: DataFrame) -> int:
    return len(re.findall(r"WholeStageCodegen", physical_plan(df)))
