"""Physical-plan introspection helpers (used by tests and tuning).

The engine relies on Catalyst for pushdown/pruning/join selection
(SURVEY.md §4.3); these helpers make those properties *assertable* so a
plan regression (filter stops reaching the scan, broadcast silently
becomes a shuffle join) fails CI instead of shipping.
"""

from dataingestionplayground_spark.plans.introspect import (
    physical_plan,
    pushed_filters,
    read_schema_columns,
    has_broadcast_join,
    wholestage_codegen_ids,
)

__all__ = [
    "physical_plan",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_join",
    "wholestage_codegen_ids",
]
