"""Plan inspection helpers: programmatic checks that Catalyst produced the
physical plan we designed for (pushdown reached the scan, small dims went
broadcast, codegen spans cover the hot path). Used by tests/test_plans.py
so plan quality is regression-checked, not just eyeballed."""

from graph_db_spark.plans.inspect import (
    explain_str,
    has_broadcast_join,
    has_whole_stage_codegen,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_join",
    "has_whole_stage_codegen",
]
