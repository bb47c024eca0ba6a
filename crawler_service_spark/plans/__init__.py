from crawler_service_spark.plans.audit import (
    count_exchanges,
    explain_str,
    has_broadcast_hash_join,
    pushed_filters,
    read_schema_columns,
    uses_whole_stage_codegen,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "count_exchanges",
    "has_broadcast_hash_join",
    "uses_whole_stage_codegen",
]
