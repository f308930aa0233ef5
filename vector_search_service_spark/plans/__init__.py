from .inspect import executed_plan_str, explain_str, has_broadcast_join, has_pushed_filters, has_top_k, read_schema_columns

__all__ = [
    "executed_plan_str",
    "explain_str",
    "has_broadcast_join",
    "has_pushed_filters",
    "has_top_k",
    "read_schema_columns",
]
