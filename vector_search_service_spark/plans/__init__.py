from .inspect import explain_str, has_broadcast_join, has_pushed_filters, has_top_k, read_schema_columns

__all__ = [
    "explain_str",
    "has_broadcast_join",
    "has_pushed_filters",
    "has_top_k",
    "read_schema_columns",
]
