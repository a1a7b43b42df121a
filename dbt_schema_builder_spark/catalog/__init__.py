from .introspect import (
    banned_column_filter,
    chunked_scan,
    columns_catalog,
    group_collect,
)

__all__ = [
    "columns_catalog",
    "banned_column_filter",
    "group_collect",
    "chunked_scan",
]
