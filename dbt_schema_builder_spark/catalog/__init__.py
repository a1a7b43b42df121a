from .introspect import (
    banned_column_filter,
    catalog_from_session,
    chunked_scan,
    coerce_decimal,
    columns_catalog,
    group_collect,
)

__all__ = [
    "columns_catalog",
    "catalog_from_session",
    "coerce_decimal",
    "banned_column_filter",
    "group_collect",
    "chunked_scan",
]
