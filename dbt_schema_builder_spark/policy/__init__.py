from .identifiers import (
    RESERVED_WORDS,
    quote_identifier,
    relation_alias,
    upper_case_policy,
)
from .redaction import pii_projection, safe_projection, soft_delete_filter

__all__ = [
    "RESERVED_WORDS",
    "quote_identifier",
    "relation_alias",
    "upper_case_policy",
    "pii_projection",
    "safe_projection",
    "soft_delete_filter",
]
