from .io import (
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    write_partitioned,
    write_zordered,
    zorder_value,
)
from .bucketing import bucketed_join_ready, write_bucketed

__all__ = [
    "read_parquet",
    "read_csv",
    "read_json",
    "read_orc",
    "write_partitioned",
    "write_zordered",
    "zorder_value",
    "write_bucketed",
    "bucketed_join_ready",
]
