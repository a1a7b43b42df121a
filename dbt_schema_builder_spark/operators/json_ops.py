"""JSON / semi-structured column operators (SURVEY.md B5).

``events.props`` is a JSON string column; extraction stays JVM-side via
``from_json`` / ``get_json_object`` (whole-stage codegen, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

PROPS_SCHEMA = StructType([StructField("k", LongType(), True)])


def extract_props(events: DataFrame) -> DataFrame:
    """Parse props into a typed struct and project the extracted field.
    ``from_json`` with an explicit schema beats ``get_json_object`` when
    extracting multiple fields (single parse)."""
    return events.select(
        "event_id",
        "event_type",
        F.from_json("props", PROPS_SCHEMA).getField("k").alias("prop_k"),
    )


def props_stats_by_type(events: DataFrame) -> DataFrame:
    """Aggregate over the extracted JSON field: per event_type stats of k."""
    parsed = extract_props(events)
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        # exact int64 sum / non-null count as a raw double quotient
        # (r10 tie-class retirement: AVG+ROUND of ints is the
        # ROUND(int/int, 4) class that diverges engines on ties)
        (F.sum("prop_k").cast("double") / F.count("prop_k")).alias("avg_k"),
        F.max("prop_k").alias("max_k"),
    )
