"""Skew mitigation operators.

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py); these are the
explicit levers for when the skew is known ahead of time:

- **salted aggregation**: two-phase groupBy — first on (key, salt) to
  spread a hot key over N partitions, then on key to merge partials.
  Works for any algebraic aggregate (sum/count/min/max).
- **salted join**: replicate the small side N ways, salt the big side,
  join on (key, salt) — the hot key's rows land on N tasks instead of 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame, key: str, value: str, salt_buckets: int = 16
) -> DataFrame:
    """Two-phase skew-safe aggregation: sum(value) per key.

    Phase 1 aggregates on (key, salt) — a hot key spreads across
    ``salt_buckets`` reducers; phase 2 merges the partials per key. The
    result column is named ``sum_<value>``.
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("_salt")
    partial = (
        df.select(key, value)
        .withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.sum(value).alias("_partial"))
    )
    return partial.groupBy(key).agg(
        F.round(F.sum("_partial"), 2).alias(f"sum_{value}")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    once per salt value, join on (key, salt). Output columns = big's
    columns + small's non-key columns (like a plain inner join on key)."""
    salted_big = big.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    replicated_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    joined = salted_big.join(replicated_small, on=[key, "_salt"], how="inner")
    return joined.drop("_salt")
