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
        # KEPT rounded (r10 sweep): double money-sum class — see the
        # bound note on relational.pricing_summary
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


def skew_report(
    df: DataFrame, key: str, top_k: int = 10, salt_threshold_milli: int = 50
) -> DataFrame:
    """Join/aggregation skew triage: per-key concentration stats that
    decide whether a key needs the salting levers above (or AQE can
    handle it). Emits the ``top_k`` hottest keys with their row share
    in integer milli plus a ``needs_salt`` flag when one key exceeds
    ``salt_threshold_milli`` (default: any key holding >5% of rows —
    the point where one reducer owns a task 20x the median and AQE's
    post-shuffle splitting starts paying recombination cost).

    One count aggregate (map-side combined) + a top-k over the count
    table — the corpus is scanned once; nothing wider than the key
    shuffles. Run it BEFORE a big join lands in production, not after
    the straggler page.
    """
    counts = df.groupBy(F.col(key).cast("string").alias("key_value")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.agg(
        F.sum("n").alias("tot"), F.count(F.lit(1)).alias("n_keys")
    )
    top = (
        counts.crossJoin(F.broadcast(tot))
        .orderBy(F.col("n").desc(), F.col("key_value"))
        .limit(top_k)
    )
    share = F.expr("(1000 * n) div tot")
    return top.select(
        F.lit(key).alias("key_col"),
        "key_value",
        "n",
        "n_keys",
        share.alias("share_milli"),
        (share >= salt_threshold_milli).cast("int").alias("needs_salt"),
    )
