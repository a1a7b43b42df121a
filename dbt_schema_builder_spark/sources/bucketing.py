"""Bucketed tables for shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact join (lineitem x orders) is
shuffling both sides on the join key. Writing both tables bucketed by that
key with the same bucket count makes the join a zero-exchange sort-merge:
each task reads matching buckets from both sides. This module wraps the
``bucketBy`` writer (bucketed tables must go through ``saveAsTable``) and a
reader that verifies the join really plans without an Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.
    Sorting within buckets lets the sort-merge join skip its sort too."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_join_ready(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key. With matching
    bucket counts Catalyst plans this without any Exchange on either side
    (asserted in tests/test_sources.py)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on=on)
