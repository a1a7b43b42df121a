"""Batch time-window operators over the events table (SURVEY.md B12-B13).

Batch analogs first — they are DuckDB-oracle-checkable; the streaming
variants in ``streaming/windows.py`` reuse the same shapes with watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import epoch_millis


def tumbling_window_stats(events: DataFrame, unit: str = "hour") -> DataFrame:
    """Tumbling-window aggregate via date_trunc: count / sum / distinct
    users per bucket. date_trunc keeps the bucket a plain timestamp, which
    both Spark and an ANSI oracle compute identically."""
    return (
        events.groupBy(F.date_trunc(unit, F.col("ts")).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # fixed-point micro-units: round each row once (deterministic),
            # sum exactly as longs, divide once — a distributed double sum
            # is summation-order dependent and a trailing ROUND(..., 4) can
            # flip on the last bits (repo convention, see similarity._det_avg)
            (F.sum(F.round(F.col("value") * 1e6).cast("long")) / F.lit(1e6)).alias(
                "sum_value"
            ),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def sliding_window_stats(events: DataFrame) -> DataFrame:
    """Sliding windows (1 hour wide, 30 min slide) via F.window; each event
    lands in 2 buckets. Returns window start/end as plain timestamps."""
    w = F.window("ts", "1 hour", "30 minutes")
    return (
        events.groupBy(w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n_events",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization (B13): a new session starts when the gap to
    the previous event of the same user exceeds ``gap_minutes``.

    Classic two-window formulation — lag to flag session starts, cumulative
    sum to number sessions. One shuffle on user_id; both windows share the
    (user_id, ts) sort so Spark evaluates them in a single Window stage.
    At 100 TB the state per user is just the sort run — no driver state.
    """
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = gap_minutes * 60 * 1000
    prev_ts = F.lag("ts").over(by_user)
    # millisecond epoch on both sides (oracle uses epoch_ms) — second-level
    # truncation would mis-flag gaps that straddle a second boundary;
    # epoch_millis (not unix_millis) because events.ts is TIMESTAMP_NTZ
    is_new = F.when(
        prev_ts.isNull()
        | ((epoch_millis(F.col("ts")) - epoch_millis(prev_ts)) > gap_ms),
        1,
    ).otherwise(0)
    with_id = events.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(is_new).over(
            by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_id"),
    )
    return (
        with_id.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )
