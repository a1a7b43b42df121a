"""Temporal join operators Spark lacks natively: as-of join and
range join (north-star custom operators; SURVEY.md section 2 Tier B).

Both are compositions of existing DataFrame ops — no UDFs:

- **as-of join**: union the two sides with a source tag, sort within each
  key by (time, tag), carry the right side's payload forward with
  ``last(..., ignorenulls)`` over an unbounded-preceding window, keep the
  left rows. One shuffle on the key, one per-partition sort — the same
  cost as a window function, instead of the naive inequality join that
  explodes into a per-key cross product.
- **range join**: an equi-join on the key plus a band predicate on time.
  The equi key keeps it a hash/sort-merge join (the band is a post-join
  filter pushed into the join condition); without an equi key Spark would
  fall back to broadcast-nested-loop, which is the wrong plan at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import epoch_millis


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on_key: str,
    on_time: str,
    right_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with the same
    key at or before the left row's time (a backward as-of join).

    ``right_cols`` are the right-side payload columns to carry; they are
    emitted as ``asof_<name>``. ``tolerance_seconds`` drops matches older
    than the window (like pandas merge_asof tolerance).
    """
    lt = left.withColumn("_src", F.lit(1))
    rt = right.select(
        on_key,
        on_time,
        *[F.col(c).alias(f"asof_{c}") for c in right_cols],
    ).withColumn("_src", F.lit(0))
    payload = [f"asof_{c}" for c in right_cols]
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # right rows sort before left rows at the same timestamp (_src 0 < 1),
    # so an exact-tie right row is visible to the left row — ">= semantics"
    w = (
        Window.partitionBy(on_key)
        .orderBy(F.col(on_time), F.col("_src"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.when(F.col("_src") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"_carry_{c}")
            for c in payload
        ],
        F.last(F.when(F.col("_src") == 0, F.col(on_time)), ignorenulls=True)
        .over(w)
        .alias("_carry_time"),
    )
    out = carried.where(F.col("_src") == 1)
    if tolerance_seconds is not None:
        in_window = (
            epoch_millis(F.col(on_time)) - epoch_millis(F.col("_carry_time"))
        ) <= tolerance_seconds * 1000
        out = out.select(
            *left.columns,
            *[
                F.when(in_window, F.col(f"_carry_{c}")).alias(c)
                for c in payload
            ],
        )
    else:
        out = out.select(
            *left.columns, *[F.col(f"_carry_{c}").alias(c) for c in payload]
        )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on_key_left: str,
    on_key_right: str,
    time_left: str,
    time_right: str,
    max_gap_seconds: int,
) -> DataFrame:
    """Equi + band join: pairs with matching keys whose right time falls
    in [left time, left time + max_gap_seconds]. The equi key drives the
    physical join; the band rides along in the join condition."""
    gap_ms = max_gap_seconds * 1000
    cond = (
        (F.col(on_key_left) == F.col(on_key_right))
        & (epoch_millis(F.col(time_right)) >= epoch_millis(F.col(time_left)))
        & (
            epoch_millis(F.col(time_right))
            <= epoch_millis(F.col(time_left)) + gap_ms
        )
    )
    return left.join(right, cond)


def merge_latest(
    base: DataFrame,
    updates: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """MERGE / upsert: apply an update batch to a base snapshot, keeping
    the latest record per key (timestamp order, deterministic tiebreak on
    ``tiebreak`` so equal timestamps never flap between runs). The SCD-1
    "latest wins" merge every incremental ingest needs, expressed
    relationally instead of as a mutable-table MERGE INTO.

    Shape: unionByName + one row_number window over the key — a single
    shuffle on the merge key, no join at all. At 100 TB this beats the
    full-outer-join formulation (two shuffles + null-coalescing) and
    map-side combines nothing it shouldn't: the window sorts only within
    each key's partition. Updates for brand-new keys insert; keys absent
    from the batch pass through untouched.
    """
    merged = base.unionByName(updates)
    w = Window.partitionBy(key).orderBy(
        F.col(ts).desc(), F.col(tiebreak).desc()
    )
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def interval_coverage(
    events, duration_minutes: int = 5, group_col: str = "user_id"
):
    """Merge overlapping per-key intervals and report coverage — the
    interval-union staple (machine utilization, session stitching,
    on-air time). Each event opens [ts, ts + duration); intervals whose
    start exceeds the running max end of all EARLIER intervals begin a
    new island; islands are numbered by a cumulative sum over the same
    sorted window, then collapsed to (n_islands, covered_ms).

    One shuffle on the high-cardinality group key; both windows share
    one (start, event_id) sort. All arithmetic is epoch-ms integers —
    no floats anywhere, deterministic on any engine. The per-key state
    during the window pass is a single running max, so a 100 TB key
    partition streams through in one sorted scan (no pairwise interval
    join, which would be quadratic in bursty keys).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from ..session import epoch_millis

    dur_ms = duration_minutes * 60 * 1000
    iv = events.select(
        F.col(group_col),
        "event_id",
        epoch_millis(F.col("ts")).alias("start"),
        (epoch_millis(F.col("ts")) + F.lit(dur_ms)).alias("end"),
    )
    w = Window.partitionBy(group_col).orderBy("start", "event_id")
    prev_max_end = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = F.when(
        prev_max_end.isNull() | (F.col("start") > prev_max_end), 1
    ).otherwise(0)
    islands = iv.select(
        group_col,
        "start",
        "end",
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("island"),
    )
    merged = islands.groupBy(group_col, "island").agg(
        F.min("start").alias("i_start"),
        F.max("end").alias("i_end"),
        F.count(F.lit(1)).alias("n_iv"),
    )
    return merged.groupBy(group_col).agg(
        F.sum("n_iv").alias("n_intervals"),
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("i_end") - F.col("i_start")).alias("covered_ms"),
    )


def scd2_history(
    events,
    key_col: str = "user_id",
    state_col: str = "event_type",
    order_cols: tuple = ("ts", "event_id"),
):
    """Type-2 slowly-changing-dimension builder: collapse a change
    stream into versioned rows [valid_from, valid_to) per key, one row
    per CHANGE of the tracked state (consecutive duplicates collapse
    into the earlier version), latest row open-ended with an
    ``is_current`` flag — the dimension-table shape every warehouse
    keeps for as-of joins (compose with ``asof_join`` to resolve facts
    against it; cf. reference builder.py's latest-wins merge, which is
    the SCD-1 degenerate case of this).

    One (key, order) sort serves the change detection (lag), the version
    numbering (running sum of change flags), and the interval close
    (lead over the COLLAPSED versions) — two window stages on the same
    high-cardinality partitioning, no self-join. Epoch-ms integers
    throughout.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from ..session import epoch_millis

    w = Window.partitionBy(key_col).orderBy(*order_cols)
    prev_state = F.lag(state_col).over(w)
    changed = F.when(
        prev_state.isNull() | (prev_state != F.col(state_col)), 1
    ).otherwise(0)
    versioned = events.select(
        key_col,
        state_col,
        epoch_millis(F.col("ts")).alias("ms"),
        F.sum(changed)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("version"),
    )
    spans = versioned.groupBy(key_col, "version").agg(
        F.first(state_col).alias("state"),
        F.min("ms").alias("valid_from_ms"),
        F.count(F.lit(1)).alias("n_events"),
    )
    vw = Window.partitionBy(key_col).orderBy("version")
    nxt = F.lead("valid_from_ms").over(vw)
    return spans.select(
        key_col,
        "version",
        "state",
        "valid_from_ms",
        F.coalesce(nxt, F.lit(None).cast("long")).alias("valid_to_ms"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
        "n_events",
    )
