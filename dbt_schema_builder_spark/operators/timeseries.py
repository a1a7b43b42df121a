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


def gapfill_locf(events: DataFrame, bucket_minutes: int = 15) -> DataFrame:
    """Time-bucket gap-fill with last-observation-carried-forward: the
    hypertable/timeseries staple (TimescaleDB ``time_bucket_gapfill`` +
    ``locf``). Buckets each event_type's stream into fixed intervals,
    materializes EVERY bucket between the series' first and last
    observation, and carries the last seen aggregate forward across empty
    buckets.

    Shape: one (event_type, bucket) aggregate shuffle with map-side
    combine; per-series min/max is a tiny rollup of that table;
    ``sequence`` + explode generates the dense bucket axis (rows bounded
    by time-range / bucket width, NOT by event count — at 100 TB the
    dense axis is still only span/width rows per series); the LOCF window
    runs over the aggregated bucket table, so the per-partition sort is
    over the bounded bucket axis, never the raw events. Sums are integer
    micro-units (repo convention) so the fill is hash-reproducible.
    Low series cardinality makes the final window partition-skewed only
    in bucket count, which is time-bounded — safe.
    """
    bucket_ms = bucket_minutes * 60 * 1000
    b = (
        events.groupBy(
            "event_type",
            (epoch_millis(F.col("ts")) / F.lit(bucket_ms))
            .cast("long")
            .alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 1e6).cast("long")).alias("s"),
        )
    )
    # dense bucket axis per series: span/width rows, independent of |events|
    axis = (
        b.groupBy("event_type")
        .agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
        .select(
            "event_type",
            F.explode(F.sequence("mn", "mx")).alias("bucket"),
        )
    )
    locf = Window.partitionBy("event_type").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        axis.join(b, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            (F.col("bucket") * F.lit(bucket_ms)).alias("bucket_ms"),
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
            F.coalesce(
                F.last("s", ignorenulls=True).over(locf), F.lit(0)
            ).cast("bigint").alias("locf_sum_micro"),
            F.when(F.col("s").isNull(), 1).otherwise(0).alias("is_gap"),
        )
    )


def funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered event funnel: users who performed step 1, then step 2
    strictly after their earliest step 1, then step 3 strictly after that
    earliest qualifying step 2 — the product-analytics conversion query.

    Shape: one groupBy(user_id) min-aggregate per step, each joined to the
    previous stage's (user_id, t_prev) frame — len(steps) shuffles on a
    high-cardinality key with map-side partial mins, no windows over raw
    history and no per-user state beyond one timestamp. The stage frames
    shrink monotonically, and AQE broadcasts them once they fit. Counts
    are the stage frames' row counts (one row per qualifying user).
    """
    ev = events.select(
        "user_id", "event_type", epoch_millis(F.col("ts")).alias("ms")
    )
    stages = []
    prev = None
    for i, step in enumerate(steps):
        cur = ev.where(F.col("event_type") == step)
        if prev is not None:
            cur = cur.join(prev, "user_id").where(F.col("ms") > F.col("t"))
        cur = cur.groupBy("user_id").agg(F.min("ms").alias("t"))
        stages.append(
            cur.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i + 1).alias("stage"),
                F.lit(step).alias("step"),
                "n_users",
            )
        )
        prev = cur
    out = stages[0]
    for s in stages[1:]:
        out = out.unionByName(s)
    return out


def cohort_retention(events: DataFrame) -> DataFrame:
    """Cohort retention matrix: users grouped by the epoch-week of their
    first event (cohort), counted once per subsequent active week at each
    week offset — the growth-analytics staple.

    Shape: one groupBy(user_id) min for the cohort assignment, one
    distinct over (user_id, week) to collapse within-week activity before
    the join (shrinks the fact side to at most users x weeks), then a
    user-keyed join and a tiny (cohort, offset) count-distinct. All keys
    high-cardinality except the final rollup, which is bounded by
    weeks^2 rows. Epoch-week = epoch_ms // (7 * 86400000) — deterministic
    integer arithmetic, no calendar/timezone dependence.
    """
    week_ms = 7 * 86400000
    ev = events.select(
        "user_id", (epoch_millis(F.col("ts")) / F.lit(week_ms)).cast("long").alias("week")
    )
    cohorts = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.distinct()
    return (
        active.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("offset_weeks"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def gapfill_interpolate(events: DataFrame, bucket_minutes: int = 15) -> DataFrame:
    """Gap-fill with LINEAR interpolation between the surrounding
    observations — the companion to ``gapfill_locf`` for continuous
    signals (LOCF for state, interpolation for measurements; the
    TimescaleDB `interpolate()` shape).

    Same dense-axis construction as LOCF; each gap bucket then needs the
    PREVIOUS and NEXT observed (bucket, sum) pair, both obtained from one
    sorted window pass (last/first over ignorenulls frames — no
    self-join). The interpolated value is computed exactly in integer
    micro-units: prev + floor(dnum / dden) where dnum = (next - prev) *
    (bucket - prev_bucket) and dden = next_bucket - prev_bucket. The
    floor runs through double division on the Spark side and integer
    ``//`` in the oracle — identical because dden is bounded by the
    bucket-axis length (≪ 2^26), so the true ratio is never within one
    double ulp of an integer it doesn't equal. Buckets before the first
    / after the last observation have no bracketing pair and fall back
    to the nearest observed value.
    """
    bucket_ms = bucket_minutes * 60 * 1000
    b = (
        events.groupBy(
            "event_type",
            (epoch_millis(F.col("ts")) / F.lit(bucket_ms))
            .cast("long")
            .alias("bucket"),
        )
        .agg(F.sum(F.round(F.col("value") * 1e6).cast("long")).alias("s"))
    )
    axis = (
        b.groupBy("event_type")
        .agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
        .select(
            "event_type", F.explode(F.sequence("mn", "mx")).alias("bucket")
        )
    )
    j = axis.join(b, ["event_type", "bucket"], "left")
    prev_w = Window.partitionBy("event_type").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    next_w = Window.partitionBy("event_type").orderBy("bucket").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    obs_bucket = F.when(F.col("s").isNotNull(), F.col("bucket"))
    with_ends = j.select(
        "event_type",
        "bucket",
        "s",
        F.last("s", ignorenulls=True).over(prev_w).alias("pv"),
        F.last(obs_bucket, ignorenulls=True).over(prev_w).alias("pb"),
        F.first("s", ignorenulls=True).over(next_w).alias("nv"),
        F.first(obs_bucket, ignorenulls=True).over(next_w).alias("nb"),
    )
    interp = F.col("pv") + F.floor(
        (
            (F.col("nv") - F.col("pv")) * (F.col("bucket") - F.col("pb"))
        ).cast("double")
        / (F.col("nb") - F.col("pb"))
    ).cast("long")
    filled = (
        F.when(F.col("s").isNotNull(), F.col("s"))
        .when(F.col("pv").isNull(), F.col("nv"))  # before first obs
        .when(F.col("nv").isNull(), F.col("pv"))  # after last obs
        .otherwise(interp)
    )
    return with_ends.select(
        "event_type",
        (F.col("bucket") * F.lit(bucket_ms)).alias("bucket_ms"),
        filled.cast("bigint").alias("interp_sum_micro"),
        F.when(F.col("s").isNull(), 1).otherwise(0).alias("is_gap"),
    )


def rolling_active_users(events: DataFrame, window_days: int = 7) -> DataFrame:
    """Rolling N-day distinct active users per day (DAU/WAU/MAU family).

    Exact distinct over a sliding window cannot merge like a sum, so the
    scale-shaped formulation EXPANDS each distinct (user, day) into the
    ``window_days`` days it contributes to (bounded fan-out = window
    width) and counts distincts per contribution day — one distinct
    shuffle + one count shuffle, no per-day self-join over the raw
    events. At extreme scale swap the exact count for mergeable HLL
    sketches per day (union over the window); this exact form is the
    oracle-checkable gate. Trailing days beyond the last observed day
    are clipped via the max-day scalar (broadcast join of a 1-row
    aggregate).
    """
    day = (epoch_millis(F.col("ts")) / F.lit(86400000)).cast("long")
    ud = events.select("user_id", day.alias("day")).distinct()
    bounds = ud.agg(F.max("day").alias("mxd"), F.min("day").alias("mnd"))
    contrib = (
        ud.select(
            "user_id",
            F.explode(
                F.sequence("day", F.col("day") + F.lit(window_days - 1))
            ).alias("cday"),
        )
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .where((F.col("cday") <= F.col("mxd")))
    )
    daily = events.select("user_id", day.alias("cday")).distinct()
    return (
        contrib.groupBy("cday")
        .agg(F.countDistinct("user_id").alias("n_active_window"))
        .join(
            daily.groupBy("cday").agg(
                F.countDistinct("user_id").alias("n_active_day")
            ),
            "cday",
            "left",
        )
        .select(
            F.col("cday").alias("day"),
            "n_active_window",
            F.coalesce("n_active_day", F.lit(0)).cast("bigint").alias(
                "n_active_day"
            ),
        )
    )


def transition_matrix(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Markov transition matrix over event types WITHIN sessions: counts
    of consecutive (from_type -> to_type) steps, plus milli-unit
    transition probabilities — the product-analytics path model (what do
    users do after an error?).

    Builds on the sessionization lag/cumsum machinery: one (user_id, ts)
    sort serves the session-break flag, the session numbering, and the
    next-event lead; transitions never cross a session boundary. One
    shuffle on the high-cardinality user key, then a tiny
    (from, to)-bounded count rollup. Probabilities are exact integer
    milli-units — floor((1000 * n) / row_total) — so the surface is
    hash-stable with no float rounding anywhere.
    """
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = gap_minutes * 60 * 1000
    prev_ts = F.lag("ts").over(by_user)
    is_new = F.when(
        prev_ts.isNull()
        | ((epoch_millis(F.col("ts")) - epoch_millis(prev_ts)) > gap_ms),
        1,
    ).otherwise(0)
    with_sess = events.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.sum(is_new)
        .over(by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_id"),
    )
    nxt_type = F.lead("event_type").over(by_user)
    nxt_sess = F.lead("session_id").over(by_user)
    steps = with_sess.select(
        F.col("event_type").alias("from_type"),
        nxt_type.alias("to_type"),
        (nxt_sess == F.col("session_id")).alias("same_sess"),
    ).where(F.col("same_sess") & F.col("to_type").isNotNull())
    counts = steps.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    # row totals as a window over the (from, to)-bounded count table:
    # a groupBy+join formulation gives the rollup a second consumer of
    # the whole session pipeline and Spark re-evaluates it (measured:
    # two user_id exchanges in the plan); the window keeps one lineage
    row_tot = F.sum("n").over(Window.partitionBy("from_type"))
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.expr("1000 * n").cast("long").alias("_num"),
        row_tot.alias("_rt"),
    ).select(
        "from_type",
        "to_type",
        "n",
        F.expr("_num div _rt").alias("prob_milli"),
    )


def conversion_latency(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Latency distribution of full funnel conversion: for each user who
    completes the ``funnel`` chain, the end-to-end milliseconds from the
    earliest first-step to their qualifying final-step timestamp;
    reported as exact quantiles + fixed-point mean. The "how long does
    conversion take" number product teams track next to the funnel
    counts.

    Reuses the funnel's per-stage min-aggregate joins (high-cardinality
    user key, monotonically shrinking frames), then one
    ``percentile(array(...))`` aggregate over the converting-user set —
    exact interpolated quantiles, same contract both engines.
    """
    ev = events.select(
        "user_id", "event_type", epoch_millis(F.col("ts")).alias("ms")
    )
    first = (
        ev.where(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ms").alias("t_first"))
    )
    cur = first.select("user_id", F.col("t_first").alias("t"))
    for step in steps[1:]:
        cur = (
            ev.where(F.col("event_type") == step)
            .join(cur, "user_id")
            .where(F.col("ms") > F.col("t"))
            .groupBy("user_id")
            .agg(F.min("ms").alias("t"))
        )
    lat = cur.join(first, "user_id").select(
        "user_id", (F.col("t") - F.col("t_first")).alias("latency_ms")
    )
    from .similarity import _det_avg_round4

    q = F.expr("percentile(latency_ms, array(0.5, 0.9, 0.99))")
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        _det_avg_round4(F.col("latency_ms")).alias(
            "mean_ms"
        ),
        (F.round(q[0], 4) + F.lit(0.0)).alias("p50_ms"),
        (F.round(q[1], 4) + F.lit(0.0)).alias("p90_ms"),
        (F.round(q[2], 4) + F.lit(0.0)).alias("p99_ms"),
    )


def cumulative_users(events: DataFrame) -> DataFrame:
    """Cumulative distinct users by day — the growth curve. Exact
    cumulative distinct without any running-distinct state: each user
    contributes 1 on their FIRST active day (a groupBy-min, one shuffle
    on the high-cardinality key), daily new-user counts roll up from
    that, and the running total is a window over the day axis (bounded
    by the time range, not the data). Emits new + cumulative + that
    day's actives."""
    day = (epoch_millis(F.col("ts")) / F.lit(86400000)).cast("long")
    ud = events.select("user_id", day.alias("day")).distinct()
    firsts = ud.groupBy("user_id").agg(F.min("day").alias("day"))
    new_by_day = firsts.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    active_by_day = ud.groupBy("day").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    run = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        active_by_day.join(new_by_day, "day", "left")
        .select(
            "day",
            F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new"),
            "n_active",
        )
        .withColumn("cumulative_users", F.sum("n_new").over(run))
    )
