"""Behavioral tests for the event-analytics operators (gap-fill/LOCF,
funnel, cohort retention, MAD outliers) on tiny hand-built frames — the
oracle-parity suite pins sf0.01 equivalence; these pin the SEMANTICS the
oracle shares (strictly-after chaining, dense axis, leading-gap zeroes,
robust-gate arithmetic) on inputs where the expected answer is derivable
by hand."""

import datetime

from pyspark.sql import functions as F

from dbt_schema_builder_spark.operators import profiling, timeseries

_EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _ts(minute, second=0):
    return datetime.datetime(2024, 1, 1, 0, minute, second)


def test_gapfill_locf_dense_axis_and_carry(spark):
    # type 'a': observations in 15-min buckets 0 and 2 -> bucket 1 is a
    # gap and must carry bucket 0's sum; axis is exactly buckets 0..2
    ev = spark.createDataFrame(
        [
            (1, _ts(0), 1, "a", 2.0),
            (2, _ts(5), 1, "a", 3.0),
            (3, _ts(40), 1, "a", 7.0),
        ],
        _EV_SCHEMA,
    )
    rows = {
        r["bucket_ms"]: r
        for r in timeseries.gapfill_locf(ev, bucket_minutes=15).collect()
    }
    base = 1704067200000  # 2024-01-01T00:00:00Z epoch ms
    assert set(rows) == {base, base + 900000, base + 1800000}
    assert rows[base]["locf_sum_micro"] == 5_000_000
    assert rows[base]["is_gap"] == 0 and rows[base]["n_events"] == 2
    # the gap bucket carries forward and is flagged
    assert rows[base + 900000]["locf_sum_micro"] == 5_000_000
    assert rows[base + 900000]["is_gap"] == 1
    assert rows[base + 900000]["n_events"] == 0
    assert rows[base + 1800000]["locf_sum_micro"] == 7_000_000


def test_gapfill_locf_series_are_independent(spark):
    # type 'b' spans only bucket 1 -> its axis must NOT inherit type a's
    ev = spark.createDataFrame(
        [
            (1, _ts(0), 1, "a", 1.0),
            (2, _ts(40), 1, "a", 1.0),
            (3, _ts(20), 1, "b", 9.0),
        ],
        _EV_SCHEMA,
    )
    out = timeseries.gapfill_locf(ev, bucket_minutes=15)
    assert out.where(F.col("event_type") == "b").count() == 1


def test_funnel_requires_strict_order(spark):
    # u1 converts fully; u2 clicked BEFORE viewing (click must not count);
    # u3 views only
    ev = spark.createDataFrame(
        [
            (1, _ts(1), 1, "view", 0.0),
            (2, _ts(2), 1, "click", 0.0),
            (3, _ts(3), 1, "purchase", 0.0),
            (4, _ts(2), 2, "view", 0.0),
            (5, _ts(1), 2, "click", 0.0),
            (6, _ts(5), 3, "view", 0.0),
        ],
        _EV_SCHEMA,
    )
    out = {
        r["step"]: r["n_users"]
        for r in timeseries.funnel(ev, ("view", "click", "purchase")).collect()
    }
    assert out == {"view": 3, "click": 1, "purchase": 1}


def test_funnel_equal_timestamp_does_not_advance(spark):
    # strictly-after: a click at EXACTLY the view timestamp is not "then"
    ev = spark.createDataFrame(
        [(1, _ts(1), 1, "view", 0.0), (2, _ts(1), 1, "click", 0.0)],
        _EV_SCHEMA,
    )
    out = {
        r["step"]: r["n_users"]
        for r in timeseries.funnel(ev, ("view", "click")).collect()
    }
    assert out == {"view": 1, "click": 0}


def test_cohort_retention_offsets(spark):
    # u1 first active week W, active again W+2; u2 first active W+2 only
    wk = 7 * 86400000
    d0 = datetime.datetime(2024, 1, 4)  # inside some epoch week W
    d2 = d0 + datetime.timedelta(days=14)
    ev = spark.createDataFrame(
        [
            (1, d0, 1, "view", 0.0),
            (2, d2, 1, "view", 0.0),
            (3, d2, 2, "view", 0.0),
        ],
        _EV_SCHEMA,
    )
    rows = timeseries.cohort_retention(ev).collect()
    w0 = int(d0.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000) // wk
    got = {(r["cohort_week"], r["offset_weeks"]): r["n_users"] for r in rows}
    assert got == {(w0, 0): 1, (w0, 2): 1, (w0 + 2, 0): 1}


def test_mad_outliers_flags_the_planted_point(spark):
    # group 'a': values 1..7 plus a wild 1000 -> median 4.5, MAD ~2.5,
    # only 1000 exceeds 3 MADs; group 'b' is clean
    rows = [(i, _ts(i), 1, "a", float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 1000])]
    rows += [(100 + i, _ts(i), 1, "b", 5.0) for i in range(4)]
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    out = {r["event_type"]: r for r in profiling.mad_outliers(ev).collect()}
    assert out["a"]["n_outliers"] == 1 and out["a"]["n"] == 8
    assert out["b"]["n_outliers"] == 0
    assert out["b"]["mad_r4"] == 0.0


def test_gapfill_interpolate_linear_midpoint(spark):
    # observations at buckets 0 (s=2e6) and 3 (s=8e6): buckets 1 and 2
    # interpolate to 4e6 and 6e6 exactly
    ev = spark.createDataFrame(
        [(1, _ts(0), 1, "a", 2.0), (2, _ts(50), 1, "a", 8.0)],
        _EV_SCHEMA,
    )
    rows = {
        r["bucket_ms"]: r["interp_sum_micro"]
        for r in timeseries.gapfill_interpolate(ev, bucket_minutes=15).collect()
    }
    base = 1704067200000
    assert rows[base] == 2_000_000
    assert rows[base + 900000] == 4_000_000
    assert rows[base + 1800000] == 6_000_000
    assert rows[base + 2700000] == 8_000_000


def test_gapfill_interpolate_descending_floor(spark):
    # descending series with a non-divisible step: 7 -> 2 over 3 buckets
    # = floor(-5e6/3) per step (floor, not truncate: -1666667)
    ev = spark.createDataFrame(
        [(1, _ts(0), 1, "a", 7.0), (2, _ts(50), 1, "a", 2.0)],
        _EV_SCHEMA,
    )
    rows = {
        r["bucket_ms"]: r["interp_sum_micro"]
        for r in timeseries.gapfill_interpolate(ev, bucket_minutes=15).collect()
    }
    base = 1704067200000
    assert rows[base + 900000] == 7_000_000 + (-5_000_000 * 1) // 3
    assert rows[base + 1800000] == 7_000_000 + (-5_000_000 * 2) // 3


def test_rolling_active_users_window(spark):
    # u1 active day 0; u2 active day 3: day-3 7-day window sees both,
    # day-0 window sees only u1; u1's contribution stops after day 6
    # but the axis clips at the max observed day (3)
    d0 = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, d0, 1, "view", 0.0),
            (2, d0 + datetime.timedelta(days=3), 2, "view", 0.0),
        ],
        _EV_SCHEMA,
    )
    rows = {
        r["day"]: (r["n_active_window"], r["n_active_day"])
        for r in timeseries.rolling_active_users(ev, window_days=7).collect()
    }
    day0 = 1704067200000 // 86400000
    assert rows[day0] == (1, 1)
    assert rows[day0 + 1] == (1, 0)
    assert rows[day0 + 3] == (2, 1)
    assert max(rows) == day0 + 3  # clipped at last observed day


def test_interval_coverage_merges_overlaps(spark):
    from dbt_schema_builder_spark.operators import temporal

    # u1: events at 0 and 3 min (5-min intervals overlap -> one island,
    # covered 0..8 min); second burst at 20 min (separate island)
    ev = spark.createDataFrame(
        [
            (1, _ts(0), 1, "a", 0.0),
            (2, _ts(3), 1, "a", 0.0),
            (3, _ts(20), 1, "a", 0.0),
        ],
        _EV_SCHEMA,
    )
    row = temporal.interval_coverage(ev, duration_minutes=5).collect()[0]
    assert row["n_intervals"] == 3
    assert row["n_islands"] == 2
    assert row["covered_ms"] == 8 * 60000 + 5 * 60000


def test_interval_coverage_touching_endpoints_merge(spark):
    from dbt_schema_builder_spark.operators import temporal

    # interval end is exclusive-equal start: start == prev end does NOT
    # open a new island (strict > in the flag)
    ev = spark.createDataFrame(
        [(1, _ts(0), 1, "a", 0.0), (2, _ts(5), 1, "a", 0.0)],
        _EV_SCHEMA,
    )
    row = temporal.interval_coverage(ev, duration_minutes=5).collect()[0]
    assert row["n_islands"] == 1
    assert row["covered_ms"] == 10 * 60000


def test_transition_matrix_respects_session_boundary(spark):
    # u1: a->b within session, then a 31-min gap, then b->a in a NEW
    # session: the cross-gap (a->b ... b) transition must not count
    ev = spark.createDataFrame(
        [
            (1, _ts(0), 1, "a", 0.0),
            (2, _ts(5), 1, "b", 0.0),
            (3, _ts(40), 1, "b", 0.0),
            (4, _ts(45), 1, "a", 0.0),
        ],
        _EV_SCHEMA,
    )
    rows = {
        (r["from_type"], r["to_type"]): r
        for r in timeseries.transition_matrix(ev, gap_minutes=30).collect()
    }
    assert set(rows) == {("a", "b"), ("b", "a")}
    assert rows[("a", "b")]["n"] == 1
    assert rows[("a", "b")]["prob_milli"] == 1000


def test_transition_matrix_prob_is_floored_integer(spark):
    # from 'a': 2 transitions to b, 1 to c -> 666 and 333 milli (floor)
    ev = spark.createDataFrame(
        [
            (1, _ts(0), 1, "a", 0.0),
            (2, _ts(1), 1, "b", 0.0),
            (3, _ts(2), 1, "a", 0.0),
            (4, _ts(3), 1, "b", 0.0),
            (5, _ts(4), 1, "a", 0.0),
            (6, _ts(5), 1, "c", 0.0),
        ],
        _EV_SCHEMA,
    )
    rows = {
        (r["from_type"], r["to_type"]): r["prob_milli"]
        for r in timeseries.transition_matrix(ev).collect()
    }
    assert rows[("a", "b")] == 666
    assert rows[("a", "c")] == 333


def test_conversion_latency_only_counts_completers(spark):
    # u1 completes in 2 min; u2 never purchases
    ev = spark.createDataFrame(
        [
            (1, _ts(0), 1, "view", 0.0),
            (2, _ts(1), 1, "click", 0.0),
            (3, _ts(2), 1, "purchase", 0.0),
            (4, _ts(0), 2, "view", 0.0),
            (5, _ts(1), 2, "click", 0.0),
        ],
        _EV_SCHEMA,
    )
    row = timeseries.conversion_latency(ev).collect()[0]
    assert row["n_converted"] == 1
    assert row["mean_ms"] == 120000.0
    assert row["p50_ms"] == 120000.0


def test_cumulative_users_counts_first_day_once(spark):
    # u1 active days 0 and 2 -> new on day 0 only; u2 new on day 2
    d0 = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, d0, 1, "view", 0.0),
            (2, d0 + datetime.timedelta(days=2), 1, "view", 0.0),
            (3, d0 + datetime.timedelta(days=2), 2, "view", 0.0),
        ],
        _EV_SCHEMA,
    )
    rows = {
        r["day"]: r for r in timeseries.cumulative_users(ev).collect()
    }
    day0 = 1704067200000 // 86400000
    assert rows[day0]["n_new"] == 1 and rows[day0]["cumulative_users"] == 1
    assert rows[day0 + 2]["n_new"] == 1
    assert rows[day0 + 2]["n_active"] == 2
    assert rows[day0 + 2]["cumulative_users"] == 2
    assert day0 + 1 not in rows  # no activity, no row


def test_scd2_collapses_duplicates_and_closes_intervals(spark):
    from dbt_schema_builder_spark.operators import temporal

    # u1: a a b a -> versions a(2 events), b, a; only last is current
    ev = spark.createDataFrame(
        [
            (1, _ts(0), 1, "a", 0.0),
            (2, _ts(1), 1, "a", 0.0),
            (3, _ts(2), 1, "b", 0.0),
            (4, _ts(3), 1, "a", 0.0),
        ],
        _EV_SCHEMA,
    )
    rows = sorted(
        temporal.scd2_history(ev).collect(), key=lambda r: r["version"]
    )
    assert [r["state"] for r in rows] == ["a", "b", "a"]
    assert rows[0]["n_events"] == 2
    # intervals chain: each valid_to equals the next valid_from
    assert rows[0]["valid_to_ms"] == rows[1]["valid_from_ms"]
    assert rows[1]["valid_to_ms"] == rows[2]["valid_from_ms"]
    assert [r["is_current"] for r in rows] == [0, 0, 1]
    assert rows[2]["valid_to_ms"] is None
