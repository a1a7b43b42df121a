"""r10: random EVENTS-frame differentials — the harness the coverage
audit named as its biggest exemption category. Each test builds one
random event stream per hypothesis example, runs the SAME operator
call as the driver's q_ function on a Spark frame, and compares with
the key's LIVE oracle string executed by DuckDB over an identically
registered frame (naive datetime64[us] — the r8 streaming-differential
convention). Values are integer micro-units via st.integers, never
st.floats (round() agreement stays trivial, the r8 rule).

Random streams exercise what the fixture cannot: single-event users,
ties on every boundary (same-ts events, windows ending exactly on the
gap), empty funnel stages, one-day axes, all-null JSON, and tiny
per-group denominators for the r10 unrounded-ratio surfaces."""

import datetime

import __spark_entry__ as entry
from hypothesis import given, settings, strategies as st

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

_BASE = datetime.datetime(2024, 1, 1)

# (user, minutes-offset, event_type, value-micros, json-k or None)
ev_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=0, max_value=3000),
        st.sampled_from(["view", "click", "purchase", "error"]),
        st.integers(min_value=-(10**8), max_value=10**8),
        st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
    ),
    min_size=1,
    max_size=40,
)


def _frames(spark, rows):
    """(spark events frame, duckdb connection with events registered)."""
    import duckdb
    import pandas as pd

    data = [
        (
            i,
            _BASE + datetime.timedelta(minutes=m),
            u,
            t,
            micros / 1e6,
            "{}" if k is None else '{"k": %d}' % k,
        )
        for i, (u, m, t, micros, k) in enumerate(rows)
    ]
    ev = spark.createDataFrame(data, EV_SCHEMA)
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": [r[0] for r in data],
                "ts": pd.Series([r[1] for r in data], dtype="datetime64[us]"),
                "user_id": [r[2] for r in data],
                "event_type": [r[3] for r in data],
                "value": [r[4] for r in data],
                "props": [r[5] for r in data],
            }
        ),
    )
    return ev, con


def _check(spark, rows, oracle, op):
    """Run op(events) vs the LIVE oracle string (each caller passes
    entry.oracle_sql()["q_..."] literally — the greppable form the
    coverage audit counts)."""
    ev, con = _frames(spark, rows)
    got = {tuple(r) for r in op(ev).collect()}
    want = {tuple(r) for r in con.execute(oracle).fetchall()}
    assert got == want, got ^ want


@settings(max_examples=8, deadline=None)
@given(rows=ev_rows)
def test_tumbling_window_oracle_on_random_events(spark, rows):
    from dbt_schema_builder_spark.operators import timeseries

    _check(
        spark, rows, entry.oracle_sql()["q_tumbling_window"], timeseries.tumbling_window_stats
    )


@settings(max_examples=8, deadline=None)
@given(rows=ev_rows)
def test_session_window_oracle_on_random_events(spark, rows):
    from pyspark.sql import functions as F  # noqa: F401

    from dbt_schema_builder_spark.operators import timeseries
    from dbt_schema_builder_spark.session import epoch_millis

    def op(ev):
        return timeseries.sessionize(ev, gap_minutes=30).select(
            "user_id",
            "session_id",
            "n_events",
            epoch_millis("session_start").alias("session_start_ms"),
            epoch_millis("session_end").alias("session_end_ms"),
        )

    _check(
spark, rows, entry.oracle_sql()["q_session_window"], op)


@settings(max_examples=8, deadline=None)
@given(rows=ev_rows)
def test_funnel_oracle_on_random_events(spark, rows):
    from dbt_schema_builder_spark.operators import timeseries

    _check(
        spark,
        rows,
        entry.oracle_sql()["q_funnel"],
        lambda ev: timeseries.funnel(ev, steps=("view", "click", "purchase")),
    )


@settings(max_examples=8, deadline=None)
@given(rows=ev_rows)
def test_cumulative_users_oracle_on_random_events(spark, rows):
    from dbt_schema_builder_spark.operators import timeseries

    _check(
spark, rows, entry.oracle_sql()["q_cumulative_users"], timeseries.cumulative_users)


@settings(max_examples=8, deadline=None)
@given(rows=ev_rows)
def test_transition_matrix_oracle_on_random_events(spark, rows):
    from dbt_schema_builder_spark.operators import timeseries

    _check(
        spark,
        rows,
        entry.oracle_sql()["q_transition_matrix"],
        lambda ev: timeseries.transition_matrix(ev, gap_minutes=30),
    )


@settings(max_examples=8, deadline=None)
@given(rows=ev_rows)
def test_heavy_hitters_oracle_on_random_events(spark, rows):
    """Covers the r9-changed unrounded-frac oracle on denominators the
    fixture never shows (n_total down to 1)."""
    from dbt_schema_builder_spark.operators import relational

    _check(
        spark,
        rows,
        entry.oracle_sql()["q_heavy_hitters"],
        lambda ev: relational.heavy_hitters(ev, "event_type", support=0.1),
    )


@settings(max_examples=8, deadline=None)
@given(rows=ev_rows)
def test_trend_slope_oracle_on_random_events(spark, rows):
    """Covers the r10 raw-quotient slope incl. den==0 (single-day
    series) and negative numerators."""
    from dbt_schema_builder_spark.operators import profiling

    _check(
spark, rows, entry.oracle_sql()["q_trend_slope"], profiling.trend_slope)


@settings(max_examples=8, deadline=None)
@given(rows=ev_rows)
def test_histogram_oracle_on_random_events(spark, rows):
    from dbt_schema_builder_spark.operators import profiling

    _check(
spark, rows, entry.oracle_sql()["q_histogram"], profiling.value_histogram)


@settings(max_examples=8, deadline=None)
@given(rows=ev_rows)
def test_anomaly_events_oracle_on_random_events(spark, rows):
    """int64 milli z-test: micro values up to 1e8/1e6 = 100 and groups
    <= 40 rows sit far inside the documented headroom bound."""
    from dbt_schema_builder_spark.operators import profiling

    _check(
spark, rows, entry.oracle_sql()["q_anomaly_events"], profiling.sigma_outliers)


@settings(max_examples=8, deadline=None)
@given(rows=ev_rows)
def test_conversion_latency_oracle_on_random_events(spark, rows):
    from dbt_schema_builder_spark.operators import timeseries

    _check(
        spark,
        rows,
        entry.oracle_sql()["q_conversion_latency"],
        lambda ev: timeseries.conversion_latency(
            ev, steps=("view", "click", "purchase")
        ),
    )


@settings(max_examples=8, deadline=None)
@given(rows=ev_rows)
def test_interval_coverage_oracle_on_random_events(spark, rows):
    from dbt_schema_builder_spark.operators import temporal

    _check(
        spark,
        rows,
        entry.oracle_sql()["q_interval_coverage"],
        lambda ev: temporal.interval_coverage(ev, duration_minutes=5),
    )


@settings(max_examples=8, deadline=None)
@given(rows=ev_rows)
def test_json_extract_oracle_on_random_events(spark, rows):
    """Covers the r10 raw-quotient avg_k incl. all-null groups (NULL
    avg on both engines) and negative k values."""
    from dbt_schema_builder_spark.operators import json_ops

    _check(
spark, rows, entry.oracle_sql()["q_json_extract"], json_ops.props_stats_by_type)


@settings(max_examples=8, deadline=None)
@given(rows=ev_rows)
def test_gapfill_locf_oracle_on_random_events(spark, rows):
    from dbt_schema_builder_spark.operators import timeseries

    _check(
        spark,
        rows,
        entry.oracle_sql()["q_gapfill_locf"],
        lambda ev: timeseries.gapfill_locf(ev, bucket_minutes=15),
    )


@settings(max_examples=8, deadline=None)
@given(rows=ev_rows)
def test_rolling_active_oracle_on_random_events(spark, rows):
    from dbt_schema_builder_spark.operators import timeseries

    _check(
        spark,
        rows,
        entry.oracle_sql()["q_rolling_active"],
        lambda ev: timeseries.rolling_active_users(ev, window_days=7),
    )


@settings(max_examples=8, deadline=None)
@given(rows=ev_rows)
def test_sliding_window_oracle_on_random_events(spark, rows):
    from dbt_schema_builder_spark.operators import timeseries

    _check(
        spark,
        rows,
        entry.oracle_sql()["q_sliding_window"],
        timeseries.sliding_window_stats,
    )


@settings(max_examples=8, deadline=None)
@given(rows=ev_rows)
def test_cohort_retention_oracle_on_random_events(spark, rows):
    from dbt_schema_builder_spark.operators import timeseries

    _check(
        spark,
        rows,
        entry.oracle_sql()["q_cohort_retention"],
        timeseries.cohort_retention,
    )


@settings(max_examples=8, deadline=None)
@given(rows=ev_rows)
def test_scd2_oracle_on_random_events(spark, rows):
    """SCD-2 history: same-ts updates, single-row users, and
    consecutive-duplicate collapses all occur on random streams."""
    from dbt_schema_builder_spark.operators import temporal

    _check(
        spark, rows, entry.oracle_sql()["q_scd2"], temporal.scd2_history
    )


@settings(max_examples=8, deadline=None)
@given(rows=ev_rows)
def test_merge_latest_oracle_on_random_events(spark, rows):
    """MERGE latest-wins over the event_id%3 base/updates split the
    driver key uses — empty update sets and update-only users both
    occur on random streams."""
    from pyspark.sql import functions as F

    from dbt_schema_builder_spark.operators import temporal
    from dbt_schema_builder_spark.session import epoch_millis

    def op(ev):
        ev = ev.select("event_id", "ts", "user_id", "event_type", "value")
        base = ev.where(F.col("event_id") % 3 != 0)
        updates = ev.where(F.col("event_id") % 3 == 0)
        return temporal.merge_latest(base, updates, key="user_id").select(
            "user_id",
            epoch_millis(F.col("ts")).alias("ts_ms"),
            "event_type",
            "value",
            "event_id",
        )

    _check(spark, rows, entry.oracle_sql()["q_merge_latest"], op)


@settings(max_examples=8, deadline=None)
@given(rows=ev_rows)
def test_categorical_profile_oracle_on_random_events(spark, rows):
    """Integer-milli entropy/modal-share terms at tiny cardinalities
    (single-value columns -> zero entropy, modal share 1000)."""
    from dbt_schema_builder_spark.operators import profiling

    _check(
        spark,
        rows,
        entry.oracle_sql()["q_categorical_profile"],
        lambda ev: profiling.categorical_profile(
            ev, ["event_type", "user_id"]
        ),
    )


@settings(max_examples=8, deadline=None)
@given(rows=ev_rows)
def test_gapfill_interp_oracle_on_random_events(spark, rows):
    """Linear interpolation over integer micro sums: the FLOOR-over-
    double-division site (r4c lesson) on descending series and
    single-bucket axes."""
    from dbt_schema_builder_spark.operators import timeseries

    _check(
        spark,
        rows,
        entry.oracle_sql()["q_gapfill_interp"],
        lambda ev: timeseries.gapfill_interpolate(ev, bucket_minutes=15),
    )


@settings(max_examples=8, deadline=None)
@given(rows=ev_rows)
def test_asof_join_oracle_on_random_events(spark, rows):
    """The union+window ASOF composition vs DuckDB's NATIVE ASOF LEFT
    JOIN — same-ts click/purchase pairs are the boundary this
    differential exists for."""
    from pyspark.sql import functions as F

    from dbt_schema_builder_spark.operators import temporal
    from dbt_schema_builder_spark.session import epoch_millis

    def op(events):
        clicks = events.where("event_type = 'click'").select(
            "event_id", "user_id", "ts"
        )
        purchases = events.where("event_type = 'purchase'").select(
            "user_id", "ts", F.col("value").alias("purchase_value")
        )
        return temporal.asof_join(
            clicks, purchases, on_key="user_id", on_time="ts",
            right_cols=["purchase_value"],
        ).select(
            "event_id", "user_id",
            epoch_millis("ts").alias("ts_ms"),
            F.col("asof_purchase_value").alias("last_purchase_value"),
        )

    _check(spark, rows, entry.oracle_sql()["q_asof_join"], op)


@settings(max_examples=8, deadline=None)
@given(rows=ev_rows)
def test_range_join_oracle_on_random_events(spark, rows):
    """Interval boundaries: purchases exactly 0 and exactly 3600 s
    after a click occur on the minute grid."""
    from pyspark.sql import functions as F

    from dbt_schema_builder_spark.operators import temporal

    def op(events):
        clicks = events.where("event_type = 'click'").select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("cu"),
            F.col("ts").alias("click_ts"),
        )
        purchases = events.where("event_type = 'purchase'").select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("pu"),
            F.col("ts").alias("purchase_ts"),
        )
        return temporal.range_join(
            clicks, purchases, "cu", "pu", "click_ts", "purchase_ts", 3600
        ).select("click_id", "purchase_id")

    _check(spark, rows, entry.oracle_sql()["q_range_join"], op)


# ---------------------------------------------------------------------------
# orders-frame: the one profile key whose oracle reads `orders`
# ---------------------------------------------------------------------------

orders_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=20),        # o_custkey
        st.integers(min_value=-(10**9), max_value=10**9),  # price micros
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=8, deadline=None)
@given(rows=orders_rows)
def test_profile_oracle_on_random_orders(spark, rows):
    """profile_numeric's r10 raw surfaces (unrounded min/max passthrough
    + the det-avg raw quotient) on random frames: duplicate keys,
    negative prices, single-row frames — every small denominator."""
    import duckdb
    import pandas as pd

    from dbt_schema_builder_spark.operators import profiling

    data = [(k, micros / 1e6) for k, micros in rows]
    orders = spark.createDataFrame(
        data, "o_custkey long, o_totalprice double"
    )
    got = {
        tuple(r)
        for r in profiling.profile_numeric(
            orders, ["o_custkey", "o_totalprice"], exact_distinct=True
        ).collect()
    }
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_custkey": [r[0] for r in data],
                "o_totalprice": [r[1] for r in data],
            }
        ),
    )
    want = {
        tuple(r)
        for r in con.execute(entry.oracle_sql()["q_profile"]).fetchall()
    }
    assert got == want, got ^ want


# r10 continuation: the mad_outliers exemption converted on GRID values —
# INTEGER-valued doubles make every stage binary-exact in both engines:
# median = midpoint of ints (half grid), adev = |int - half| (half grid),
# MAD = midpoint of halves (quarter grid), 3.0*mad and the > compare are
# exact, and the quarter grid only hits even multiples of 0.5e-4 so the
# ROUND(.,4) surfaces cannot land on a half-boundary.
_mad_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=500),
        st.sampled_from(["view", "click"]),
        st.integers(min_value=-10000, max_value=10000),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=20, deadline=None)
@given(rows=_mad_rows)
def test_mad_outliers_oracle_on_integer_values(spark, rows):
    from dbt_schema_builder_spark.operators import profiling

    ev_rows = [
        (u, m, t, v * 10**6, None) for (u, m, t, v) in rows
    ]  # micros = whole units -> value column is an integer-valued double
    _check(
        spark,
        ev_rows,
        entry.oracle_sql()["q_mad_outliers"],
        profiling.mad_outliers,
    )
