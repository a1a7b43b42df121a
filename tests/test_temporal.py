"""As-of / range join behavioral tests (exact-tie semantics, tolerance,
key isolation)."""

import datetime

from pyspark.sql import functions as F

from dbt_schema_builder_spark.operators import temporal


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_backward_semantics(spark):
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    left = _df(
        spark,
        [(1, 100, ts(10)), (2, 100, ts(5)), (3, 200, ts(10))],
        "id bigint, k bigint, ts timestamp",
    )
    right = _df(
        spark,
        [(100, ts(7), 7.0), (100, ts(10), 10.0), (200, ts(11), 11.0)],
        "k bigint, ts timestamp, v double",
    )
    out = {
        r.id: r.asof_v
        for r in temporal.asof_join(
            left, right, "k", "ts", ["v"]
        ).collect()
    }
    assert out[1] == 10.0  # exact tie at ts(10) matches (>= semantics)
    assert out[2] is None  # nothing at or before ts(5)
    assert out[3] is None  # key 200's only right row is later


def test_asof_tolerance(spark):
    t0 = datetime.datetime(2024, 1, 1)
    left = _df(
        spark,
        [(1, 1, t0 + datetime.timedelta(hours=3))],
        "id bigint, k bigint, ts timestamp",
    )
    right = _df(
        spark, [(1, t0, 5.0)], "k bigint, ts timestamp, v double"
    )
    with_tol = temporal.asof_join(
        left, right, "k", "ts", ["v"], tolerance_seconds=3600
    ).collect()[0]
    without = temporal.asof_join(left, right, "k", "ts", ["v"]).collect()[0]
    assert with_tol[3] is None  # 3h-old match outside 1h tolerance
    assert without.asof_v == 5.0


def test_range_join_band(spark, tables):
    events = tables["events"]
    clicks = events.where("event_type = 'click'").select(
        F.col("event_id").alias("cid"), F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    purchases = events.where("event_type = 'purchase'").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"),
    )
    out = temporal.range_join(
        clicks, purchases, "cu", "pu", "cts", "pts", 3600
    )
    rows = out.collect()
    for r in rows:
        gap = (r.pts - r.cts).total_seconds()
        assert 0 <= gap <= 3600
        assert r.cu == r.pu


def test_merge_latest_upsert_semantics(spark):
    from dbt_schema_builder_spark.operators import temporal

    base = spark.createDataFrame(
        [(1, 100, 10, "old", 1.0), (2, 200, 20, "keep", 2.0)],
        "event_id long, ts long, user_id long, event_type string, value double",
    )
    updates = spark.createDataFrame(
        [
            (3, 150, 10, "newer", 9.0),   # updates user 10
            (4, 50, 20, "stale", 0.0),    # older than base -> ignored
            (5, 70, 30, "insert", 3.0),   # brand-new key
            (6, 70, 30, "insert2", 4.0),  # same ts: event_id tiebreak wins
        ],
        "event_id long, ts long, user_id long, event_type string, value double",
    )
    out = {r.user_id: r for r in temporal.merge_latest(
        base, updates, key="user_id", ts="ts").collect()}
    assert out[10].event_type == "newer"
    assert out[20].event_type == "keep"
    assert out[30].event_type == "insert2"  # ts tie -> higher event_id
    assert len(out) == 3
