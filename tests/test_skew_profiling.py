"""Skew-mitigation and profiling operator tests: salted variants must be
exactly equivalent to their plain counterparts."""

from pyspark.sql import functions as F

from dbt_schema_builder_spark.operators import profiling, skew


def test_salted_sum_equals_plain_sum(spark, tables):
    got = skew.salted_sum(tables["orders"], "o_custkey", "o_totalprice")
    want = (
        tables["orders"]
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("sum_o_totalprice"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_join_equals_plain_join(spark, tables):
    orders = tables["orders"].select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    cust = tables["customer"].select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    got = skew.salted_join(orders, cust, "custkey")
    want = orders.join(cust, "custkey")
    assert got.count() == want.count()
    g = got.groupBy("c_mktsegment").count().collect()
    w = want.groupBy("c_mktsegment").count().collect()
    assert sorted(map(tuple, g)) == sorted(map(tuple, w))


def test_salted_sum_spreads_hot_key(spark):
    # a 100%-skewed input: every row has the same key
    df = spark.range(10000).select(
        F.lit(1).alias("k"), F.col("id").cast("double").alias("v")
    )
    got = skew.salted_sum(df, "k", "v", salt_buckets=8).collect()
    assert len(got) == 1
    assert got[0]["sum_v"] == sum(range(10000))


def test_profile_numeric(spark, tables):
    prof = profiling.profile_numeric(tables["orders"], ["o_totalprice"])
    row = prof.collect()[0]
    assert row.column_name == "o_totalprice"
    assert row.n == tables["orders"].count()
    assert row.n_null == 0
    assert row.min_value <= row.avg_value <= row.max_value


def test_approx_quantiles_ordered(spark, tables):
    q = profiling.approx_quantiles(tables["orders"], "o_totalprice")
    vals = [r.value for r in q.orderBy("probability").collect()]
    assert vals == sorted(vals)
    assert len(vals) == 5


def test_value_histogram_partitions_rows_and_clamps(spark):
    """Every row lands in exactly one bin (counts sum to the row count),
    edges are bin*width, and values past the top edge clamp into the
    open-ended last bin instead of minting new group keys."""
    df = spark.createDataFrame(
        [("a", 0.0), ("a", 49.99), ("a", 50.0), ("a", 120.0),
         ("a", 9999.0), ("b", 475.0)],
        "event_type string, value double",
    )
    rows = {
        (r.group_key, r.bin): (r.bin_lo, r.bin_hi, r.n)
        for r in profiling.value_histogram(df).collect()
    }
    assert sum(v[2] for v in rows.values()) == 6
    assert rows[("a", 0)] == (0.0, 50.0, 2)  # 0.0 and 49.99
    assert rows[("a", 1)] == (50.0, 100.0, 1)  # exact edge goes UP
    assert rows[("a", 2)][2] == 1  # 120.0
    assert rows[("a", 9)][2] == 1  # 9999.0 clamped into top bin
    assert rows[("b", 9)] == (450.0, 500.0, 1)


def test_sigma_outliers_flags_exactly_the_k_sigma_rows(spark):
    """The integer cross-multiplied inequality must reproduce the float
    z-test exactly: a planted far outlier among tight values flags, the
    tight values don't, and singleton groups never flag (n < 2)."""
    import statistics

    # n must be large enough that one outlier CAN exceed 3 sigma: the
    # population z of a single extreme point is bounded by (n-1)/sqrt(n)
    # (< 3 for n <= 10), so a 7-point group can never flag anything
    vals = [10.0 + 0.01 * i for i in range(20)] + [500.0]
    rows = [(i, 1, v) for i, v in enumerate(vals)] + [(99, 2, 123.0)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    got = {
        r.event_id: r.is_outlier
        for r in profiling.sigma_outliers(df).collect()
    }
    mu = statistics.fmean(vals)
    var = statistics.pvariance(vals)
    for i, v in enumerate(vals):
        assert got[i] == int((v - mu) ** 2 > 9 * var), (i, v)
    assert got[len(vals) - 1] == 1  # the planted outlier actually flags
    assert all(got[i] == 0 for i in range(len(vals) - 1))  # tight values
    assert got[99] == 0  # singleton group: no variance, no flag
