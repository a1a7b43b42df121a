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
