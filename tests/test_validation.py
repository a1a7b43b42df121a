"""dbt-test-analog validation primitives: each must count violations
exactly, including on inputs constructed to violate."""

from dbt_schema_builder_spark.policy.validation import (
    SchemaTest,
    accepted_values_violations,
    not_null_violations,
    relationship_violations,
    run_suite,
    unique_violations,
)


def test_clean_star_schema_passes(spark, tables):
    suite = [
        SchemaTest("u", "unique", "customer", "c_custkey"),
        SchemaTest("n", "not_null", "orders", "o_orderkey"),
        SchemaTest(
            "r", "relationships", "lineitem", "l_orderkey",
            ref_table="orders", ref_column="o_orderkey",
        ),
    ]
    out = run_suite(
        spark,
        {k: tables[k] for k in ("customer", "orders", "lineitem")},
        suite,
    )
    assert all(r.passed for r in out.collect())


def test_violations_counted_exactly(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, None), (3, "x"), (3, "y"), (3, "z")],
        "k bigint, v string",
    )
    assert unique_violations(df, "k") == 5  # 2 + 3 duplicated rows
    assert not_null_violations(df, "v") == 1
    # NULLs are not accepted-values violations (dbt semantics: not_null
    # is its own test; ~isin(NULL) is NULL and filters out)
    assert accepted_values_violations(df, "v", ["a", "b", "x"]) == 2
    ref = spark.createDataFrame([(1,), (2,)], "k bigint")
    assert relationship_violations(df, "k", ref, "k") == 3  # the three 3s
