"""The generated SQL artifacts are executable Spark SQL, and executing
them produces exactly the same result as the DataFrame-built views —
pinning that the two representations of the policy pipeline agree
(reference emits SQL text for dbt to run; our text must be live)."""

import pytest

from dbt_schema_builder_spark.config import AppPolicy, SourcePolicy
from dbt_schema_builder_spark.views import TrifectaBuilder


@pytest.fixture()
def policy():
    return AppPolicy(
        app="EXEC",
        sources={
            "RAW": SourcePolicy(
                name="RAW",
                include=["customer", "lineitem"],
                soft_delete=("l_shipdate", "IS NOT NULL"),
            )
        },
        redactions={"EXEC.CUSTOMER": {"C_NAME": "<redacted>", "C_ACCTBAL": 0}},
    )


def test_generated_sql_executes_and_matches_dataframe_views(
    spark, tables, policy
):
    builder = TrifectaBuilder(spark, policy)
    result = builder.materialize(
        {"customer": tables["customer"], "lineitem": tables["lineitem"]}
    )
    for view_name, sql in result.sql.items():
        df_rows = sorted(map(tuple, result.views[view_name].collect()))
        # re-create the view from the generated SQL text and compare
        spark.sql(sql)
        sql_rows = sorted(map(tuple, spark.table(view_name).collect()))
        assert sql_rows == df_rows, view_name


def test_redaction_literals_with_quotes_survive_sql_roundtrip(spark, tables):
    """A redaction literal containing (or starting/ending with) single
    quotes must execute as valid SQL and come back byte-identical —
    quote-doubling escape, never strip(\"'\"). Also pins that a malicious-
    looking literal stays a literal (no SQL injection through config)."""
    tricky = {
        "C_NAME": "it's ''already'' quoted",
        "C_MKTSEGMENT": "'; DROP TABLE x; --",
    }
    policy = AppPolicy(
        app="QUOT",
        sources={"RAW": SourcePolicy(name="RAW", include=["customer"])},
        redactions={"QUOT.CUSTOMER": tricky},
    )
    builder = TrifectaBuilder(spark, policy)
    result = builder.materialize({"customer": tables["customer"]})
    safe_name = builder.view_name("customer", pii=False)
    spark.sql(result.sql[safe_name])  # must parse and execute
    row = spark.table(safe_name).first()
    assert row["C_NAME"] == "it's ''already'' quoted"
    assert row["C_MKTSEGMENT"] == "'; DROP TABLE x; --"
