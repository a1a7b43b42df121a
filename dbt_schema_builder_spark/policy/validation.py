"""Schema-test operators — the dbt test surface run natively on Spark.

The reference emits dbt schema YAML whose tables users annotate with
tests (unique, not_null, accepted_values, relationships) that ``dbt
test`` later compiles to warehouse SQL (reference app.py:46-53 carries
the metadata; docs/index.rst describes the dbt workflow). The engine
runs the same four test primitives directly as DataFrame aggregations —
one violation count per test, all scans pruned to the tested columns.

Each primitive returns the number of violating rows; ``run_suite``
evaluates a list of tests into one small result DataFrame.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def not_null_violations(df: DataFrame, column: str) -> int:
    return df.where(F.col(column).isNull()).count()


def unique_violations(df: DataFrame, column: str) -> int:
    """Rows beyond the first per key (dbt counts duplicated rows)."""
    dup = (
        df.groupBy(column)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("total"))
    )
    return dup.collect()[0]["total"]


def accepted_values_violations(
    df: DataFrame, column: str, values: list
) -> int:
    return df.where(~F.col(column).isin(values)).count()


def relationship_violations(
    df: DataFrame, column: str, ref: DataFrame, ref_column: str
) -> int:
    """Orphaned foreign keys: non-null values with no match in the
    referenced relation (left anti join — the probe side never
    materializes payload)."""
    keys = ref.select(F.col(ref_column).alias(column)).distinct()
    return (
        df.select(column)
        .where(F.col(column).isNotNull())
        .join(keys, on=column, how="left_anti")
        .count()
    )


@dataclass
class SchemaTest:
    name: str
    kind: str  # not_null | unique | accepted_values | relationships
    table: str
    column: str
    values: list = field(default_factory=list)
    ref_table: str | None = None
    ref_column: str | None = None


def run_suite(
    spark: SparkSession, tables: dict[str, DataFrame], tests: list[SchemaTest]
) -> DataFrame:
    """Evaluate a test suite; returns (test_name, n_violations, passed)."""
    rows = []
    for t in tests:
        df = tables[t.table]
        if t.kind == "not_null":
            n = not_null_violations(df, t.column)
        elif t.kind == "unique":
            n = unique_violations(df, t.column)
        elif t.kind == "accepted_values":
            n = accepted_values_violations(df, t.column, t.values)
        elif t.kind == "relationships":
            n = relationship_violations(
                df, t.column, tables[t.ref_table], t.ref_column
            )
        else:
            raise ValueError(f"unknown test kind {t.kind!r}")
        rows.append((t.name, int(n), n == 0))
    return spark.createDataFrame(
        rows, "test_name string, n_violations bigint, passed boolean"
    )
