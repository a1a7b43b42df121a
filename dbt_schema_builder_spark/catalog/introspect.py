"""Catalog introspection as DataFrames.

The reference fetches ``(TABLE_NAME, COLUMN_NAME, ORDINAL_POSITION)`` from
Snowflake's INFORMATION_SCHEMA.COLUMNS, ordered server-side, optionally
split into 27 first-letter chunks when one query returns too much data
(reference queries.py:11-33, builder.py:40-174). On Spark the catalog is
driver-side metadata (parquet footers / ``spark.catalog``), so the same
surface is a small DataFrame built from ``df.schema`` — but the *operators*
(anti-filter pushdown, sort-based group-collect, chunked union) are kept as
real distributed DataFrame transforms so they apply to data-level queries
too.
"""

from __future__ import annotations

import string
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

CATALOG_SCHEMA = StructType(
    [
        StructField("table_name", StringType(), False),
        StructField("column_name", StringType(), False),
        StructField("ordinal", IntegerType(), False),
    ]
)

# First-letter chunking alphabet (reference builder.py:101-147: "_" plus
# A..Z; "_" is LIKE-escaped with "^" at builder.py:32,111-114).
CHUNK_LETTERS = ("_",) + tuple(string.ascii_uppercase)


def columns_catalog(
    spark: SparkSession, tables: dict[str, DataFrame]
) -> DataFrame:
    """Build the columns catalog (table_name, column_name, ordinal) for a
    set of relations — the Spark equivalent of the reference's
    INFORMATION_SCHEMA scan (queries.py:11-20). Ordinals are 1-based like
    ORDINAL_POSITION."""
    rows = [
        (name, field.name, i + 1)
        for name, df in tables.items()
        for i, field in enumerate(df.schema.fields)
    ]
    return spark.createDataFrame(rows, CATALOG_SCHEMA)


def catalog_from_session(
    spark: SparkSession, tables: list[str] | None = None
) -> DataFrame:
    """Columns catalog for tables/views registered in the live session
    catalog — the direct analog of the reference's INFORMATION_SCHEMA
    query against the warehouse (queries.py:11-20): same three columns,
    same ordering contract, but read from ``spark.catalog`` metadata
    (driver-side, no fallback chunking needed — reference builder.py
    101-147's too-much-data re-plan is obsolete here)."""
    if tables is None:
        tables = [t.name for t in spark.catalog.listTables()]
    rows = [
        (t, c.name, i + 1)
        for t in tables
        for i, c in enumerate(spark.catalog.listColumns(t))
    ]
    return spark.createDataFrame(rows, CATALOG_SCHEMA).orderBy(
        "table_name", "ordinal"
    )


def coerce_decimal(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Decimal-to-double coercion — the reference applies
    ``dbt.utils._coerce_decimal`` to every catalog cell (builder.py:92-97;
    its fallback twin at builder.py:142 is a latent NameError). On Spark
    the coercion is a typed cast applied to DecimalType columns."""
    from pyspark.sql.types import DecimalType

    targets = columns or [
        f.name for f in df.schema.fields if isinstance(f.dataType, DecimalType)
    ]
    out = df
    for c in targets:
        out = out.withColumn(c, F.col(c).cast("double"))
    return out


def banned_column_filter(catalog: DataFrame, banned: list[str]) -> DataFrame:
    """Anti-filter on banned column names, composed into the scan like the
    reference's ``COLUMN_NAME NOT IN (...)`` fragment (queries.py:6-8,
    builder.py:58-70). Case-insensitive, as Snowflake identifiers are."""
    if not banned:
        return catalog
    banned_upper = [b.upper() for b in banned]
    return catalog.where(~F.upper(F.col("column_name")).isin(banned_upper))


def group_collect(catalog: DataFrame) -> DataFrame:
    """Sort-based group-collect: per table, the ordinal-ordered column list
    (reference builder.py:453-474 streaming over rows pre-sorted at
    queries.py:19). Expressed as ``sort_array(collect_list(struct(...)))``
    so Catalyst plans a single hash aggregation with partial (map-side)
    combine — no global sort needed."""
    return catalog.groupBy("table_name").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ordinal", "column_name"))),
            lambda s: s["column_name"],
        ).alias("columns")
    )


def chunked_scan(
    df: DataFrame, column: str, letters: tuple[str, ...] = CHUNK_LETTERS
) -> DataFrame:
    """Re-plan a scan as per-first-letter slices unioned back together — the
    reference's too-much-data fallback (builder.py:101-147, 163-172;
    queries.py:23-33). Spark never needs this (scans split into tasks
    automatically), but the operator is kept for parity: the union of the
    27 ``startswith`` slices must hash-equal the full scan. Catalyst
    collapses the union of disjoint filters over the same source into
    parallel scan tasks."""
    slices = [
        df.where(F.upper(F.col(column)).startswith(letter)) for letter in letters
    ]
    # rows whose first letter is outside the alphabet (digits, punctuation)
    # — the reference's full-scan fallback would have caught these; keep
    # exact equivalence with the full relation.
    known = F.upper(F.substring(F.col(column), 1, 1)).isin(list(letters))
    slices.append(df.where(~known | F.col(column).isNull()))
    return reduce(DataFrame.unionAll, slices)
