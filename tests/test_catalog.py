"""Catalog layer tests (reference builder.py:40-174, queries.py)."""

from dbt_schema_builder_spark.catalog import (
    banned_column_filter,
    chunked_scan,
    columns_catalog,
    group_collect,
)


def test_columns_catalog_shape(spark, tables):
    cat = columns_catalog(spark, {"customer": tables["customer"]})
    rows = {(r.column_name, r.ordinal) for r in cat.collect()}
    assert ("c_custkey", 1) in rows
    assert ("c_mktsegment", 5) in rows


def test_banned_column_filter(spark, tables):
    cat = columns_catalog(spark, {"events": tables["events"]})
    filtered = banned_column_filter(cat, ["PROPS"])
    names = [r.column_name for r in filtered.collect()]
    assert "props" not in names and "event_id" in names


def test_group_collect_ordinal_order(spark, tables):
    cat = columns_catalog(
        spark, {"customer": tables["customer"], "region": tables["region"]}
    )
    out = {r.table_name: r.columns for r in group_collect(cat).collect()}
    assert out["customer"] == list(tables["customer"].columns)
    assert out["region"] == ["r_regionkey", "r_name"]


def test_catalog_from_session(spark, tables):
    from dbt_schema_builder_spark.catalog import catalog_from_session

    tables["region"].createOrReplaceTempView("cat_region_v")
    cat = catalog_from_session(spark, ["cat_region_v"]).collect()
    assert [(r.column_name, r.ordinal) for r in cat] == [
        ("r_regionkey", 1), ("r_name", 2),
    ]


def test_coerce_decimal(spark):
    from decimal import Decimal

    from dbt_schema_builder_spark.catalog import coerce_decimal

    df = spark.createDataFrame(
        [(Decimal("1.50"), "x")], "d decimal(10,2), s string"
    )
    out = coerce_decimal(df)
    assert dict(out.dtypes) == {"d": "double", "s": "string"}
    assert out.collect()[0].d == 1.5


def test_chunked_scan_equals_full_scan(spark, tables):
    cust = tables["customer"]
    chunked = chunked_scan(cust, "c_name")
    assert chunked.count() == cust.count()
    assert chunked.exceptAll(cust).count() == 0
    assert cust.exceptAll(chunked).count() == 0


def test_chunked_scan_wildcard_prefix_names(spark):
    """The reference's chunked scan needed LIKE ... ESCAPE '^' because
    '_'/'%'-prefixed names are LIKE wildcards (builder.py:111-114).
    chunked_scan uses literal startswith, so wildcard-looking prefixes
    must fall through to the outside-alphabet slice and the union must
    still equal the full relation exactly."""
    from dbt_schema_builder_spark.catalog import chunked_scan

    df = spark.createDataFrame(
        [
            ("_underscore",),
            ("%percent",),
            ("^caret",),
            ("9digit",),
            ("Alpha",),
            ("zulu",),
            (None,),
            ("",),
        ],
        "name string",
    )
    chunked = chunked_scan(df, "name")
    assert chunked.count() == df.count()
    assert chunked.exceptAll(df).count() == 0
    assert df.exceptAll(chunked).count() == 0
    # '_foo' must NOT match more than itself anywhere (no LIKE semantics):
    # each wildcard-prefixed row appears exactly once in the union
    names = [r.name for r in chunked.collect()]
    assert names.count("_underscore") == 1 and names.count("%percent") == 1
