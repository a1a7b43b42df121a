"""r10 continuation: random-frame differentials for the _STATIC_CONFIG
exemption category. The exemption reason was "pure projections/filters
with integer/string surfaces — the driver's two-SF hash exercises the
full surface", which is true of VALUES but not of engine semantics:
the r9/r10 finds (DECIMAL literals, regexp_replace 'g', banker's
round) were all semantic divergences that a fixed fixture can mask.
These keys get the same treatment as every other family — drive the
EXACT driver callable (``entry.queries()[k]``) with ``entry._t``
patched to serve hypothesis-random frames, compare against the key's
LIVE oracle string in DuckDB over identically registered pandas
frames.

Reuses the TPC-H harness's builders; adds custom frames where the
fixed builders can't reach the key's interesting domain (documents
for the regex anti-filter, free-form names for the scalar kernel,
NULL shipdates for the soft-delete filter, random nations for the
evolving reader).

q_catalog_scan's output is SCHEMA-derived and data-independent, so a
random-FRAME differential would be vacuous — its differential at the
bottom of this file randomizes the SCHEMAS instead (random column
sets through columns_catalog vs DuckDB's INFORMATION_SCHEMA).
"""

from __future__ import annotations

import contextlib
import datetime

import __spark_entry__ as entry
from hypothesis import given, settings, strategies as st

from test_tpch_differentials import (
    _build,
    _driver_tables,
    _pandas,
    _run_key,
    cust_attrs,
    event_attrs,
    line_attrs,
    order_attrs,
)

_BASE = datetime.datetime(1995, 1, 1)


@contextlib.contextmanager
def _custom_tables(spark, tables):
    """Like the TPC-H harness's _driver_tables but for hand-built
    frames: tables maps name -> (spark_df, pandas_df)."""
    import duckdb

    con = duckdb.connect()
    frames = {}
    for name, (sdf, pdf) in tables.items():
        frames[name] = sdf
        con.register(name, pdf)
    real_t = entry._t
    entry._t = lambda _spark, _sf_dir, name: frames[name]
    try:
        yield con
    finally:
        entry._t = real_t


# --- keys the fixed TPC-H/events builders already reach --------------------


@settings(max_examples=6, deadline=None)
@given(ev=event_attrs)
def test_include_filter_oracle_on_random_events(spark, ev):
    with _driver_tables(spark, events=ev) as con:
        _run_key(
            spark, con, "q_include_filter", entry.oracle_sql()["q_include_filter"]
        )


@settings(max_examples=6, deadline=None)
@given(ev=event_attrs)
def test_exclude_filter_oracle_on_random_events(spark, ev):
    with _driver_tables(spark, events=ev) as con:
        _run_key(
            spark, con, "q_exclude_filter", entry.oracle_sql()["q_exclude_filter"]
        )


@settings(max_examples=6, deadline=None)
@given(ev=event_attrs)
def test_banned_column_filter_oracle_on_random_events(spark, ev):
    with _driver_tables(spark, events=ev) as con:
        _run_key(
            spark,
            con,
            "q_banned_column_filter",
            entry.oracle_sql()["q_banned_column_filter"],
        )


@settings(max_examples=6, deadline=None)
@given(o=order_attrs)
def test_keyword_quoting_oracle_on_random_orders(spark, o):
    with _driver_tables(spark, orders=o) as con:
        _run_key(
            spark, con, "q_keyword_quoting", entry.oracle_sql()["q_keyword_quoting"]
        )


@settings(max_examples=6, deadline=None)
@given(o=order_attrs)
def test_dupe_detection_oracle_on_random_orders(spark, o):
    with _driver_tables(spark, orders=o) as con:
        _run_key(
            spark, con, "q_dupe_detection", entry.oracle_sql()["q_dupe_detection"]
        )


@settings(max_examples=6, deadline=None)
@given(c=cust_attrs)
def test_prefix_rename_oracle_on_random_customers(spark, c):
    with _driver_tables(spark, customer=c) as con:
        _run_key(
            spark, con, "q_prefix_rename", entry.oracle_sql()["q_prefix_rename"]
        )


@settings(max_examples=6, deadline=None)
@given(c=cust_attrs)
def test_chunked_union_oracle_on_random_customers(spark, c):
    with _driver_tables(spark, customer=c) as con:
        _run_key(
            spark, con, "q_chunked_union", entry.oracle_sql()["q_chunked_union"]
        )


@settings(max_examples=6, deadline=None)
@given(c=cust_attrs)
def test_pii_view_projection_oracle_on_random_customers(spark, c):
    with _driver_tables(spark, customer=c) as con:
        _run_key(
            spark,
            con,
            "q_pii_view_projection",
            entry.oracle_sql()["q_pii_view_projection"],
        )


@settings(max_examples=6, deadline=None)
@given(c=cust_attrs)
def test_safe_view_redaction_oracle_on_random_customers(spark, c):
    with _driver_tables(spark, customer=c) as con:
        _run_key(
            spark,
            con,
            "q_safe_view_redaction",
            entry.oracle_sql()["q_safe_view_redaction"],
        )


@settings(max_examples=5, deadline=None)
@given(c=cust_attrs, o=order_attrs)
def test_metadata_merge_join_oracle_on_random_frames(spark, c, o):
    with _driver_tables(spark, customer=c, orders=o) as con:
        _run_key(
            spark,
            con,
            "q_metadata_merge_join",
            entry.oracle_sql()["q_metadata_merge_join"],
        )


@settings(max_examples=6, deadline=None)
@given(li=line_attrs)
def test_sort_group_collect_oracle_on_random_lineitem(spark, li):
    with _driver_tables(spark, lineitem=li) as con:
        _run_key(
            spark,
            con,
            "q_sort_group_collect",
            entry.oracle_sql()["q_sort_group_collect"],
        )


@settings(max_examples=5, deadline=None)
@given(c=cust_attrs, o=order_attrs, li=line_attrs)
def test_schema_tests_oracle_on_random_frames(spark, c, o, li):
    with _driver_tables(spark, customer=c, orders=o, lineitem=li) as con:
        _run_key(
            spark, con, "q_schema_tests", entry.oracle_sql()["q_schema_tests"]
        )


# --- keys needing custom frames --------------------------------------------

_doc_sources = st.sampled_from(
    ["src1", "src1a", "src19", "src2", "xsrc1", "other", "src10x"]
)
doc_attrs = st.lists(
    st.tuples(_doc_sources, st.sampled_from(["en", "fr"])),
    min_size=0,
    max_size=12,
)

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _doc_frames(spark, attrs):
    import pandas as pd

    rows = [(i, "body", lang, src, 4) for i, (src, lang) in enumerate(attrs)]
    sdf = spark.createDataFrame(rows, DOC_SCHEMA)
    pdf = pd.DataFrame(
        {
            "doc_id": pd.Series([r[0] for r in rows], dtype="int64"),
            "text": pd.Series([r[1] for r in rows], dtype="object"),
            "lang": pd.Series([r[2] for r in rows], dtype="object"),
            "source": pd.Series([r[3] for r in rows], dtype="object"),
            "n_chars": pd.Series([r[4] for r in rows], dtype="int64"),
        }
    )
    return sdf, pdf


@settings(max_examples=6, deadline=None)
@given(attrs=doc_attrs)
def test_regex_anti_filter_oracle_on_random_sources(spark, attrs):
    """Anchored-regex anti-filter over sources that straddle the
    pattern boundary (src1 / src19 / xsrc1 / src2)."""
    with _custom_tables(spark, {"documents": _doc_frames(spark, attrs)}) as con:
        _run_key(
            spark,
            con,
            "q_regex_anti_filter",
            entry.oracle_sql()["q_regex_anti_filter"],
        )


_names = st.sampled_from(
    [
        "C alpha#1",
        "beta",
        "Cxx",
        "nine9",
        "no#hash#many",
        "#lead",
        "trail#",
        "Customer#42",
        "mixed C9#x",
        "",
    ]
)
name_attrs = st.lists(
    st.tuples(
        _names,
        st.integers(min_value=0, max_value=3),
        st.sampled_from(["BUILDING", "MACHINERY", "AUTOMOBILE"]),
    ),
    min_size=0,
    max_size=10,
)

CUST_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey int, "
    "c_acctbal double, c_mktsegment string"
)


def _cust_frames(spark, attrs):
    import pandas as pd

    rows = [
        (i, name, nk, 0.0, seg) for i, (name, nk, seg) in enumerate(attrs)
    ]
    sdf = spark.createDataFrame(rows, CUST_SCHEMA)
    pdf = pd.DataFrame(
        {
            "c_custkey": pd.Series([r[0] for r in rows], dtype="int64"),
            "c_name": pd.Series([r[1] for r in rows], dtype="object"),
            "c_nationkey": pd.Series([r[2] for r in rows], dtype="int64"),
            "c_acctbal": pd.Series([r[3] for r in rows], dtype="float64"),
            "c_mktsegment": pd.Series([r[4] for r in rows], dtype="object"),
        }
    )
    return sdf, pdf


@settings(max_examples=6, deadline=None)
@given(attrs=name_attrs)
def test_scalar_kernel_oracle_on_adversarial_names(spark, attrs):
    """upper/concat_ws/split/rlike/LIKE/IN over names that straddle
    every branch: leading/trailing/multiple '#', empty string, digits,
    C-prefix and not — the shapes the fixture's uniform Customer#N
    names never show."""
    with _custom_tables(spark, {"customer": _cust_frames(spark, attrs)}) as con:
        _run_key(
            spark, con, "q_scalar_kernel", entry.oracle_sql()["q_scalar_kernel"]
        )


LINE_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, "
    "l_tax double, l_returnflag string, l_linestatus string, "
    "l_shipdate timestamp"
)

nullable_line_attrs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # l_orderkey
        st.one_of(st.none(), st.integers(min_value=0, max_value=900)),  # day/None
    ),
    min_size=0,
    max_size=12,
)


def _line_frames(spark, attrs):
    import pandas as pd

    rows = [
        (
            ok,
            0,
            0,
            i,
            1.0,
            1.0,
            0.0,
            0.0,
            "N",
            "O",
            None if day is None else _BASE + datetime.timedelta(days=day),
        )
        for i, (ok, day) in enumerate(attrs)
    ]
    sdf = spark.createDataFrame(rows, LINE_SCHEMA)
    pdf = pd.DataFrame(
        {
            "l_orderkey": pd.Series([r[0] for r in rows], dtype="int64"),
            "l_partkey": pd.Series([r[1] for r in rows], dtype="int64"),
            "l_suppkey": pd.Series([r[2] for r in rows], dtype="int64"),
            "l_linenumber": pd.Series([r[3] for r in rows], dtype="int64"),
            "l_quantity": pd.Series([r[4] for r in rows], dtype="float64"),
            "l_extendedprice": pd.Series([r[5] for r in rows], dtype="float64"),
            "l_discount": pd.Series([r[6] for r in rows], dtype="float64"),
            "l_tax": pd.Series([r[7] for r in rows], dtype="float64"),
            "l_returnflag": pd.Series([r[8] for r in rows], dtype="object"),
            "l_linestatus": pd.Series([r[9] for r in rows], dtype="object"),
            "l_shipdate": pd.Series([r[10] for r in rows], dtype="datetime64[us]"),
        }
    )
    return sdf, pdf


@settings(max_examples=6, deadline=None)
@given(attrs=nullable_line_attrs)
def test_soft_delete_filter_oracle_on_nullable_shipdates(spark, attrs):
    """The soft-delete predicate (l_shipdate IS NOT NULL) finally sees
    actual NULLs — the fixture has none, so the filter was a no-op in
    every driver run to date."""
    with _custom_tables(spark, {"lineitem": _line_frames(spark, attrs)}) as con:
        _run_key(
            spark,
            con,
            "q_soft_delete_filter",
            entry.oracle_sql()["q_soft_delete_filter"],
        )


NATION_SCHEMA = "n_nationkey int, n_name string, n_regionkey int"

nation_attrs = st.lists(
    st.tuples(
        st.sampled_from(["BRAZIL", "JAPAN", "INDIA", "FRANCE", "KENYA"]),
        st.integers(min_value=0, max_value=4),
    ),
    min_size=0,
    max_size=8,
)


def _nation_frames(spark, attrs):
    import pandas as pd

    rows = [(i, name, rk) for i, (name, rk) in enumerate(attrs)]
    sdf = spark.createDataFrame(rows, NATION_SCHEMA)
    pdf = pd.DataFrame(
        {
            "n_nationkey": pd.Series([r[0] for r in rows], dtype="int64"),
            "n_name": pd.Series([r[1] for r in rows], dtype="object"),
            "n_regionkey": pd.Series([r[2] for r in rows], dtype="int64"),
        }
    )
    return sdf, pdf


@settings(max_examples=4, deadline=None)
@given(attrs=nation_attrs)
def test_evolving_read_oracle_on_random_nations(spark, attrs):
    """Schema-evolution reader over REAL two-batch parquet written from
    a random nation frame — mergeSchema + typed default must equal the
    self-union oracle for any content, not just the fixture's."""
    with _custom_tables(spark, {"nation": _nation_frames(spark, attrs)}) as con:
        _run_key(
            spark, con, "q_evolving_read", entry.oracle_sql()["q_evolving_read"]
        )


# --- q_catalog_scan: random SCHEMAS (random frames would be vacuous) --------

_ident = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "k1", "k2", "val", "name", "ts_col", "x9"]
)
_tbl_schemas = st.fixed_dictionaries(
    {
        name: st.lists(_ident, min_size=1, max_size=6, unique=True)
        for name in (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        )
    }
)


@settings(max_examples=6, deadline=None)
@given(schemas=_tbl_schemas)
def test_catalog_scan_oracle_on_random_schemas(spark, schemas):
    """The catalog surface is data-independent, so this differential
    randomizes the SCHEMAS instead: the driver callable's
    columns_catalog derivation (names + 1-based ordinals) over
    arbitrary column sets must equal DuckDB's INFORMATION_SCHEMA view
    of identically-shaped registered relations."""
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    frames = {}
    for name, cols in schemas.items():
        frames[name] = spark.createDataFrame(
            [], ", ".join(f"{c} string" for c in cols)
        )
        con.register(
            name,
            pd.DataFrame({c: pd.Series([], dtype="object") for c in cols}),
        )
    real_lt = entry.load_tables
    entry.load_tables = lambda _spark, _sf_dir, names=None: frames
    try:
        _run_key(
            spark, con, "q_catalog_scan", entry.oracle_sql()["q_catalog_scan"]
        )
    finally:
        entry.load_tables = real_lt
