"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship trifecta pipeline on sf0.001 (smoke).
``queries()`` — one entry per implemented operator from SURVEY.md section 2;
each callable takes (spark, sf_dir) and returns a DataFrame.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query key; keys without an
oracle get the driver's weaker rows-only check.

Column names are aliased identically on both sides; float aggregates are
rounded on both sides so the order-insensitive value hash is stable across
engines.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbt_schema_builder_spark.catalog import (  # noqa: E402
    banned_column_filter,
    chunked_scan,
    columns_catalog,
)
from dbt_schema_builder_spark.config import AppPolicy, SourcePolicy  # noqa: E402
from dbt_schema_builder_spark.multimodal import (  # noqa: E402
    attach_fake_image_bytes,
    audio_features,
    image_features,
    sample_frames,
)
from dbt_schema_builder_spark.operators import (  # noqa: E402
    classifier,
    dedup,
    graph,
    json_ops,
    profiling,
    relational,
    similarity,
    skew,
    temporal,
    text,
    timeseries,
    udf,
)
from dbt_schema_builder_spark.policy.metadata import (  # noqa: E402
    find_duplicates,
    metadata_merge_join,
)
from dbt_schema_builder_spark.session import (  # noqa: E402
    epoch_millis,
    load_tables,
    read_table,
)
from dbt_schema_builder_spark.views import TrifectaBuilder  # noqa: E402


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, f"{sf_dir}/{name}.parquet")


def _flagship_policy() -> AppPolicy:
    return AppPolicy(
        app="MAIN",
        sources={"RAW": SourcePolicy(name="RAW", include=["customer", "orders"])},
        redactions={"MAIN.CUSTOMER": {"C_NAME": "<redacted>", "C_ACCTBAL": 0}},
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: catalog -> policy -> trifecta views -> aggregate query over
    the SAFE view, on sf0.001 (driver checks rows > 0)."""
    sf_dir = "/root/testdata/sf0.001"
    tables = load_tables(spark, sf_dir, ("customer", "orders"))
    builder = TrifectaBuilder(spark, _flagship_policy())
    builder.materialize(tables)
    safe_customer = spark.table("MAIN__CUSTOMER")
    orders = spark.table("MAIN_PII__ORDERS")
    return (
        safe_customer.join(
            orders, safe_customer.c_custkey == orders.o_custkey, "inner"
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# Tier A — reference surface (SURVEY.md section 2, Tier A)
# ---------------------------------------------------------------------------

_CUSTOMER_COLS = "c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment"


def q_pii_view_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: pass-through projection via the trifecta PII view."""
    builder = TrifectaBuilder(spark, _flagship_policy())
    builder.materialize({"customer": _t(spark, sf_dir, "customer")})
    return spark.table("MAIN_PII__CUSTOMER")


def q_safe_view_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: redaction projection via the trifecta SAFE view."""
    builder = TrifectaBuilder(spark, _flagship_policy())
    builder.materialize({"customer": _t(spark, sf_dir, "customer")})
    return spark.table("MAIN__CUSTOMER")


def q_soft_delete_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15: soft-delete row filter through the trifecta pipeline."""
    policy = AppPolicy(
        app="SD",
        sources={
            "RAW": SourcePolicy(
                name="RAW",
                include=["lineitem"],
                soft_delete=("l_shipdate", "IS NOT NULL"),
            )
        },
    )
    TrifectaBuilder(spark, policy).materialize(
        {"lineitem": _t(spark, sf_dir, "lineitem")}
    )
    return spark.table("SD__LINEITEM")


def q_banned_column_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: banned columns never reach the projection (events minus props)."""
    events = _t(spark, sf_dir, "events")
    cat = banned_column_filter(
        columns_catalog(spark, {"events": events}), ["PROPS"]
    )
    keep = [r.column_name for r in cat.orderBy("ordinal").collect()]
    return events.select(*keep)


def q_include_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 data-level analog: semi-filter on an allow list."""
    return (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "view", "purchase"))
        .select("event_id", "event_type", "user_id", "value")
    )


def q_exclude_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 data-level analog: anti-filter on a deny list."""
    return (
        _t(spark, sf_dir, "events")
        .where(~F.col("event_type").isin("error", "signup"))
        .select("event_id", "event_type", "user_id", "value")
    )


def q_chunked_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A19: 27-way first-letter chunked scan unioned == full scan."""
    return chunked_scan(_t(spark, sf_dir, "customer"), "c_name")


def q_sort_group_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A20: ordered group-collect (per order, its linenumbers in order)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("l_linenumber")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("linenumbers")
        )
    )


def q_prefix_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: PREFIX_NAME aliasing (values unchanged)."""
    return _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("evt_c_custkey"),
        F.col("c_name").alias("evt_c_name"),
        F.col("c_mktsegment").alias("evt_c_mktsegment"),
    )


def q_keyword_quoting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: reserved-word column names survive via quoting."""
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("order"),
        F.col("o_orderpriority").alias("group"),
    )


def q_regex_anti_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: anchored-regex anti-filter (documents not from src1x sources)."""
    return (
        _t(spark, sf_dir, "documents")
        .where(~F.col("source").rlike("^src1.*$"))
        .select("doc_id", "source", "lang")
    )


def q_scalar_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A25: the complete scalar surface — upper, concat, split, regex,
    LIKE-prefix, IN-list."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.concat_ws("_", F.col("c_mktsegment"), F.col("c_nationkey").cast("string"))
        .alias("seg_key"),
        F.split(F.col("c_name"), "#").getItem(0).alias("first_tok"),
        F.col("c_name").rlike("[0-9]").alias("has_digit"),
        F.col("c_name").like("C%").alias("like_c"),
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY").alias("seg_known"),
    )


def q_metadata_merge_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16 data-level analog: left join + coalesce-to-default."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    prior = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_name").alias("cust_name"),
        F.col("c_mktsegment").alias("segment"),
    )
    return metadata_merge_join(
        orders,
        prior,
        on="o_custkey",
        attrs=["cust_name", "segment"],
        defaults={"cust_name": "<new>", "segment": "UNKNOWN"},
    )


def q_dupe_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A18: keys seen more than once."""
    return find_duplicates(_t(spark, sf_dir, "orders"), ["o_custkey"])


def q_schema_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt-test analog run natively: unique / not_null / accepted_values /
    relationships over the star schema."""
    from dbt_schema_builder_spark.policy.validation import SchemaTest, run_suite

    tables = {
        "customer": _t(spark, sf_dir, "customer"),
        "orders": _t(spark, sf_dir, "orders"),
        "lineitem": _t(spark, sf_dir, "lineitem"),
    }
    suite = [
        SchemaTest("customer_key_unique", "unique", "customer", "c_custkey"),
        SchemaTest("orders_key_not_null", "not_null", "orders", "o_orderkey"),
        SchemaTest(
            "order_status_accepted", "accepted_values", "orders",
            "o_orderstatus", values=["F", "O", "P"],
        ),
        SchemaTest(
            "orders_custkey_refs_customer", "relationships", "orders",
            "o_custkey", ref_table="customer", ref_column="c_custkey",
        ),
        SchemaTest(
            "lineitem_orderkey_refs_orders", "relationships", "lineitem",
            "l_orderkey", ref_table="orders", ref_column="o_orderkey",
        ),
    ]
    return run_suite(spark, tables, suite)


def q_catalog_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the columns catalog itself, oracle-checked against DuckDB's
    INFORMATION_SCHEMA.COLUMNS over the same registered relations — the
    exact analog of the reference's catalog query (queries.py:11-20)."""
    return columns_catalog(spark, load_tables(spark, sf_dir)).orderBy(
        "table_name", "ordinal"
    )


# ---------------------------------------------------------------------------
# Tier B — relational / time / JSON (SURVEY.md section 2, Tier B)
# ---------------------------------------------------------------------------


def q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.star_join_revenue(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )


def q_hash_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.pricing_summary(_t(spark, sf_dir, "lineitem"))


def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.semi_anti_customers(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.rollup_order_stats(_t(spark, sf_dir, "orders"))


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.cube_order_stats(_t(spark, sf_dir, "orders"))


def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return timeseries.sliding_window_stats(_t(spark, sf_dir, "events"))


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL surface (B8): exactly the
    two named sets, not the full cube."""
    _register(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               ROUND(SUM(o_totalprice), 2) AS total_price,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.top_orders_per_customer(_t(spark, sf_dir, "orders"), k=3)


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.running_customer_totals(_t(spark, sf_dir, "orders"))


def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.top_k_orders(_t(spark, sf_dir, "orders"), k=10)


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.customer_set_ops(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.pivot_event_counts(_t(spark, sf_dir, "events"))


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.unpivot_event_counts(
        relational.pivot_event_counts(_t(spark, sf_dir, "events"))
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward): for each click, the user's most recent
    purchase at or before it. Composed from union + window (Spark has no
    native ASOF); oracle is DuckDB's native ASOF LEFT JOIN."""
    events = _t(spark, sf_dir, "events")
    clicks = events.where("event_type = 'click'").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.where("event_type = 'purchase'").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    # ts leaves the query as epoch-ms: raw timestamp emission relies on
    # both engines truncating parquet TIMESTAMP_NANOS identically, which
    # holds at the fetch layer today but is the kind of invariant that
    # breaks silently (tests/test_robustness.py pins the truncation)
    return temporal.asof_join(
        clicks, purchases, on_key="user_id", on_time="ts",
        right_cols=["purchase_value"],
    ).select(
        "event_id", "user_id",
        epoch_millis("ts").alias("ts_ms"),
        F.col("asof_purchase_value").alias("last_purchase_value"),
    )


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: purchases within 1 hour after each click, per user."""
    events = _t(spark, sf_dir, "events")
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


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation — result identical to a plain
    groupBy sum."""
    return skew.salted_sum(
        _t(spark, sf_dir, "orders"), "o_custkey", "o_totalprice"
    )


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted join — result identical to the plain equi-join."""
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    return (
        skew.salted_join(orders, cust, "custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass numeric column profile of orders. exact_distinct=True
    here because the ANSI oracle computes COUNT(DISTINCT); the operator's
    default is the mergeable HLL sketch (the 100 TB path)."""
    return profiling.profile_numeric(
        _t(spark, sf_dir, "orders"),
        ["o_custkey", "o_totalprice"],
        exact_distinct=True,
    )


def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return timeseries.tumbling_window_stats(_t(spark, sf_dir, "events"))


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session boundaries leave the query as epoch-ms bigints: raw
    timestamps are a cross-engine hash hazard (parquet TIMESTAMP_NANOS
    stays ns in DuckDB, truncates to us in Spark; both floor to ms)."""
    return timeseries.sessionize(
        _t(spark, sf_dir, "events"), gap_minutes=30
    ).select(
        "user_id",
        "session_id",
        "n_events",
        epoch_millis("session_start").alias("session_start_ms"),
        epoch_millis("session_end").alias("session_end_ms"),
    )


def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timeseries gap-fill + LOCF over 15-minute buckets (the
    TimescaleDB time_bucket_gapfill/locf shape). Sums surface as integer
    micro-units; the dense bucket axis is span/width rows per series."""
    return timeseries.gapfill_locf(
        _t(spark, sf_dir, "events"), bucket_minutes=15
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: strictly-after
    chaining on each user's earliest qualifying timestamp."""
    return timeseries.funnel(
        _t(spark, sf_dir, "events"), steps=("view", "click", "purchase")
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-week x offset-week retention counts; epoch-week integer
    arithmetic keeps both engines calendar-free."""
    return timeseries.cohort_retention(_t(spark, sf_dir, "events"))


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier gate: |value - median| > 3 * MAD. Exact
    interpolated medians on both engines; integer outlier counts are the
    hashed surface."""
    return profiling.mad_outliers(_t(spark, sf_dir, "events"))


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return json_ops.props_stats_by_type(_t(spark, sf_dir, "events"))


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: HLL profiling, sketch-then-verify (the q_heavy_hitters
    pattern): the HLL estimate itself is engine-specific and stays out
    of the hashed surface; what IS hashed is the exact per-group
    distinct count (oracle-replayable) plus an integer flag asserting
    the sketch landed within 5% of it. rsd=0.02 leaves a wide margin —
    measured ≤0.67% across sf0.001..sf0.1 (default rsd=0.05 measured
    6.7% at sf0.1, outside its own envelope)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", 0.02).alias("_approx"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("_approx") - F.col("exact_users")) * 20
                <= F.col("exact_users")
            )
            .cast("int")
            .alias("within_5pct"),
        )
    )


def _register(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        _t(spark, sf_dir, n).createOrReplaceTempView(n)


def q_sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape through the spark.sql surface: filter + 3-way join
    + agg + deterministic top-k."""
    _register(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        """
        SELECT l_orderkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
        """
    )


def q_sql_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape through the spark.sql surface: 6-way join
    (customer x orders x lineitem x supplier x nation x region) with the
    local-supplier correlation (c_nationkey = s_nationkey) — the join-
    reordering workout; Catalyst broadcasts the three dimension tables
    and plans the fact joins by size. Revenue in integer cents (the
    micro-unit convention) so the grouped sum is order-independent."""
    _register(
        spark, sf_dir,
        "customer", "orders", "lineitem", "supplier", "nation", "region",
    )
    return spark.sql(
        """
        SELECT n_name,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) AS revenue_cents,
               COUNT(*) AS n_lineitems
        FROM customer
          JOIN orders   ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
                        AND c_nationkey = s_nationkey
          JOIN nation   ON s_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
        """
    )


def q_sql_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS subquery — Catalyst decorrelates to a join."""
    _register(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
        """
    )


def q_sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate: orders above the global average."""
    _register(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               ROUND(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) * 2 FROM orders)
        """
    )


# ---------------------------------------------------------------------------
# Tier B — LLM-data-pipeline operators (dedup / similarity / text / UDF /
# multimodal)
# ---------------------------------------------------------------------------


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(_t(spark, sf_dir, "documents"))


# Document-frequency cap for the wired Jaccard queries: a shingle shared
# by k docs fans out k^2 candidate pairs, so uncapped generation is a skew
# bomb on real corpora. 64 is far above the observed max df (7 at sf0.01,
# 25 at sf0.1) so results are bit-identical to exact Jaccard here, while
# hot stop-phrase shingles get dropped at scale. Denominators stay exact
# either way (sizes come from the uncapped sets).
_JACCARD_MAX_DF = 64


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.2,
        max_df=_JACCARD_MAX_DF,
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dedup clusters over n-gram Jaccard pairs. Iterative
    label propagation on the Spark side; the oracle replays the pair
    graph (the already-proven q_ngram_jaccard SQL) and closes it with a
    recursive CTE — min reachable doc_id per component on both sides
    (upgraded from rows-only in r3)."""
    pairs = dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.2,
        max_df=_JACCARD_MAX_DF,
    )
    return dedup.dedup_clusters(pairs)


def q_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split (new r4): near-dup clusters
    (the proven q_dedup_clusters pair graph) assigned atomically to one
    split via the proven q_hash_split md5 arithmetic on the cluster
    representative — a near-duplicate pair can never straddle the
    train/eval boundary."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(
        docs, n=3, threshold=0.2, max_df=_JACCARD_MAX_DF
    )
    return dedup.cluster_safe_split(docs, pairs)


def q_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-dedup action list (new r4): the proven q_dedup_clusters
    pair graph collapsed to one keep/drop decision per document, keyed
    to the deterministic cluster representative."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(
        docs, n=3, threshold=0.2, max_df=_JACCARD_MAX_DF
    )
    return dedup.keep_canonical(docs, pairs)


def q_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated per-group percentiles (median + p90 of doc
    length per language)."""
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.round(F.expr("percentile(n_chars, 0.5)"), 4).alias("median_chars"),
            F.round(F.expr("percentile(n_chars, 0.9)"), 4).alias("p90_chars"),
        )
    )


def q_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH candidates with the portable (md5-derived)
    shingle hash, so the fixed hash family h_i(x) = (a_i*x + b_i) mod p
    is replayable in DuckDB and the candidate set + signature agreement
    counts get a hard value oracle (upgraded from rows-only in r3).
    ``n_agree`` is the exact integer surface; the float est_jaccard stays
    API-side only (rounding ties at /32 differ across engines)."""
    return dedup.minhash_lsh_candidates(
        _t(spark, sf_dir, "documents"), shingle_hash="portable"
    ).select("doc_a", "doc_b", "n_agree")


def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-LSH near-dups with the portable (md5-derived
    60-bit) token hash: the per-bit votes, banding, and XOR popcount are
    all integer arithmetic DuckDB replays exactly (upgraded from
    rows-only in r3). max_bucket=200 is the production skew cap
    (mega-bucket fan-out measured 57s -> 2.4s on a 10x dup-dense
    corpus); the oracle replays the cap as a windowed count."""
    return dedup.simhash_near_dup(
        _t(spark, sf_dir, "documents"),
        max_hamming=16,
        token_hash="portable",
        max_bucket=200,
    )


def q_topk_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(
        emb, similarity.queries_from_corpus(emb, 5), k=5
    )


def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN, integer-exact portable composition: int8
    quantization + md5-derived integer hyperplane buckets + quantized
    cosine rerank. Every stage is integer math, so the approximate
    result is still deterministic and carries a full value oracle
    (upgraded from rows-only in r3; the float-GEMM variant
    ``lsh_bucketed_topk`` stays as the API default)."""
    return similarity.lsh_quantized_topk(
        _t(spark, sf_dir, "embeddings"), k=5, bits=8, dim=64, n_queries=5
    )


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer assignment (rows-only)."""
    emb = _t(spark, sf_dir, "embeddings")
    centroids = (
        emb.orderBy(F.col("vec_id").desc())
        .limit(16)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid_vec"),
        )
    )
    return similarity.ivf_assign(emb, centroids).select(
        "vec_id", "centroid_id"
    )


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-candidate + exact-verify near-dup (the scale path); the
    quadratic all-pairs variant survives only as the recall oracle in
    tests and as the DuckDB oracle SQL."""
    return similarity.embedding_near_dup(
        _t(spark, sf_dir, "embeddings"), threshold=0.5
    )


def q_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-corpus hygiene gate (new r4): cosine of each vector to
    its OWN label centroid (fixed-point centroid means — the proven
    q_centroid_by_label surface), flagging vectors below 0.0 (negatively
    correlated with their label's mean direction)."""
    return similarity.centroid_outliers(_t(spark, sf_dir, "embeddings"))


def q_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector aggregation: per-label mean embedding as flat rows
    (1-based pos to match the ANSI oracle's generate_subscripts)."""
    return similarity.centroid_by_label(_t(spark, sf_dir, "embeddings")).select(
        "label", (F.col("pos") + 1).alias("pos"), "avg_val"
    )


def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative Lloyd's k-means (rows-only: iterative, no SQL oracle)."""
    return similarity.kmeans(_t(spark, sf_dir, "embeddings"), k=8, iterations=3)


def q_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing substring fingerprints, portable-hash variant: grams
    hashed with md5 so the DuckDB oracle computes bit-identical window
    minima (upgraded from rows-only in round 2; the xxhash64 default
    stays available for production shuffling-width reasons)."""
    return text.winnowing_fingerprints(
        _t(spark, sf_dir, "documents"), portable=True
    )


def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplicated-span removal (C4-style line dedup over
    fixed token chunks)."""
    return dedup.chunk_dedup(_t(spark, sf_dir, "documents"), chunk=8, max_docs=2)


def q_zipf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical diversity + Zipf slope (integer micro-unit
    least squares, reproducible across engines)."""
    return text.lexical_zipf_stats(_t(spark, sf_dir, "documents"))


def q_curriculum_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curriculum difficulty bins (NTILE over deterministic
    length key)."""
    return text.curriculum_bins(_t(spark, sf_dir, "documents"), n_bins=10)


def q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of embeddings with carried integer
    squared norms. The quantized vector leaves the query as an md5 of
    its comma-joined elements: the driver's canonicalizer can't hash a
    raw array cell, and the digest is just as strong a value check
    (int-string rendering is identical across engines)."""
    q = similarity.quantize_embeddings(_t(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id",
        F.md5(F.array_join(F.col("qvec").cast("array<string>"), ",")).alias(
            "qvec_md5"
        ),
        "q_scale",
        "q_sqnorm",
    )


def q_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-k over int8-quantized vectors (integer dots +
    carried norms: exact on any engine)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.quantized_topk(
        emb, similarity.queries_from_corpus(emb, 5), k=5
    )


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source shingle contamination matrix (pairwise shared
    shingles + Jaccard; fan-out bounded by source count)."""
    return dedup.source_overlap_matrix(_t(spark, sf_dir, "documents"), n=3)


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_count(_t(spark, sf_dir, "documents"))


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.quality_score(_t(spark, sf_dir, "documents"))


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.text_stats_by_lang(_t(spark, sf_dir, "documents"))


def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.bpe_ish_tokens(_t(spark, sf_dir, "documents"))


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded per-language sampling with the ANSI-portable md5 draw —
    the DuckDB oracle replays the exact sample (upgraded from rows-only
    in round 2). Explicit fractions exercise the collect-free scale
    path — no strata-discovery job."""
    return text.stratified_sample(
        _t(spark, sf_dir, "documents"),
        fractions={"en": 0.1, "de": 0.3, "es": 0.3, "fr": 0.3, "zh": 0.3},
        key="doc_id",
    ).select("doc_id", "lang")


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent event types via sketch-then-verify: freqItems proposes a
    bounded candidate superset, an exact counting pass over candidate
    rows confirms — deterministic output with a full value oracle
    (upgraded from raw rows-only freqItems in r3)."""
    return relational.heavy_hitters(
        _t(spark, sf_dir, "events"), "event_type", support=0.1
    )


def q_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3)


def q_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap-fill (the continuous-signal companion to
    q_gapfill_locf); integer micro-unit arithmetic, floor via double
    division on both engines (DuckDB's integer // truncates, FLOOR of
    the double ratio floors — exact while the bucket span ≪ 2^26)."""
    return timeseries.gapfill_interpolate(
        _t(spark, sf_dir, "events"), bucket_minutes=15
    )


def q_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day via bounded
    contribution-day expansion (fan-out = window width, no per-day
    self-join)."""
    return timeseries.rolling_active_users(
        _t(spark, sf_dir, "events"), window_days=7
    )


def q_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union per user (5-minute event intervals): running-max
    island detection in one sorted window pass, all epoch-ms integers."""
    return temporal.interval_coverage(
        _t(spark, sf_dir, "events"), duration_minutes=5
    )


def q_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence from the corpus token distribution; one
    tokenize+count pass, micro-unit integer term sums."""
    return text.source_kl(_t(spark, sf_dir, "documents"))


def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric n-gram containment pairs (|A∩B|/min(|A|,|B|) ≥ 0.5):
    sub-document quote/plagiarism mining, exact integer threshold
    arithmetic. max_df is the scale lever (a no-op on the organic
    corpus, max shingle df 25 — the q_ngram_jaccard precedent)."""
    return dedup.containment_pairs(
        _t(spark, sf_dir, "documents"),
        n=3,
        threshold_milli=500,
        max_df=_JACCARD_MAX_DF,
    )


def q_knn_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise probe: exact integer-L2 kNN agreement for 32 sampled
    query vectors, self excluded — integers end to end."""
    return similarity.knn_label_agreement(
        _t(spark, sf_dir, "embeddings"), n_queries=32, k=10
    )


def q_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type OLS slope of the daily value sum; exact integer S-sums
    emitted beside the rounded slope."""
    return profiling.trend_slope(_t(spark, sf_dir, "events"))


def q_categorical_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical column triage (distinct / entropy / modal share) for
    event_type and user_id; micro-unit entropy terms summed exactly."""
    return profiling.categorical_profile(
        _t(spark, sf_dir, "events"), ["event_type", "user_id"]
    )


def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy name matching over part names, signature-first:
    distinct names matched within the last-token block, Levenshtein
    1..2, record multiplicities carried as n_pairs."""
    return relational.fuzzy_match_names(
        _t(spark, sf_dir, "part"), name_col="p_name", max_distance=2
    )


def q_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-session Markov transitions between event types; integer
    milli-unit probabilities (floor), no float anywhere."""
    return timeseries.transition_matrix(
        _t(spark, sf_dir, "events"), gap_minutes=30
    )


def q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end funnel conversion latency: exact p50/p90/p99 +
    fixed-point mean over converting users."""
    return timeseries.conversion_latency(
        _t(spark, sf_dir, "events"), steps=("view", "click", "purchase")
    )


def q_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth curve: first-active-day rollup + running sum over the
    bounded day axis — exact cumulative distinct with no running-distinct
    state."""
    return timeseries.cumulative_users(_t(spark, sf_dir, "events"))


def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD history of each user's event_type stream: versioned
    [valid_from, valid_to) rows, consecutive duplicates collapsed,
    open-ended current row."""
    return temporal.scd2_history(_t(spark, sf_dir, "events"))


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (3 iterations, damping 0.85) on the
    customer<->supplier order graph; integer micro-unit arithmetic makes
    the unrolled-CTE DuckDB oracle bit-exact."""
    return graph.pagerank_topk(
        graph.bipartite_edges(
            _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
        ),
        iterations=3,
        k=50,
    )


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for a 3-term query mixing the corpus's one rare token
    ('dup', df 25/500 at sf0.01 — idf ~2.98) with two common ones; the
    integer micro-unit score sum is the hashed surface, rank assigned
    after the distributed top-k limit."""
    return text.bm25_search(
        _t(spark, sf_dir, "documents"), ("dup", "join", "vector")
    )


def q_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level PMI collocations with the top-1000-vocab population
    cap (a no-op on the 31-token synthetic corpus; the scale lever is
    what's under test in the plan)."""
    return text.pmi_pairs(_t(spark, sf_dir, "documents"), min_count=5)


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.fingerprint(_t(spark, sf_dir, "documents")).select(
        "doc_id", "content_md5"
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID — deterministic marker-count argmax, so it
    carries a full SQL oracle despite being a heuristic."""
    return text.lang_id(_t(spark, sf_dir, "documents"))


def q_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return udf.text_metrics_pandas(_t(spark, sf_dir, "documents"))


def q_lang_stats_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    return udf.lang_stats_apply_in_pandas(_t(spark, sf_dir, "documents"))


def q_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite training-data prep pipeline: quality filter -> exact
    dedup (keep smallest doc_id) -> per-language token budget. The
    whole chain is one Catalyst plan — filters push into the scan,
    dedup is a hash-agg on md5 keys."""
    docs = _t(spark, sf_dir, "documents")
    quality = text.quality_score(docs).where(
        (F.col("n_tokens") >= 30) & (F.col("stopword_ratio") <= 0.5)
    )
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    keyed = docs.join(quality.select("doc_id", "n_tokens"), "doc_id").select(
        "doc_id", "lang", "n_tokens", F.md5(norm).alias("content_md5")
    )
    deduped = (
        keyed.groupBy("content_md5")
        .agg(
            F.min("doc_id").alias("doc_id"),
            # min_by: attributes of the kept (smallest-id) copy —
            # deterministic where first() would depend on task order
            F.min_by("lang", "doc_id").alias("lang"),
            F.min_by("n_tokens", "doc_id").alias("n_tokens"),
        )
    )
    return deduped.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("token_budget"),
    )


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Free-text PII scrubbing (email/SSN/phone/IP patterns). The
    synthetic corpus contains no PII, so the oracle pins the exact no-op
    (all counts 0, redacted_md5 == md5(text)); planted-PII behavior is
    pinned in tests/test_llm_ops.py."""
    return text.redact_pii(_t(spark, sf_dir, "documents"))


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition quality signals per document."""
    return text.repetition_stats(_t(spark, sf_dir, "documents"))


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing a 3-gram with
    the 'benchmark' set (deterministically the 5 smallest doc_ids)."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.orderBy("doc_id").limit(5)
    return dedup.decontaminate(docs, bench, n=3)


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy per-language sequence packing into 2048-token chunks."""
    return text.pack_sequences(_t(spark, sf_dir, "documents"), budget=2048)


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: docs from non-src1 sources whose content never
    appeared in the already-ingested src1 corpus (fingerprint anti-join;
    seen side broadcast — it is the small side here)."""
    docs = _t(spark, sf_dir, "documents")
    seen = text.fingerprint(docs.where(F.col("source").rlike("^src1.*$")))
    new = docs.where(~F.col("source").rlike("^src1.*$"))
    return dedup.incremental_dedup(new, seen, broadcast_seen=True).select(
        "doc_id", "lang", "source"
    )


def q_incremental_dedup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered incremental dedup — same split and same EXACT
    output as q_incremental_dedup (the Bloom filter only prunes work:
    no false negatives, false positives removed by the verify join), so
    the oracle is the plain anti-join. The bit table auto-sizes to ~10
    bits per seen key, stays bounded, and broadcasts; at sf0.01 the
    prefilter passes 216/225 batch docs without ever touching the seen
    corpus."""
    docs = _t(spark, sf_dir, "documents")
    seen = text.fingerprint(docs.where(F.col("source").rlike("^src1.*$")))
    new = docs.where(~F.col("source").rlike("^src1.*$"))
    return dedup.incremental_dedup_bloom(new, seen, k=3).select(
        "doc_id", "lang", "source"
    )


def q_shared_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated 3-gram fraction per doc (RefinedWeb/
    Gopher-style dup-quality signal; integer surfaces + floored ppm)."""
    return dedup.shared_ngram_fraction(
        _t(spark, sf_dir, "documents"), n=3, min_df=2
    )


def q_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by cosine over TF-IDF-weighted 3-gram vectors
    (fixed-point milli-unit weights -> exact integer dot/norms).
    max_df=64 is the always-on scale cap: a no-op on the organic corpus
    (max gram df 25 at sf0.1) but it holds a dup-dense 10x replica at
    1.7x instead of 10.3x (SCALE.md round-4b table)."""
    return dedup.tfidf_ngram_cosine_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.3, max_df=64
    )


def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN top-10: sampled integer codebook (16
    subspaces x 16 codes over milli-unit fixed-point vectors), map-only
    Arrow encode, broadcast ADC table, then exact integer-L2 rerank of
    the 100-candidate ADC shortlist (measured recall@10 0.92 vs 0.52
    ADC-only) — every surfaced value is an exact int64, bit-replayable
    in SQL."""
    return similarity.pq_topk(
        _t(spark, sf_dir, "embeddings"), n_queries=5, k=10,
        subspaces=16, codes=16, rerank=100,
    )


def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN top-10: coarse cell pruning (8 sampled centroids,
    3 probed) over PQ/ADC scoring with exact integer-L2 rerank —
    measured recall@10 0.92 at sf0.01 while ADC-scanning ~3/8 of the
    corpus. Integer arithmetic end to end, bit-replayable oracle."""
    return similarity.ivfpq_topk(
        _t(spark, sf_dir, "embeddings"), n_queries=5, k=10,
        cells=8, nprobe=3, subspaces=16, codes=16, rerank=100,
    )


def q_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (64-token windows, 16 overlap) — map-only
    pass, chunk surfaced as a 16-byte md5 for downstream joins."""
    return text.sliding_chunks(
        _t(spark, sf_dir, "documents"), size=64, overlap=16
    )


def q_ppjoin_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard pairs via prefix filtering (AllPairs/PPJoin
    family): lossless candidate pruning under a rarest-first global
    shingle order. Re-pinned at threshold 0.8 in r6 (the r5 verdict's
    ask) — the algorithm's HONEST regime: the prefix keeps only (1-t)
    of each set, and that is where it beats the inverted index
    (measured 2.7x at t=0.8 on the 10x dup-dense corpus; at the old
    t=0.2 it was demonstrating the algorithm in its own anti-regime).
    The oracle comes from the same generator as q_ngram_jaccard's
    (`_ngram_jaccard_oracle_sql`), evaluated at this threshold, so the
    two keys' SQL cannot drift."""
    return dedup.jaccard_prefix_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.8
    )


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by identity hash."""
    return text.hash_split(_t(spark, sf_dir, "documents"))


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus unigram LM, per-doc mean smoothed log-probability."""
    return text.unigram_logprob(_t(spark, sf_dir, "documents"))


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram LM, per-doc mean smoothed conditional
    log-probability (new in r3; fixed-point mean, full oracle)."""
    return text.bigram_logprob(_t(spark, sf_dir, "documents"))


def q_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling rates for an equal-share token budget."""
    return text.source_mix(_t(spark, sf_dir, "documents"), budget_tokens=100_000)


def q_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language shortest-10% length filter, exact rank arithmetic."""
    return text.percentile_filter(_t(spark, sf_dir, "documents"), p=0.1)


def q_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap by deterministic hash rank."""
    return text.cap_per_source(_t(spark, sf_dir, "documents"), k=100)


def q_merge_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-1 latest-wins merge of an update batch into a base snapshot
    (events split by event_id mod 3 into base/updates), one window
    shuffle, ts emitted as epoch-ms per the repo convention."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    base = ev.where(F.col("event_id") % 3 != 0)
    updates = ev.where(F.col("event_id") % 3 == 0)
    out = temporal.merge_latest(base, updates, key="user_id")
    return out.select(
        "user_id",
        epoch_millis(F.col("ts")).alias("ts_ms"),
        "event_type",
        "value",
        "event_id",
    )


def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc OOV rate against the corpus's own top-20 token vocab (the
    synthetic corpus has 31 distinct tokens, so 20 leaves a real OOV
    tail; a production run passes the tokenizer vocab instead)."""
    docs = _t(spark, sf_dir, "documents")
    return text.oov_rate(docs, text.top_vocab(docs, size=20))


def q_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplication report."""
    return dedup.dedup_stats(_t(spark, sf_dir, "documents"))


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted (by n_chars) top-100-per-lang sample."""
    return text.weighted_sample_per_group(
        _t(spark, sf_dir, "documents"), k=100
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction via mapInPandas. The fake
    payload is deterministic ('FAKEIMG1' + ASCII text) and the byte
    entropy uses fixed-point micro-unit terms, so the whole surface is
    DuckDB-replayable (upgraded from rows-only in r3)."""
    media = attach_fake_image_bytes(_t(spark, sf_dir, "documents"))
    return image_features(media)


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing over binary payloads (rows-only)."""
    media = attach_fake_image_bytes(_t(spark, sf_dir, "documents"))
    return sample_frames(media, every=256).select(
        "doc_id", "frame_idx", F.length("frame_bytes").alias("frame_len")
    )


def q_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-asset duplicate frames (new r4): fixed-stride payload
    frames hashed to md5 and grouped; frames in >= 2 assets surface.
    Safe as a value oracle because the corpus is ASCII-pinned (the
    byte/character-semantics test in test_robustness), so DuckDB's
    string md5 equals Spark's binary md5."""
    from dbt_schema_builder_spark.multimodal import frame_dedup

    media = attach_fake_image_bytes(_t(spark, sf_dir, "documents"))
    return frame_dedup(media, every=256)


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-chunk RMS/peak over binary payloads. Integer squared sums and
    a single final sqrt/round make the chunk features engine-exact, so
    the query carries a full oracle (upgraded from rows-only in r3)."""
    media = attach_fake_image_bytes(_t(spark, sf_dir, "documents"))
    return audio_features(media, chunk=256)


# ---------------------------------------------------------------------------
# Tier B — Structured Streaming (B14; rows-only — batch analogs B12/B13
# carry the oracles, streaming parity is pinned in tests/test_streaming.py)
# ---------------------------------------------------------------------------


def _events_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage the events parquet as a ts-range-partitioned multi-file
    directory for the file stream source, once per sf_dir (cached under a
    deterministic path — earlier rounds leaked one tempdir per call).

    All staged files are consumed in ONE availableNow batch (see
    stream_events: per-file triggers drop data when listing order is
    unlucky); the trailing no-data micro-batch then advances the
    watermark to max(ts) - delay, flushing every closed window. That
    makes each streaming query's emitted set a deterministic function of
    the data — which is what the DuckDB oracles below rely on."""
    import hashlib
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), f"events_stream_stage_{tag}")
    marker = os.path.join(d, "_STAGED")
    if not os.path.exists(marker):
        _t(spark, sf_dir, "events").repartitionByRange(4, "ts").write.mode(
            "overwrite"
        ).parquet(d)
        with open(marker, "w") as fh:
            fh.write(sf_dir)
    return d


def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_schema_builder_spark.streaming import (
        run_stream_to_memory,
        stream_events,
        streaming_tumbling_counts,
    )

    src = stream_events(spark, _events_stream_dir(spark, sf_dir))
    out = run_stream_to_memory(
        streaming_tumbling_counts(src), "q_stream_tumbling_sink", "append"
    )
    # append mode emits exactly the windows whose end <= final watermark
    # (max ts - 10 min): a closed-form set the DuckDB oracle replays.
    return out.select(
        epoch_millis("bucket").alias("bucket_ms"), "n_events", "sum_value"
    )


def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_schema_builder_spark.streaming import (
        run_stream_to_memory,
        stream_events,
        streaming_session_window,
    )

    src = stream_events(spark, _events_stream_dir(spark, sf_dir))
    out = run_stream_to_memory(
        streaming_session_window(src), "q_stream_session_sink", "append"
    )
    # emitted sessions = those with end (last event + gap) <= final
    # watermark (max ts - 1 h); the oracle replays sessionize + filter.
    return out.select(
        "user_id",
        epoch_millis("session_start").alias("session_start_ms"),
        epoch_millis("session_end").alias("session_end_ms"),
        "n_events",
    )


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_schema_builder_spark.streaming import (
        run_stream_to_memory,
        stream_events,
        streaming_dedup,
    )

    src = stream_events(spark, _events_stream_dir(spark, sf_dir))
    return run_stream_to_memory(
        streaming_dedup(src).select("event_id", "user_id", "event_type"),
        "q_stream_dedup_sink",
        "append",
    )


def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream join. Single-batch intake means no
    state eviction can hide a pair, so the emitted set equals the batch
    range join — a full value oracle."""
    from dbt_schema_builder_spark.streaming import (
        run_stream_to_memory,
        stream_events,
        streaming_click_purchase_join,
    )

    src = stream_events(spark, _events_stream_dir(spark, sf_dir))
    return run_stream_to_memory(
        streaming_click_purchase_join(src), "q_stream_join_sink", "append"
    )


def q_stream_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_schema_builder_spark.streaming import (
        run_stream_to_memory,
        stream_events,
        streaming_user_state,
    )

    src = stream_events(spark, _events_stream_dir(spark, sf_dir))
    out = run_stream_to_memory(
        streaming_user_state(src), "q_stream_user_state_sink", "update"
    )
    # single-batch intake => exactly one update emission per user, equal
    # to the per-user batch aggregate (count / rounded sum / max ts).
    return out.select(
        "user_id",
        "n_events",
        "total_value",
        epoch_millis("last_ts").alias("last_ts_ms"),
    )


def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment: streamed events joined with
    the batch customer dimension. Deterministic (no watermark, no
    state), so unlike the other stream queries it carries a full
    value-hash oracle."""
    from dbt_schema_builder_spark.streaming import (
        run_stream_to_memory,
        stream_events,
        streaming_static_enrich,
    )

    src = stream_events(spark, _events_stream_dir(spark, sf_dir)).select(
        "event_id", "user_id", "event_type"
    )
    dim = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    return run_stream_to_memory(
        streaming_static_enrich(src, dim, on="user_id"),
        "q_stream_enrich_sink",
        "append",
    )


def q_stream_dedup_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental dedup (new r4): streamed events anti-joined
    against the already-ingested key history (stream-static broadcast,
    stateless) — the streaming twin of q_incremental_dedup. History =
    the event_id % 3 == 0 slice, so the oracle is a plain filter."""
    from dbt_schema_builder_spark.streaming import (
        run_stream_to_memory,
        stream_events,
        streaming_dedup_against_history,
    )

    src = stream_events(spark, _events_stream_dir(spark, sf_dir)).select(
        "event_id", "user_id", "event_type"
    )
    seen = (
        _t(spark, sf_dir, "events")
        .where("event_id % 3 = 0")
        .select("event_id")
        .distinct()
    )
    return run_stream_to_memory(
        streaming_dedup_against_history(src, seen, on="event_id"),
        "q_stream_dedup_history_sink",
        "append",
    )


# ---------------------------------------------------------------------------
# round-5 promotions: tests-only operators given driver-gate oracles
# ---------------------------------------------------------------------------


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-rule battery (promoted from tests-only in
    r5): one row per document with an integer flag per rule plus the
    conjunction. All signals are map-side HOFs over the token array —
    zero shuffle; the oracle replays each ratio with the same integer
    numerators (char counts, token counts) and double comparisons, so
    the flags hash exactly."""
    return text.gopher_quality_rules(_t(spark, sf_dir, "documents"))


def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail buckets (promoted r5): per-language
    percent_rank over the proven q_unigram_logprob score (rounded
    micro-unit mean, so the window ordering is identical on both
    engines; doc_id tie-break)."""
    return text.ccnet_buckets(_t(spark, sf_dir, "documents"))


# Learned once with text.learn_bpe_merges(n_merges=8) on the sf0.01
# corpus (deterministic: ties broken lexicographically) and frozen so
# the segmentation is replayable verbatim in DuckDB; ('m','er') is a
# cascading merge — it only fires after ('e','r') has produced 'er'.
_BPE_MERGES = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"),
    ("s", "t"), ("m", "er"), ("a", "t"), ("l", "u"),
]

# q_bpe_learn trains this many merges live; its oracle unrolls the same
# number of argmax iterations (one CTE chain per step)
_BPE_LEARN_STEPS = 6


def q_apply_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge application (promoted r5): segment the corpus with the
    frozen learned merge list — pure map-side fold, zero shuffle. The
    oracle replays the identical left-to-right non-overlapping merge as
    iterated string replace over unit-separator-joined symbols (replace
    is left-to-right non-overlapping, exactly the fold's semantics; the
    corpus is pinned ASCII-printable so chr(31) never collides)."""
    return text.apply_bpe_merges(_t(spark, sf_dir, "documents"), _BPE_MERGES)


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-skew triage report (promoted r5) keyed on event_type — the
    low-cardinality key where shares actually cross the salting
    threshold. Integer milli shares; `div` truncation agrees between
    engines on positive operands."""
    return skew.skew_report(_t(spark, sf_dir, "events"), key="event_type")


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup action list (promoted r5): exact blocked-GEMM pair
    mining at threshold 0.4 (59 pairs at sf0.01 — non-trivial clusters;
    the GEMM-vs-list_cosine_similarity comparison is the proven
    q_embedding_near_dup contract), transitive closure, min-vec_id
    representative, keep/drop actions for every vector."""
    return similarity.semantic_dedup(
        _t(spark, sf_dir, "embeddings"), threshold=0.4, strategy="blocked"
    )


def q_merge_partial_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance (promoted r5): history
    partials (event_id % 3 != 0) folded with a raw batch (% 3 == 0).
    Integer micro-unit sums make the monoid merge EXACTLY equal to the
    full recompute — which is the oracle, so the green row proves the
    incremental path, including keys first seen in the batch."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.round(F.col("value") * 1e6).cast("bigint").alias("v_micro"),
    )
    state = (
        ev.where("event_id % 3 != 0")
        .groupBy("user_id")
        .agg(F.sum("v_micro").alias("v_micro"), F.count(F.lit(1)).alias("n"))
    )
    batch = ev.where("event_id % 3 = 0").select("user_id", "v_micro")
    return relational.merge_partial_aggregates(
        state, batch, ["user_id"], ["v_micro"]
    )


# ---------------------------------------------------------------------------
# round-5 batch 2: stream-funnel + snapshot-diff promotions, profiling,
# SQL-surface breadth, tokenizer fertility
# ---------------------------------------------------------------------------


def q_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming funnel promoted to the driver gate (r5): single-batch
    availableNow intake emits exactly one row per user — the greedy
    strictly-after chain over ALL events — so the emission is
    closed-form and the oracle replays it with correlated sequential
    MINs (t1 = min view; t2 = min click > t1; t3 = min purchase > t2)."""
    from dbt_schema_builder_spark.streaming import (
        run_stream_to_memory,
        stream_events,
        streaming_funnel,
    )

    src = stream_events(spark, _events_stream_dir(spark, sf_dir))
    return run_stream_to_memory(
        streaming_funnel(src), "q_stream_funnel_sink", "update"
    )


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed snapshot reconciliation promoted to the driver gate (r5):
    old/new snapshots derived deterministically from events (event_id
    % 5 slices add/remove keys; % 7 mutates value), so every status
    class is exercised and the oracle classifies by direct value
    comparison — equivalent to the operator's null-tagged md5 row
    signatures because only `value` is mutated."""
    from dbt_schema_builder_spark.sources.io import snapshot_diff

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    old = ev.where("event_id % 5 != 4")
    new = ev.where("event_id % 5 != 0").withColumn(
        "value",
        F.when(
            F.col("event_id") % 7 == 0, F.col("value") + F.lit(1.0)
        ).otherwise(F.col("value")),
    )
    return snapshot_diff(old, new, ["event_id"])


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width value histogram per event_type (new r5): single
    (group, bin) count shuffle, open-ended top bin, exact double bin
    edges."""
    return profiling.value_histogram(_t(spark, sf_dir, "events"))


def q_anomaly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 3-sigma anomaly gate (new r5): the z-test cross-
    multiplied into pure int64 milli-unit arithmetic — no float
    mean/variance, engine-exact flags."""
    return profiling.sigma_outliers(_t(spark, sf_dir, "events"))


def q_sql_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (new r5): monthly promo revenue share through
    spark.sql — fact-dimension join, conditional aggregation, integer
    cents and a truncating-div milli share."""
    _register(spark, sf_dir, "lineitem", "part")
    df = spark.sql(
        """
        SELECT date_trunc('month', l_shipdate) AS month,
               SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS promo_cents,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                   AS BIGINT)) AS total_cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY date_trunc('month', l_shipdate)
        """
    )
    return df.select(
        epoch_millis("month").alias("month_ms"),
        "promo_cents",
        "total_cents",
        F.expr("(1000 * promo_cents) div total_cents").alias("promo_milli"),
    )


def q_sql_cust_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (new r5): customer order-count distribution —
    LEFT join so zero-order customers appear, two aggregation levels."""
    _register(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_count, COUNT(*) AS custdist FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        ) GROUP BY c_count
        """
    )


def q_sql_brand_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (new r5): disjunctive brand/quantity predicate
    bands over the part join, single-row integer-cents revenue."""
    _register(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        """
        SELECT COALESCE(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                   * 100) AS BIGINT)), CAST(0 AS BIGINT)) AS revenue_cents,
               COUNT(*) AS n_lineitems
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 15)
           OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 25)
           OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 35)
        """
    )


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility with the frozen BPE merge list
    (new r5): subwords/word and chars/subword in truncating-div milli —
    the vocabulary go/no-go table."""
    return text.tokenizer_fertility(
        _t(spark, sf_dir, "documents"), _BPE_MERGES
    )


# ---------------------------------------------------------------------------
# round-6: bounded-SemDeDup gate, BPE learning / evolving reader / z-order
# layout promotions
# ---------------------------------------------------------------------------


def q_semantic_dedup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup through the BOUNDED mining branch (new r6, the r5
    verdict's ask): the 100x-safe path a real curation run uses —
    ivf_sharded GEMM at the pinned >=0.95-recall config (k_cells=32,
    nprobe=8; SCALE.md recall-vs-cost curve) — driver-gated with the
    q_approx_distinct envelope pattern. The hashed surface is the
    EXACT closure's replayable facts (n_vecs, n_exact_drop) plus an
    integer flag asserting per-vector keep/drop agreement between the
    bounded branch and the exact closure >= 95% (measured 1.000 at
    sf0.01 and 0.999 at sf0.1); the lossy branch's own labels never
    enter the hash. Integer envelope arithmetic: 20*n_agree >=
    19*n_vecs <=> agreement >= 0.95."""
    emb = _t(spark, sf_dir, "embeddings")
    ivf = similarity.semantic_dedup(
        emb, threshold=0.4, strategy="ivf_sharded", k_cells=32, nprobe=8
    )
    exact = similarity.semantic_dedup(emb, threshold=0.4, strategy="blocked")
    j = exact.select("vec_id", F.col("action").alias("_ea")).join(
        ivf.select("vec_id", F.col("action").alias("_ia")), "vec_id"
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum((F.col("_ea") == F.lit("drop")).cast("long")).alias(
            "n_exact_drop"
        ),
        (
            F.sum((F.col("_ea") == F.col("_ia")).cast("long")) * 20
            >= F.count(F.lit(1)) * 19
        )
        .cast("int")
        .alias("agree_ge_95"),
    )


def q_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge LEARNING driver-gated (promoted r6): the actual
    training loop — word-frequency table, weighted adjacent-pair
    counts, argmax merge with (cnt DESC, a, b) tie-break, re-segment,
    repeat — surfaced as the learned merge table (step, a, b, cnt).
    The oracle re-derives every merge independently: per iteration a
    DuckDB CTE replays segmentation-so-far via the chained-replace
    identity with the PREVIOUS iterations' argmax rows as scalar
    subqueries (not frozen literals), recomputes pair counts, and
    takes the same argmax — so a green hash proves the full training
    trajectory, not just a frozen list. Only the <= n_merges argmax
    rows reach the driver (the kmeans convention); min_pair_count=2
    never triggers at these sfs (31-token vocab, counts in the
    hundreds)."""
    counts: list = []
    merges, _ = text.learn_bpe_merges(
        _t(spark, sf_dir, "documents"),
        n_merges=_BPE_LEARN_STEPS,
        min_pair_count=2,
        counts_out=counts,
    )
    # the oracle unrolls exactly _BPE_LEARN_STEPS argmax CTEs; an early
    # stop (min_pair_count) would otherwise surface only as an opaque
    # driver hash mismatch on a corpus/sf change (r6 ADVICE)
    if len(merges) != _BPE_LEARN_STEPS:
        # explicit raise, not assert: asserts vanish under python -O,
        # which would re-open the opaque-hash-mismatch failure mode
        raise RuntimeError(
            f"learn_bpe_merges stopped early ({len(merges)} of "
            f"{_BPE_LEARN_STEPS} merges) — the q_bpe_learn oracle "
            "unrolls a fixed step count; lower _BPE_LEARN_STEPS for "
            "this corpus"
        )
    rows = [
        (i + 1, a, b, c)
        for i, ((a, b), c) in enumerate(zip(merges, counts))
    ]
    return spark.createDataFrame(
        rows, "step INT, a STRING, b STRING, cnt BIGINT"
    )


def _per_sf_scratch(sf_dir: str, name: str) -> str:
    """Deterministic per-(query, sf) scratch dir (r6 ADVICE: mkdtemp per
    invocation leaked unbounded /tmp data across bench/driver reruns —
    overwrite-mode writes make a fixed path idempotent instead)."""
    import hashlib
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"spark_graft_{name}_{tag}")


def q_evolving_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution reader driver-gated (promoted r6): two parquet
    batches written with DIFFERENT schemas (batch 1 predates the
    n_regionkey column; batch 2 carries it), read back through
    ``read_parquet_evolving`` — mergeSchema unions the footers and the
    typed default fills the pre-evolution NULLs, so the surfaced table
    is total. The oracle is the nation table unioned with itself, -1
    standing in for the missing column — exactly what the reader must
    reconstruct from the two files."""
    from dbt_schema_builder_spark.sources.io import read_parquet_evolving

    nation = _t(spark, sf_dir, "nation")
    # left on disk for the caller's lazy collect; deterministic per-sf
    # path + overwrite mode => reruns are idempotent, no /tmp growth
    path = _per_sf_scratch(sf_dir, "evolving")
    nation.select(
        "n_nationkey", "n_name", F.lit(1).alias("batch")
    ).coalesce(1).write.mode("overwrite").parquet(path + "/b1")
    nation.select(
        "n_nationkey", "n_name", F.lit(2).alias("batch"), "n_regionkey"
    ).coalesce(1).write.mode("overwrite").parquet(path + "/b2")
    merged = read_parquet_evolving(
        spark, [path + "/b1", path + "/b2"], defaults={"n_regionkey": -1}
    )
    return merged.select("n_nationkey", "n_name", "batch", "n_regionkey")


_ZORDER_BITS = 4
_ZORDER_FILES = 8


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order physical layout driver-gated (promoted r6): cluster
    events on (user_id, event_id) with EXACT-histogram equi-depth
    cells + Morton interleave + replayable cum-count file assignment,
    write the partitioned files, then surface what the parquet FOOTERS
    say — per file bucket, the row count and min/max of both
    clustered columns via pyarrow statistics. The oracle replays the
    pure-integer assignment in SQL and predicts every footer value
    exactly, so a green hash proves the bytes on disk realize the
    logical layout (a strictly stronger claim than the r4
    timing-based pin). bits=4 x 2 dims -> <=256 distinct z values;
    8 file buckets."""
    from dbt_schema_builder_spark.sources.io import zorder_layout_report

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id")
    # deterministic per-sf path: the report's write is mode("overwrite")
    # over the whole path, so reruns replace (not accumulate) the
    # data-sized clustered copy (r6 ADVICE)
    path = _per_sf_scratch(sf_dir, "zorder")
    return zorder_layout_report(
        spark,
        ev,
        ["user_id", "event_id"],
        path,
        bits=_ZORDER_BITS,
        n_files=_ZORDER_FILES,
    )


def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights driver-gated (promoted r7, staged r6):
    two add-one-smoothed unigram LMs over a shared union vocabulary —
    target = the English slice of the same corpus — with the per-TOKEN
    log-ratio rounded once to integer milli-units in the vocab-bounded
    LM table, so each document's weight_milli is an exact int64 dot
    product (partition-order independent; the _det_avg discipline one
    level up). Oracle: ``_dsir_oracle_sql`` replays the same integer
    pipeline in DuckDB (differential-tested on random corpora in r6)."""
    docs = _t(spark, sf_dir, "documents")
    return text.dsir_importance(docs, docs.where("lang = 'en'"))


_WATERFILL_BUDGET = 100_000


def q_source_mix_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waterfilling source allocation driver-gated (promoted r7, staged
    r6): max-min fair token budget across sources — small sources taken
    whole, the remainder split at the water level, all in integer
    arithmetic whose driver-side solve (sources-bounded collect, the
    kmeans convention) collapses to closed-form window SQL in the
    oracle (``_waterfill_oracle_sql``, differential-tested r6)."""
    return text.source_mix_waterfill(
        _t(spark, sf_dir, "documents"), budget_tokens=_WATERFILL_BUDGET
    )


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-level dedup driver-gated (new r7): per document,
    every maximal token span covered by duplicated 20-token windows
    appearing in at least one OTHER document (Lee et al. 2022's
    memorization-risk removal set — cross-doc repeats at arbitrary
    offsets, which fixed-stride chunk_dedup structurally misses). All
    surfaces are integers; the oracle replays gram STRINGS where the
    operator keys on xxhash64 longs (the same collision-negligible
    equivalence the Jaccard oracles accept), the identical min/max-doc
    duplication test, and the same pos - ROW_NUMBER island merge.
    Differential-tested on random corpora before gating."""
    return dedup.duplicate_substring_spans(
        _t(spark, sf_dir, "documents"), min_len=20
    )


def q_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document substring-duplication rollup driver-gated (promoted
    r8, staged r7): covered tokens = the INTERVAL UNION of qualifying
    spans' token extents (islands are disjoint in gram-position space
    but extents overlap when the inter-island gap <= k-2 — the r7
    review's interval-sum bug, fixed with a running-max-of-end merge on
    both engines), truncating-div milli rate, clean docs included with
    zeros. Oracle: ``_span_stats_oracle_sql`` (differential-tested r7)."""
    return dedup.duplicate_span_stats(
        _t(spark, sf_dir, "documents"), min_len=20
    )


def q_cut_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The substring-dedup REMOVAL transform driver-gated (promoted r8,
    staged r7) — the operator users actually run on a training set:
    rebuild each document with duplicated >=20-token spans excised,
    protecting the k tokens of every duplicated gram's canonical
    occurrence (lexicographic min (doc_id, pos)) so each duplicated
    gram survives somewhere. POSITION-level keep rule (the r7 review's
    span-level unsoundness, fixed in-round). Oracle:
    ``_cut_spans_oracle_sql`` (differential-tested r7)."""
    return dedup.cut_duplicate_spans(
        _t(spark, sf_dir, "documents"), min_len=20
    )


def q_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NB log-odds quality classifier driver-gated (promoted r8, staged
    r7b): one-pass conditional-count training + integer milli-nat
    scoring (the dsir discipline — ONE rounded log per distinct token,
    exact int64 dot products). Label is the one text-derived signal the
    synthetic corpus has (`text LIKE '%dup%'` — token rates are
    measured-identical across lang/source, CLAUDE.md r7b). Oracle:
    ``_nb_scores_oracle_sql`` (differential-tested r7b + random-corpus
    r8)."""
    return classifier.nb_scores(
        _t(spark, sf_dir, "documents"), label="text LIKE '%dup%'"
    )


_TEMPERATURE_BUDGET = 100_000


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (alpha=0.5) source allocation driver-gated (promoted
    r8, staged r7b): isqrt weights (exact integer sqrt, replayed in SQL
    as floor(sqrt) with a +-1 integer correction) + largest-remainder
    integer quota, so sum(alloc) == budget exactly. Oracle:
    ``_temperature_mix_oracle_sql`` (differential-tested r7b)."""
    return text.source_mix_temperature(
        _t(spark, sf_dir, "documents"), budget_tokens=_TEMPERATURE_BUDGET
    )


def q_cluster_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-diversity (top-m-per-cluster) soft dedup driver-gated
    (promoted r8, staged r7b): the proven Jaccard pair graph -> label
    propagation -> integer-deterministic per-cluster retention rank
    (n_tokens DESC, doc_id), singletons always kept. Oracle:
    ``_cluster_diversity_oracle_sql`` over the shared pair-closure CTEs
    (differential-tested r7b)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(
        docs, n=3, threshold=0.2, max_df=_JACCARD_MAX_DF
    )
    return dedup.cluster_diversity_sample(docs, pairs, m=2)


def q_nb_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY half of the learned-filter story driver-gated
    (promoted r9, staged r8): md5 hash_split train slice trains the
    token log-odds model + prior, the held-out slice is scored against
    the FROZEN broadcast model — one tokenize pass, vocab-bounded model
    join, exact int64 milli-nat dot products, OOV auditable via
    n_in_vocab. Same code path as the bench entry and scale harness
    (classifier.nb_apply_heldout). Oracle: ``_nb_apply_oracle_sql``
    (differential-tested r8, incl. the empty-train-slice NULL-sum fix
    hypothesis found)."""
    return classifier.nb_apply_heldout(
        _t(spark, sf_dir, "documents"), label="text LIKE '%dup%'"
    )


def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF-fused hybrid retrieval driver-gated (promoted r9, staged
    r8): BM25 (Lucene idf, per-term micro-unit rounding) fused with a
    raw term-frequency ranker by integer RRF (1e6 div (k + rank)) —
    the two lists genuinely disagree on term-stuffed docs, which is
    the disagreement RRF arbitrates. Both rankers filter to query-term
    postings pre-shuffle; fusion touches 2*topk rows. Query terms:
    one hot + one rare term of the 31-token synthetic vocab. Oracle:
    ``_hybrid_oracle_sql`` (differential-tested r8)."""
    return text.hybrid_search(
        _t(spark, sf_dir, "documents"), ("data", "dup"), topk=20
    )


# ---------------------------------------------------------------------------
# contract
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Declaration order is load-bearing: the driver verifies the first 50
    keys. Round-13 window (the r12 verdict's task #1, executed exactly as
    the CLAUDE.md r12 opening digest pre-planned): (a) the 8 deferred-r9
    static relational-SQL keys (the 5 TPC-H q_sql_* queries + q_cube +
    q_grouping_sets + q_star_join — green r9 rows, oldest in the ledger);
    (b) 42 of the 49 r10-stale keys. 8 + 42 = exactly 50. The 7 deferred
    r10 keys are the lowest-churn static config/policy shapes
    (banned-column / include / exclude / soft-delete filters, PII
    projection, chunked union, prefix rename — pure projection/filter
    SQL oracles, multi-round green) and are first in line for r14
    alongside the 50 r11-stale keys. No changed-oracle re-pins or
    promotions this round (third clean budget in a row). Every key below
    the boundary carries a green r10/r11/r12 row under its CURRENT
    oracle string (tests/test_query_window.py +
    tests/test_oracle_manifest.py audit both halves of that claim)."""
    return {
        # (a) the 8 deferred-r9 static relational-SQL keys (ledger's oldest)
        "q_cube": q_cube,
        "q_grouping_sets": q_grouping_sets,
        "q_star_join": q_star_join,
        "q_sql_brand_qty_revenue": q_sql_brand_qty_revenue,
        "q_sql_correlated_exists": q_sql_correlated_exists,
        "q_sql_cust_order_dist": q_sql_cust_order_dist,
        "q_sql_promo_revenue": q_sql_promo_revenue,
        "q_sql_shipping_priority": q_sql_shipping_priority,
        # (b) 42 r10-stale rotations (7 lowest-churn static config/policy
        # keys deferred to r14 with green r10 rows)
        "q_bm25_search": q_bm25_search,
        "q_cluster_safe_split": q_cluster_safe_split,
        "q_containment": q_containment,
        "q_dedup_clusters": q_dedup_clusters,
        "q_dedup_stats": q_dedup_stats,
        "q_dsir_importance": q_dsir_importance,
        "q_embedding_near_dup": q_embedding_near_dup,
        "q_frame_dedup": q_frame_dedup,
        "q_incremental_dedup_bloom": q_incremental_dedup_bloom,
        "q_ivfpq_topk": q_ivfpq_topk,
        "q_json_extract": q_json_extract,
        "q_keep_canonical": q_keep_canonical,
        "q_keyword_quoting": q_keyword_quoting,
        "q_knn_label_agreement": q_knn_label_agreement,
        "q_lang_stats_pandas": q_lang_stats_pandas,
        "q_oov_rate": q_oov_rate,
        "q_pagerank": q_pagerank,
        "q_pandas_udf": q_pandas_udf,
        "q_pmi_pairs": q_pmi_pairs,
        "q_pq_topk": q_pq_topk,
        "q_prep_pipeline": q_prep_pipeline,
        "q_profile": q_profile,
        "q_quality_score": q_quality_score,
        "q_regex_anti_filter": q_regex_anti_filter,
        "q_repetition_stats": q_repetition_stats,
        "q_safe_view_redaction": q_safe_view_redaction,
        "q_scalar_kernel": q_scalar_kernel,
        "q_schema_tests": q_schema_tests,
        "q_shared_ngram_fraction": q_shared_ngram_fraction,
        "q_sliding_chunks": q_sliding_chunks,
        "q_sort_group_collect": q_sort_group_collect,
        "q_source_kl": q_source_kl,
        "q_source_mix": q_source_mix,
        "q_source_mix_waterfill": q_source_mix_waterfill,
        "q_source_overlap": q_source_overlap,
        "q_stream_dedup_history": q_stream_dedup_history,
        "q_stream_tumbling": q_stream_tumbling,
        "q_stream_user_state": q_stream_user_state,
        "q_substring_dedup": q_substring_dedup,
        "q_text_stats": q_text_stats,
        "q_trend_slope": q_trend_slope,
        "q_zipf_stats": q_zipf_stats,
        # ---- driver window boundary (position 50 = q_zipf_stats)
        # every key below carries a green r10-r12 row under its
        # current oracle string
        # deferred r10-stale (7, static config/policy — r14 first)
        "q_banned_column_filter": q_banned_column_filter,
        "q_chunked_union": q_chunked_union,
        "q_exclude_filter": q_exclude_filter,
        "q_include_filter": q_include_filter,
        "q_pii_view_projection": q_pii_view_projection,
        "q_prefix_rename": q_prefix_rename,
        "q_soft_delete_filter": q_soft_delete_filter,
        # r11-green (50)
        "q_audio_features": q_audio_features,
        "q_catalog_scan": q_catalog_scan,
        "q_categorical_profile": q_categorical_profile,
        "q_ccnet_buckets": q_ccnet_buckets,
        "q_centroid_by_label": q_centroid_by_label,
        "q_centroid_outliers": q_centroid_outliers,
        "q_chunk_dedup": q_chunk_dedup,
        "q_cluster_diversity": q_cluster_diversity,
        "q_cohort_retention": q_cohort_retention,
        "q_cumulative_users": q_cumulative_users,
        "q_cut_duplicate_spans": q_cut_duplicate_spans,
        "q_decontaminate": q_decontaminate,
        "q_dupe_detection": q_dupe_detection,
        "q_frame_sample": q_frame_sample,
        "q_funnel": q_funnel,
        "q_fuzzy_match": q_fuzzy_match,
        "q_gapfill_interp": q_gapfill_interp,
        "q_gapfill_locf": q_gapfill_locf,
        "q_gopher_rules": q_gopher_rules,
        "q_incremental_dedup": q_incremental_dedup,
        "q_interval_coverage": q_interval_coverage,
        "q_ivf_topk": q_ivf_topk,
        "q_kmeans": q_kmeans,
        "q_mad_outliers": q_mad_outliers,
        "q_merge_partial_aggs": q_merge_partial_aggs,
        "q_metadata_merge_join": q_metadata_merge_join,
        "q_multimodal_features": q_multimodal_features,
        "q_nb_classifier": q_nb_classifier,
        "q_pack_sequences": q_pack_sequences,
        "q_percentile_filter": q_percentile_filter,
        "q_quantized_topk": q_quantized_topk,
        "q_rolling_active": q_rolling_active,
        "q_rollup": q_rollup,
        "q_scd2": q_scd2,
        "q_set_ops": q_set_ops,
        "q_skew_report": q_skew_report,
        "q_span_stats": q_span_stats,
        "q_sql_local_supplier_volume": q_sql_local_supplier_volume,
        "q_sql_scalar_subquery": q_sql_scalar_subquery,
        "q_stratified_sample": q_stratified_sample,
        "q_stream_funnel": q_stream_funnel,
        "q_temperature_mix": q_temperature_mix,
        "q_topk": q_topk,
        "q_topk_similarity": q_topk_similarity,
        "q_transition_matrix": q_transition_matrix,
        "q_tumbling_window": q_tumbling_window,
        "q_weighted_sample": q_weighted_sample,
        "q_window_rank": q_window_rank,
        "q_window_running": q_window_running,
        "q_winnowing": q_winnowing,
        # r12-green (50)
        "q_anomaly_events": q_anomaly_events,
        "q_apply_bpe": q_apply_bpe,
        "q_approx_distinct": q_approx_distinct,
        "q_asof_join": q_asof_join,
        "q_bigram_logprob": q_bigram_logprob,
        "q_bpe_learn": q_bpe_learn,
        "q_bpe_tokens": q_bpe_tokens,
        "q_cap_per_source": q_cap_per_source,
        "q_conversion_latency": q_conversion_latency,
        "q_curriculum_bins": q_curriculum_bins,
        "q_doc_fingerprint": q_doc_fingerprint,
        "q_evolving_read": q_evolving_read,
        "q_exact_dedup": q_exact_dedup,
        "q_group_quantiles": q_group_quantiles,
        "q_hash_agg": q_hash_agg,
        "q_hash_split": q_hash_split,
        "q_heavy_hitters": q_heavy_hitters,
        "q_histogram": q_histogram,
        "q_hybrid_search": q_hybrid_search,
        "q_lang_id": q_lang_id,
        "q_lsh_topk": q_lsh_topk,
        "q_merge_latest": q_merge_latest,
        "q_nb_apply": q_nb_apply,
        "q_near_dup": q_near_dup,
        "q_ngram_jaccard": q_ngram_jaccard,
        "q_pii_scrub": q_pii_scrub,
        "q_pivot": q_pivot,
        "q_ppjoin_jaccard": q_ppjoin_jaccard,
        "q_quantize_embeddings": q_quantize_embeddings,
        "q_range_join": q_range_join,
        "q_salted_agg": q_salted_agg,
        "q_salted_join": q_salted_join,
        "q_semantic_dedup": q_semantic_dedup,
        "q_semantic_dedup_ivf": q_semantic_dedup_ivf,
        "q_semi_anti": q_semi_anti,
        "q_session_window": q_session_window,
        "q_simhash_near_dup": q_simhash_near_dup,
        "q_sliding_window": q_sliding_window,
        "q_snapshot_diff": q_snapshot_diff,
        "q_stream_dedup": q_stream_dedup,
        "q_stream_enrich": q_stream_enrich,
        "q_stream_join": q_stream_join,
        "q_stream_session": q_stream_session,
        "q_tfidf_cosine_pairs": q_tfidf_cosine_pairs,
        "q_tfidf_terms": q_tfidf_terms,
        "q_token_count": q_token_count,
        "q_tokenizer_fertility": q_tokenizer_fertility,
        "q_unigram_logprob": q_unigram_logprob,
        "q_unpivot": q_unpivot,
        "q_zorder_layout": q_zorder_layout,
    }


def oracle_sql() -> dict[str, str]:
    return _with_shared_oracles({
        "q_pii_view_projection": f"SELECT {_CUSTOMER_COLS} FROM customer",
        "q_safe_view_redaction": (
            "SELECT c_custkey, '<redacted>' AS c_name, c_nationkey, "
            "CAST(0 AS DOUBLE) AS c_acctbal, c_mktsegment FROM customer"
        ),
        "q_soft_delete_filter": (
            "SELECT * FROM lineitem WHERE l_shipdate IS NOT NULL"
        ),
        "q_banned_column_filter": (
            "SELECT event_id, ts, user_id, event_type, value FROM events"
        ),
        "q_include_filter": (
            "SELECT event_id, event_type, user_id, value FROM events "
            "WHERE event_type IN ('click','view','purchase')"
        ),
        "q_exclude_filter": (
            "SELECT event_id, event_type, user_id, value FROM events "
            "WHERE event_type NOT IN ('error','signup')"
        ),
        "q_chunked_union": f"SELECT {_CUSTOMER_COLS} FROM customer",
        "q_sort_group_collect": (
            "SELECT l_orderkey, string_agg(CAST(l_linenumber AS VARCHAR), ',' "
            "ORDER BY l_linenumber) AS linenumbers FROM lineitem GROUP BY l_orderkey"
        ),
        "q_prefix_rename": (
            "SELECT c_custkey AS evt_c_custkey, c_name AS evt_c_name, "
            "c_mktsegment AS evt_c_mktsegment FROM customer"
        ),
        "q_keyword_quoting": (
            'SELECT o_orderkey, o_orderstatus AS "order", '
            'o_orderpriority AS "group" FROM orders'
        ),
        "q_regex_anti_filter": (
            "SELECT doc_id, source, lang FROM documents "
            "WHERE NOT regexp_matches(source, '^src1.*$')"
        ),
        "q_scalar_kernel": (
            "SELECT c_custkey, upper(c_name) AS name_upper, "
            "concat_ws('_', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_key, "
            "split_part(c_name, '#', 1) AS first_tok, "
            "regexp_matches(c_name, '[0-9]') AS has_digit, "
            "(c_name LIKE 'C%') AS like_c, "
            "c_mktsegment IN ('BUILDING','MACHINERY') AS seg_known "
            "FROM customer"
        ),
        "q_metadata_merge_join": (
            "SELECT o.o_orderkey, o.o_custkey, "
            "COALESCE(c.c_name, '<new>') AS cust_name, "
            "COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment "
            "FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey"
        ),
        "q_dupe_detection": (
            "SELECT o_custkey, COUNT(*) AS n FROM orders "
            "GROUP BY o_custkey HAVING COUNT(*) > 1"
        ),
        "q_star_join": (
            "SELECT r_name, n_name, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
            "COUNT(*) AS n_items "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "GROUP BY r_name, n_name"
        ),
        "q_hash_agg": (
            "SELECT l_returnflag, l_linestatus, "
            "ROUND(SUM(l_quantity), 2) AS sum_qty, "
            "ROUND(SUM(l_extendedprice), 2) AS sum_base_price, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
            "ROUND(AVG(l_quantity), 4) AS avg_qty, "
            "ROUND(AVG(l_discount), 4) AS avg_disc, "
            "COUNT(*) AS count_order "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "q_semi_anti": (
            "SELECT c_custkey, 'has_order' AS segment FROM customer c "
            "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) "
            "UNION ALL "
            "SELECT c_custkey, 'no_order' AS segment FROM customer c "
            "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
        ),
        "q_rollup": (
            "SELECT o_orderpriority, o_orderstatus, "
            "ROUND(SUM(o_totalprice), 2) AS total_price, COUNT(*) AS n_orders "
            "FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)"
        ),
        "q_cube": (
            "SELECT o_orderstatus, o_orderpriority, "
            "ROUND(AVG(o_totalprice), 4) AS avg_price, COUNT(*) AS n_orders "
            "FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"
        ),
        "q_grouping_sets": (
            "SELECT o_orderstatus, o_orderpriority, "
            "ROUND(SUM(o_totalprice), 2) AS total_price, COUNT(*) AS n_orders "
            "FROM orders "
            "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))"
        ),
        "q_sliding_window": (
            "WITH starts AS (SELECT make_timestamp("
            "CAST(FLOOR(epoch_ms(ts) / 1800000) AS BIGINT) * 1800000000) "
            "AS s1, ts FROM events), "
            "expanded AS (SELECT s1 AS win_start FROM starts "
            "UNION ALL SELECT s1 - INTERVAL 30 MINUTE FROM starts) "
            "SELECT win_start, win_start + INTERVAL 60 MINUTE AS win_end, "
            "COUNT(*) AS n_events FROM expanded GROUP BY win_start"
        ),
        "q_window_rank": (
            "SELECT * FROM ("
            "SELECT o_custkey, o_orderkey, o_totalprice, "
            "ROW_NUMBER() OVER (PARTITION BY o_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey) AS rank FROM orders"
            ") WHERE rank <= 3"
        ),
        "q_window_running": (
            "SELECT o_custkey, o_orderkey, "
            "ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING), 2) "
            "AS running_total FROM orders"
        ),
        "q_topk": (
            "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
        ),
        "q_set_ops": (
            "WITH inter AS ("
            "SELECT c_custkey AS custkey FROM customer "
            "INTERSECT SELECT o_custkey FROM orders), "
            "rich AS (SELECT c_custkey AS custkey FROM customer "
            "WHERE c_acctbal > 5000) "
            "SELECT custkey, 'modest' AS bucket FROM "
            "(SELECT custkey FROM inter EXCEPT ALL SELECT custkey FROM rich) "
            "UNION ALL "
            "SELECT custkey, 'rich' AS bucket FROM "
            "(SELECT custkey FROM inter INTERSECT SELECT custkey FROM rich)"
        ),
        # integer SUMs are CAST to BIGINT everywhere: DuckDB types them
        # HUGEINT (int128), which hashes differently from Spark's BIGINT
        # in the driver's type-sensitive value hash even for equal values
        "q_pivot": (
            "SELECT user_id, "
            "CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click, "
            "CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error, "
            "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase, "
            "CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup, "
            "CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view "
            "FROM events GROUP BY user_id"
        ),
        "q_unpivot": (
            "WITH p AS (SELECT user_id, "
            "CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click, "
            "CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error, "
            "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase, "
            "CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup, "
            "CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view "
            "FROM events GROUP BY user_id) "
            "SELECT user_id, 'click' AS event_type, click AS n FROM p "
            "UNION ALL SELECT user_id, 'error', error FROM p "
            "UNION ALL SELECT user_id, 'purchase', purchase FROM p "
            "UNION ALL SELECT user_id, 'signup', signup FROM p "
            "UNION ALL SELECT user_id, 'view', view FROM p"
        ),
        "q_asof_join": (
            "SELECT c.event_id, c.user_id, epoch_ms(c.ts) AS ts_ms, "
            "p.value AS last_purchase_value "
            "FROM (SELECT * FROM events WHERE event_type = 'click') c "
            "ASOF LEFT JOIN "
            "(SELECT * FROM events WHERE event_type = 'purchase') p "
            "ON c.user_id = p.user_id AND c.ts >= p.ts"
        ),
        "q_range_join": (
            "SELECT c.event_id AS click_id, p.event_id AS purchase_id "
            "FROM (SELECT * FROM events WHERE event_type = 'click') c "
            "JOIN (SELECT * FROM events WHERE event_type = 'purchase') p "
            "ON c.user_id = p.user_id "
            "AND epoch_ms(p.ts) >= epoch_ms(c.ts) "
            "AND epoch_ms(p.ts) <= epoch_ms(c.ts) + 3600000"
        ),
        "q_salted_agg": (
            "SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS sum_o_totalprice "
            "FROM orders GROUP BY o_custkey"
        ),
        "q_salted_join": (
            "SELECT c_mktsegment, COUNT(*) AS n_orders, "
            "ROUND(SUM(o_totalprice), 2) AS total_price "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_mktsegment"
        ),
        # avg_value uses the same fixed-point micro-unit accumulation as the
        # Spark side (profiling._det_avg_nullaware): exact integer sums are
        # summation-order independent, plain AVG(float) is not
        "q_profile": (
            "SELECT 'o_custkey' AS column_name, COUNT(*) AS n, "
            "CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, "
            "COUNT(DISTINCT o_custkey) AS n_distinct, "
            "CAST(MIN(o_custkey) AS DOUBLE) AS min_value, "
            "CAST(MAX(o_custkey) AS DOUBLE) AS max_value, "
            "CAST(SUM(CAST(ROUND(CAST(o_custkey AS DOUBLE) * 1000000) AS BIGINT)) "
            "AS DOUBLE) / (COUNT(o_custkey) * CAST(1000000 AS DOUBLE)) "
            "AS avg_value FROM orders "
            "UNION ALL "
            "SELECT 'o_totalprice', COUNT(*), "
            "CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT), "
            "COUNT(DISTINCT o_totalprice), "
            "CAST(MIN(o_totalprice) AS DOUBLE), "
            "CAST(MAX(o_totalprice) AS DOUBLE), "
            "CAST(SUM(CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 1000000) AS BIGINT)) "
            "AS DOUBLE) / (COUNT(o_totalprice) * CAST(1000000 AS DOUBLE)) "
            "FROM orders"
        ),
        "q_tumbling_window": (
            "SELECT date_trunc('hour', ts) AS bucket, COUNT(*) AS n_events, "
            "SUM(CAST(round(value * 1e6) AS BIGINT)) / 1e6 AS sum_value, "
            "COUNT(DISTINCT user_id) AS n_users "
            "FROM events GROUP BY date_trunc('hour', ts)"
        ),
        "q_transition_matrix": (
            # session numbering mirrors q_session_window's oracle; the
            # lead must not cross a session boundary
            "WITH f AS (SELECT user_id, event_id, ts, event_type, "
            "CASE WHEN lag(ts) OVER w IS NULL "
            "OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000 "
            "THEN 1 ELSE 0 END AS is_new FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "s AS (SELECT user_id, event_id, ts, event_type, "
            "SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            "AS session_id FROM f), "
            "st AS (SELECT event_type AS from_type, "
            "lead(event_type) OVER w AS to_type, "
            "lead(session_id) OVER w = session_id AS same_sess FROM s "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "c AS (SELECT from_type, to_type, COUNT(*) AS n FROM st "
            "WHERE same_sess AND to_type IS NOT NULL GROUP BY 1, 2), "
            "rt AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS row_total "
            "FROM c GROUP BY 1) "
            "SELECT from_type, to_type, n, "
            "(1000 * n) // row_total AS prob_milli "
            "FROM c JOIN rt USING (from_type)"
        ),
        "q_conversion_latency": (
            # funnel chaining as in q_funnel; mean via the _det_avg
            # micro-unit pattern, exact interpolated quantiles
            "WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms "
            "FROM events), "
            "s1 AS (SELECT user_id, MIN(ms) AS t1 FROM e "
            "WHERE event_type = 'view' GROUP BY 1), "
            "s2 AS (SELECT e.user_id, MIN(e.ms) AS t FROM e "
            "JOIN s1 ON e.user_id = s1.user_id "
            "WHERE e.event_type = 'click' AND e.ms > s1.t1 GROUP BY 1), "
            "s3 AS (SELECT e.user_id, MIN(e.ms) AS t FROM e "
            "JOIN s2 ON e.user_id = s2.user_id "
            "WHERE e.event_type = 'purchase' AND e.ms > s2.t GROUP BY 1), "
            "lat AS (SELECT s3.user_id, s3.t - s1.t1 AS latency_ms "
            "FROM s3 JOIN s1 ON s3.user_id = s1.user_id) "
            "SELECT COUNT(*) AS n_converted, "
            "CAST(CASE WHEN SUM(CAST(ROUND(latency_ms * 1e6) AS BIGINT)) < 0 THEN -((2 * (-(SUM(CAST(ROUND(latency_ms * 1e6) AS BIGINT)))) + (COUNT(*) * 100)) // (2 * (COUNT(*) * 100))) ELSE (2 * (SUM(CAST(ROUND(latency_ms * 1e6) AS BIGINT))) + (COUNT(*) * 100)) // (2 * (COUNT(*) * 100)) END AS DOUBLE) / 10000.0 + 0.0 AS mean_ms, "
            "ROUND(quantile_cont(latency_ms, 0.5), 4) + 0.0 AS p50_ms, "
            "ROUND(quantile_cont(latency_ms, 0.9), 4) + 0.0 AS p90_ms, "
            "ROUND(quantile_cont(latency_ms, 0.99), 4) + 0.0 AS p99_ms "
            "FROM lat"
        ),
        "q_cumulative_users": (
            "WITH ud AS (SELECT DISTINCT user_id, "
            "CAST(FLOOR(epoch_ms(ts) / 86400000) AS BIGINT) AS day "
            "FROM events), "
            "fst AS (SELECT user_id, MIN(day) AS day FROM ud GROUP BY 1), "
            "nb AS (SELECT day, COUNT(*) AS n_new FROM fst GROUP BY 1), "
            "ab AS (SELECT day, COUNT(DISTINCT user_id) AS n_active "
            "FROM ud GROUP BY 1) "
            "SELECT ab.day, CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new, "
            "n_active, CAST(SUM(COALESCE(n_new, 0)) OVER (ORDER BY ab.day "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
            "AS cumulative_users FROM ab LEFT JOIN nb USING (day)"
        ),
        "q_scd2": (
            "WITH f AS (SELECT user_id, event_type, ts, event_id, "
            "epoch_ms(ts) AS ms, "
            "CASE WHEN lag(event_type) OVER w IS NULL "
            "OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END "
            "AS changed FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "v AS (SELECT user_id, event_type, ms, "
            "CAST(SUM(changed) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "CURRENT ROW) AS BIGINT) AS version FROM f), "
            "sp AS (SELECT user_id, version, "
            "ANY_VALUE(event_type) AS state, MIN(ms) AS valid_from_ms, "
            "COUNT(*) AS n_events FROM v GROUP BY 1, 2) "
            "SELECT user_id, version, state, valid_from_ms, "
            "lead(valid_from_ms) OVER pw AS valid_to_ms, "
            "CASE WHEN lead(valid_from_ms) OVER pw IS NULL THEN 1 ELSE 0 "
            "END AS is_current, n_events FROM sp "
            "WINDOW pw AS (PARTITION BY user_id ORDER BY version)"
        ),
        "q_sql_local_supplier_volume": (
            "SELECT n_name, "
            "CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) "
            "AS BIGINT)) AS BIGINT) AS revenue_cents, "
            "COUNT(*) AS n_lineitems "
            "FROM customer "
            "JOIN orders ON c_custkey = o_custkey "
            "JOIN lineitem ON l_orderkey = o_orderkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "AND c_nationkey = s_nationkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'ASIA' "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01' "
            "GROUP BY n_name"
        ),
        "q_gapfill_interp": (
            # floor through DOUBLE division on BOTH engines: DuckDB's
            # integer // truncates toward zero while Spark F.floor
            # floors — the double ratio is exact while the bucket span
            # is far below the 2^53/ulp boundary
            "WITH b AS (SELECT event_type, "
            "CAST(FLOOR(epoch_ms(ts) / 900000) AS BIGINT) AS bucket, "
            "CAST(SUM(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS s "
            "FROM events GROUP BY 1, 2), "
            "r AS (SELECT event_type, MIN(bucket) AS mn, MAX(bucket) AS mx "
            "FROM b GROUP BY 1), "
            "g AS (SELECT event_type, UNNEST(generate_series(mn, mx)) "
            "AS bucket FROM r), "
            "j AS (SELECT g.event_type, g.bucket, b.s FROM g "
            "LEFT JOIN b USING (event_type, bucket)), "
            "w AS (SELECT event_type, bucket, s, "
            "LAST_VALUE(s IGNORE NULLS) OVER pw AS pv, "
            "LAST_VALUE(CASE WHEN s IS NOT NULL THEN bucket END "
            "IGNORE NULLS) OVER pw AS pb, "
            "FIRST_VALUE(s IGNORE NULLS) OVER nw AS nv, "
            "FIRST_VALUE(CASE WHEN s IS NOT NULL THEN bucket END "
            "IGNORE NULLS) OVER nw AS nb FROM j "
            "WINDOW pw AS (PARTITION BY event_type ORDER BY bucket "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), "
            "nw AS (PARTITION BY event_type ORDER BY bucket "
            "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) "
            "SELECT event_type, bucket * 900000 AS bucket_ms, "
            "CAST(CASE WHEN s IS NOT NULL THEN s "
            "WHEN pv IS NULL THEN nv WHEN nv IS NULL THEN pv "
            "ELSE pv + CAST(FLOOR(((nv - pv) * (bucket - pb)) "
            "/ CAST(nb - pb AS DOUBLE)) AS BIGINT) END AS BIGINT) "
            "AS interp_sum_micro, "
            "CASE WHEN s IS NULL THEN 1 ELSE 0 END AS is_gap FROM w"
        ),
        "q_rolling_active": (
            "WITH ud AS (SELECT DISTINCT user_id, "
            "CAST(FLOOR(epoch_ms(ts) / 86400000) AS BIGINT) AS day "
            "FROM events), "
            "bounds AS (SELECT MAX(day) AS mxd FROM ud), "
            "contrib AS (SELECT DISTINCT user_id, day + o AS cday "
            "FROM ud, LATERAL UNNEST(generate_series(0, 6)) AS t(o)), "
            "cl AS (SELECT user_id, cday FROM contrib, bounds "
            "WHERE cday <= mxd), "
            "wnd AS (SELECT cday, COUNT(DISTINCT user_id) "
            "AS n_active_window FROM cl GROUP BY 1), "
            "dly AS (SELECT day AS cday, COUNT(DISTINCT user_id) "
            "AS n_active_day FROM ud GROUP BY 1) "
            "SELECT w.cday AS day, n_active_window, "
            "CAST(COALESCE(n_active_day, 0) AS BIGINT) AS n_active_day "
            "FROM wnd w LEFT JOIN dly USING (cday)"
        ),
        "q_interval_coverage": (
            "WITH iv AS (SELECT user_id, event_id, epoch_ms(ts) AS i_start, "
            "epoch_ms(ts) + 300000 AS i_end FROM events), "
            "w AS (SELECT user_id, event_id, i_start, i_end, "
            "CASE WHEN MAX(i_end) OVER pw IS NULL "
            "OR i_start > MAX(i_end) OVER pw THEN 1 ELSE 0 END AS is_new "
            "FROM iv WINDOW pw AS (PARTITION BY user_id "
            "ORDER BY i_start, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), "
            "isl AS (SELECT user_id, i_start, i_end, "
            "SUM(is_new) OVER (PARTITION BY user_id "
            "ORDER BY i_start, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island "
            "FROM w), "
            "m AS (SELECT user_id, island, MIN(i_start) AS m_start, "
            "MAX(i_end) AS m_end, COUNT(*) AS n_iv FROM isl GROUP BY 1, 2) "
            "SELECT user_id, CAST(SUM(n_iv) AS BIGINT) AS n_intervals, "
            "COUNT(*) AS n_islands, "
            "CAST(SUM(m_end - m_start) AS BIGINT) AS covered_ms "
            "FROM m GROUP BY 1"
        ),
        "q_source_kl": (
            "WITH st AS (SELECT source, token, COUNT(*) AS c_st FROM ("
            "SELECT source, "
            "unnest(regexp_split_to_array(trim(text), '\\s+')) AS token "
            "FROM documents) GROUP BY 1, 2), "
            "s_tot AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s "
            "FROM st GROUP BY 1), "
            "g_tot AS (SELECT token, CAST(SUM(c_st) AS BIGINT) AS c_t "
            "FROM st GROUP BY 1), "
            "tot AS (SELECT CAST(SUM(c_st) AS BIGINT) AS n FROM st) "
            "SELECT source, "
            "CAST(SUM(CAST(round((c_st / CAST(n_s AS DOUBLE)) "
            "* ln((c_st * n) / CAST(n_s * c_t AS DOUBLE)) * 1e6) "
            "AS BIGINT)) AS BIGINT) AS kl_micro, "
            "ANY_VALUE(n_s) AS n_tokens, COUNT(*) AS vocab_used "
            "FROM st JOIN s_tot USING (source) JOIN g_tot USING (token) "
            "CROSS JOIN tot GROUP BY source"
        ),
        # generator extracted r10 for the parameter-sweep differentials
        # (byte-identical at the driver params — manifest-checked)
        "q_containment": _containment_oracle_sql(),
        "q_bm25_search": (
            # mirrors text.bm25_search term for term: Lucene idf,
            # micro-unit integer score sums, (score, doc_id) tie-break,
            # rank assigned after the limit. Float expression order
            # matches the Spark build exactly (left-assoc * and /).
            "WITH d AS (SELECT doc_id, "
            "len(regexp_split_to_array(trim(text), '\\s+')) AS dl "
            "FROM documents), "
            "st AS (SELECT CAST(SUM(dl) AS BIGINT) AS tot, COUNT(*) AS n "
            "FROM d), "
            "toks AS (SELECT doc_id, "
            "unnest(regexp_split_to_array(trim(text), '\\s+')) AS token "
            "FROM documents), "
            "q AS (SELECT doc_id, token FROM toks "
            "WHERE token IN ('dup', 'join', 'vector')), "
            "df AS (SELECT token, COUNT(DISTINCT doc_id) AS df "
            "FROM q GROUP BY 1), "
            "tf AS (SELECT doc_id, token, COUNT(*) AS tf "
            "FROM q GROUP BY 1, 2), "
            "agg AS (SELECT tf.doc_id, "
            "CAST(SUM(CAST(round(ln(1 + (n - df + 0.5) / (df + 0.5)) "
            "* (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl "
            "/ (tot / CAST(n AS DOUBLE)))) * 1e6) AS BIGINT)) AS BIGINT) "
            "AS score_micro, COUNT(*) AS n_hit_terms "
            "FROM tf JOIN df USING (token) JOIN d ON tf.doc_id = d.doc_id "
            "CROSS JOIN st GROUP BY 1) "
            "SELECT * FROM (SELECT CAST(row_number() OVER ("
            "ORDER BY score_micro DESC, doc_id) AS INT) AS rnk, "
            "doc_id, score_micro, n_hit_terms FROM agg) WHERE rnk <= 20"
        ),
        "q_pmi_pairs": (
            "WITH d AS (SELECT DISTINCT doc_id, token FROM ("
            "SELECT doc_id, "
            "unnest(regexp_split_to_array(trim(text), '\\s+')) AS token "
            "FROM documents)), "
            "df AS (SELECT token, COUNT(*) AS dfc FROM d GROUP BY 1), "
            "v AS (SELECT token, dfc FROM (SELECT token, dfc, "
            "row_number() OVER (ORDER BY dfc DESC, token) AS r FROM df) "
            "WHERE r <= 1000), "
            "dv AS (SELECT d.doc_id, d.token, v.dfc FROM d "
            "JOIN v USING (token)), "
            "nd AS (SELECT COUNT(*) AS n_docs FROM documents), "
            "p AS (SELECT x.token AS w1, y.token AS w2, "
            "CAST(COUNT(*) AS BIGINT) AS c_ab, "
            "ANY_VALUE(x.dfc) AS c_a, ANY_VALUE(y.dfc) AS c_b "
            "FROM dv x JOIN dv y ON x.doc_id = y.doc_id "
            "AND x.token < y.token GROUP BY 1, 2) "
            "SELECT w1, w2, c_ab, "
            "ROUND(ln((c_ab * n_docs) / CAST(c_a * c_b AS DOUBLE)), 4) "
            "+ 0.0 AS pmi_r4 FROM p CROSS JOIN nd WHERE c_ab >= 5"
        ),
        "q_gapfill_locf": (
            # mirrors timeseries.gapfill_locf: 15-min integer buckets,
            # micro-unit sums, dense per-series axis, LOCF window
            "WITH b AS (SELECT event_type, "
            "CAST(FLOOR(epoch_ms(ts) / 900000) AS BIGINT) AS bucket, "
            "COUNT(*) AS n_events, "
            "CAST(SUM(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS s "
            "FROM events GROUP BY 1, 2), "
            "r AS (SELECT event_type, MIN(bucket) AS mn, MAX(bucket) AS mx "
            "FROM b GROUP BY 1), "
            "g AS (SELECT event_type, UNNEST(generate_series(mn, mx)) AS bucket "
            "FROM r), "
            "j AS (SELECT g.event_type, g.bucket, b.n_events, b.s "
            "FROM g LEFT JOIN b USING (event_type, bucket)) "
            "SELECT event_type, bucket * 900000 AS bucket_ms, "
            "CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events, "
            "CAST(COALESCE(LAST_VALUE(s IGNORE NULLS) OVER ("
            "PARTITION BY event_type ORDER BY bucket "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT) "
            "AS locf_sum_micro, "
            "CASE WHEN s IS NULL THEN 1 ELSE 0 END AS is_gap FROM j"
        ),
        "q_funnel": (
            "WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms "
            "FROM events), "
            "s1 AS (SELECT user_id, MIN(ms) AS t FROM e "
            "WHERE event_type = 'view' GROUP BY 1), "
            "s2 AS (SELECT e.user_id, MIN(e.ms) AS t FROM e "
            "JOIN s1 ON e.user_id = s1.user_id "
            "WHERE e.event_type = 'click' AND e.ms > s1.t GROUP BY 1), "
            "s3 AS (SELECT e.user_id, MIN(e.ms) AS t FROM e "
            "JOIN s2 ON e.user_id = s2.user_id "
            "WHERE e.event_type = 'purchase' AND e.ms > s2.t GROUP BY 1) "
            "SELECT 1 AS stage, 'view' AS step, "
            "(SELECT COUNT(*) FROM s1) AS n_users "
            "UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2) "
            "UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)"
        ),
        "q_cohort_retention": (
            "WITH ev AS (SELECT user_id, "
            "CAST(FLOOR(epoch_ms(ts) / 604800000) AS BIGINT) AS week "
            "FROM events), "
            "c AS (SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY 1), "
            "a AS (SELECT DISTINCT user_id, week FROM ev) "
            "SELECT cohort_week, week - cohort_week AS offset_weeks, "
            "COUNT(DISTINCT user_id) AS n_users "
            "FROM a JOIN c USING (user_id) GROUP BY 1, 2"
        ),
        "q_mad_outliers": (
            # exact interpolated medians on both sides; integer outlier
            # counts are the robust hashed surface, rounded medians ride
            # along (2-decimal source data -> no 5th-decimal round ties)
            "WITH med AS (SELECT event_type, MEDIAN(value) AS med "
            "FROM events GROUP BY 1), "
            "dev AS (SELECT e.event_type, e.value, "
            "ABS(e.value - m.med) AS adev FROM events e "
            "JOIN med m USING (event_type)), "
            "mad AS (SELECT d.event_type, MEDIAN(d.adev) AS mad "
            "FROM dev d GROUP BY 1) "
            "SELECT d.event_type, COUNT(*) AS n, "
            "CAST(SUM(CASE WHEN d.adev > 3.0 * x.mad THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_outliers, "
            "ROUND(ANY_VALUE(m.med), 4) + 0.0 AS med_r4, "
            "ROUND(ANY_VALUE(x.mad), 4) + 0.0 AS mad_r4 "
            "FROM dev d JOIN mad x USING (event_type) "
            "JOIN med m USING (event_type) GROUP BY 1"
        ),
        "q_session_window": (
            "WITH flagged AS ("
            "SELECT user_id, event_id, ts, "
            "CASE WHEN lag(ts) OVER w IS NULL "
            "OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000 "
            "THEN 1 ELSE 0 END AS is_new FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "sess AS (SELECT user_id, ts, "
            "CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM flagged) "
            # epoch_ms bigints, not raw timestamps: DuckDB keeps the parquet
            # TIMESTAMP(NANOS) at ns while Spark truncates to us — raw ts
            # output is a type-level hash hazard; ms truncation agrees
            "SELECT user_id, session_id, COUNT(*) AS n_events, "
            "epoch_ms(MIN(ts)) AS session_start_ms, "
            "epoch_ms(MAX(ts)) AS session_end_ms "
            "FROM sess GROUP BY user_id, session_id"
        ),
        "q_json_extract": (
            "SELECT event_type, COUNT(*) AS n_events, "
            "CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) "
            "AS DOUBLE) / COUNT(json_extract_string(props, '$.k')) "
            "AS avg_k, "
            "MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k "
            "FROM events GROUP BY event_type"
        ),
        "q_schema_tests": (
            "SELECT 'customer_key_unique' AS test_name, "
            "CAST(COALESCE((SELECT SUM(n) FROM (SELECT COUNT(*) AS n FROM customer "
            "GROUP BY c_custkey HAVING COUNT(*) > 1)), 0) AS BIGINT) AS n_violations, "
            "COALESCE((SELECT SUM(n) FROM (SELECT COUNT(*) AS n FROM customer "
            "GROUP BY c_custkey HAVING COUNT(*) > 1)), 0) = 0 AS passed "
            "UNION ALL SELECT 'orders_key_not_null', "
            "(SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL), "
            "(SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL) = 0 "
            "UNION ALL SELECT 'order_status_accepted', "
            "(SELECT COUNT(*) FROM orders WHERE o_orderstatus NOT IN ('F','O','P')), "
            "(SELECT COUNT(*) FROM orders WHERE o_orderstatus NOT IN ('F','O','P')) = 0 "
            "UNION ALL SELECT 'orders_custkey_refs_customer', "
            "(SELECT COUNT(*) FROM orders WHERE o_custkey IS NOT NULL AND o_custkey "
            "NOT IN (SELECT c_custkey FROM customer)), "
            "(SELECT COUNT(*) FROM orders WHERE o_custkey IS NOT NULL AND o_custkey "
            "NOT IN (SELECT c_custkey FROM customer)) = 0 "
            "UNION ALL SELECT 'lineitem_orderkey_refs_orders', "
            "(SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NOT NULL AND l_orderkey "
            "NOT IN (SELECT o_orderkey FROM orders)), "
            "(SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NOT NULL AND l_orderkey "
            "NOT IN (SELECT o_orderkey FROM orders)) = 0"
        ),
        "q_catalog_scan": (
            "SELECT table_name, column_name, "
            "CAST(ordinal_position AS INT) AS ordinal "
            "FROM information_schema.columns WHERE table_name IN "
            "('region','nation','customer','supplier','part','orders',"
            "'lineitem','events','documents','embeddings')"
        ),
        "q_sql_shipping_priority": (
            "SELECT l_orderkey, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
            "o_orderdate, o_orderpriority "
            "FROM customer JOIN orders ON c_custkey = o_custkey "
            "JOIN lineitem ON l_orderkey = o_orderkey "
            "WHERE c_mktsegment = 'BUILDING' "
            "AND o_orderdate < TIMESTAMP '1998-01-01' "
            "AND l_shipdate > TIMESTAMP '1998-01-01' "
            "GROUP BY l_orderkey, o_orderdate, o_orderpriority "
            "ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10"
        ),
        "q_sql_correlated_exists": (
            "SELECT c_custkey, c_mktsegment FROM customer c "
            "WHERE EXISTS (SELECT 1 FROM orders o "
            "WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)"
        ),
        "q_sql_scalar_subquery": (
            "SELECT o_orderkey, o_custkey, "
            "ROUND(o_totalprice, 2) AS o_totalprice FROM orders "
            "WHERE o_totalprice > (SELECT AVG(o_totalprice) * 2 FROM orders)"
        ),
        "q_exact_dedup": (
            "SELECT md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) "
            "AS content_md5, MIN(doc_id) AS keep_doc_id, "
            "COUNT(*) AS n_copies FROM documents GROUP BY 1"
        ),
        "q_ngram_jaccard": _ngram_jaccard_oracle_sql(0.2),
        "q_group_quantiles": (
            "SELECT lang, ROUND(quantile_cont(n_chars, 0.5), 4) AS median_chars, "
            "ROUND(quantile_cont(n_chars, 0.9), 4) AS p90_chars "
            "FROM documents GROUP BY lang"
        ),
        "q_topk_similarity": (
            # r11 zero-norm guard: list_cosine_similarity CLAMPS
            # zero-norm results to -1.0 while the guarded Spark cosine
            # scores them 0.0 — the CASE mirrors cosine()'s na==0
            # predicate exactly (same float squares, nonneg sum)
            "WITH q AS (SELECT vec_id AS query_id, "
            "CAST(embedding AS DOUBLE[]) AS qv FROM embeddings "
            "ORDER BY vec_id LIMIT 5), "
            "s AS (SELECT query_id, vec_id, "
            "CASE WHEN list_sum(list_transform(qv, x -> x*x)) = 0 "
            "OR list_sum(list_transform(CAST(embedding AS DOUBLE[]), "
            "x -> x*x)) = 0 THEN CAST(0.0 AS DOUBLE) ELSE "
            "list_cosine_similarity(qv, CAST(embedding AS DOUBLE[])) END "
            "AS raw FROM q, embeddings) "
            "SELECT query_id, vec_id, ROUND(raw, 4) + 0.0 AS sim, "
            "ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY "
            "raw DESC, vec_id) AS rank FROM s QUALIFY rank <= 5"
        ),
        # zero-norm note (r11): this string is intentionally UNCHANGED
        # by the cosine guard — DuckDB clamps zero-norm cosines to -1.0
        # and Spark's guard scores them 0.0, both strictly below the
        # positive threshold, so zero-norm pairs are excluded on BOTH
        # sides by the same WHERE. Same argument covers q_semantic_dedup
        # and q_semantic_dedup_ivf (thr 0.4). (The sum-of-squares
        # UNDERFLOW shape, where DuckDB clamps +inf to 1.0, is
        # unreachable from float32 fixtures and dyadic differential
        # grids — |x| >= 1e-154 keeps x*x normal.)
        "q_embedding_near_dup": (
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
            "ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])), 4) AS sim "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.5"
        ),
        "q_centroid_by_label": (
            # fixed-point accumulation mirrors the Spark side: exact
            # integer sums are order-independent, plain AVG(float) is not
            "SELECT label, ord AS pos, "
            "CAST(CASE WHEN SUM(CAST(ROUND(CAST(val AS DOUBLE) * 1000000) AS BIGINT)) < 0 THEN -((2 * (-(SUM(CAST(ROUND(CAST(val AS DOUBLE) * 1000000) AS BIGINT)))) + (COUNT(*) * 100)) // (2 * (COUNT(*) * 100))) ELSE (2 * (SUM(CAST(ROUND(CAST(val AS DOUBLE) * 1000000) AS BIGINT))) + (COUNT(*) * 100)) // (2 * (COUNT(*) * 100)) END AS DOUBLE) / 10000.0 + 0.0 AS avg_val FROM "
            "(SELECT label, unnest(embedding) AS val, "
            "generate_subscripts(embedding, 1) AS ord FROM embeddings) "
            "GROUP BY label, ord"
        ),
        # centroid hygiene gate: the proven fixed-point centroid means
        # assembled per label, the proven list_cosine_similarity + ROUND
        # idiom for the surface; the flag compares the unrounded cosine
        "q_centroid_outliers": (
            "WITH cent AS (SELECT label, ord AS pos, "
            "CAST(CASE WHEN SUM(CAST(ROUND(CAST(val AS DOUBLE) * 1000000) AS BIGINT)) < 0 THEN -((2 * (-(SUM(CAST(ROUND(CAST(val AS DOUBLE) * 1000000) AS BIGINT)))) + (COUNT(*) * 100)) // (2 * (COUNT(*) * 100))) ELSE (2 * (SUM(CAST(ROUND(CAST(val AS DOUBLE) * 1000000) AS BIGINT))) + (COUNT(*) * 100)) // (2 * (COUNT(*) * 100)) END AS DOUBLE) / 10000.0 + 0.0 AS avg_val FROM "
            "(SELECT label, unnest(embedding) AS val, "
            "generate_subscripts(embedding, 1) AS ord FROM embeddings) "
            "GROUP BY label, ord), "
            "cv AS (SELECT label, list(avg_val ORDER BY pos) AS cvec "
            "FROM cent GROUP BY label), "
            # r11 zero-norm guard: a zero CENTROID is reachable from
            # nonzero vectors (opposite pairs cancel the fixed-point
            # mean exactly) — guarded cosine scores it 0.0 where DuckDB
            # clamps to -1.0
            "s AS (SELECT e.vec_id, e.label, "
            "CASE WHEN list_sum(list_transform(CAST(e.embedding AS "
            "DOUBLE[]), x -> x*x)) = 0 OR list_sum(list_transform("
            "cv.cvec, x -> x*x)) = 0 THEN CAST(0.0 AS DOUBLE) ELSE "
            "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), cv.cvec) END "
            "AS sim FROM embeddings e JOIN cv USING (label)) "
            "SELECT vec_id, label, ROUND(sim, 4) + 0.0 AS sim_centroid, "
            "CAST(sim < 0.0 AS INT) AS is_outlier FROM s"
        ),
        "q_token_count": (
            "SELECT doc_id, "
            "len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens, "
            "CAST(FLOOR(length(text) / 4.0) AS BIGINT) AS approx_bpe_tokens "
            "FROM documents"
        ),
        "q_quality_score": (
            "WITH toks AS (SELECT doc_id, length(text) AS n_chars, "
            "regexp_split_to_array(trim(text), '\\s+') AS t FROM documents) "
            # unrounded raw quotients (r10 tie-class retirement); CAST AS
            # DOUBLE, never * 1.0 — DuckDB types 1.0 as DECIMAL and a
            # decimal division is not the IEEE quotient Spark runs
            "SELECT doc_id, n_chars, len(t) AS n_tokens, "
            "CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) "
            "/ len(t) AS avg_token_len, "
            "CAST(len(list_filter(t, x -> x IN ('the','a','and','of','to'))) "
            "AS DOUBLE) / len(t) AS stopword_ratio FROM toks"
        ),
        "q_text_stats": (
            "SELECT lang, COUNT(*) AS n_docs, "
            "CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars, "
            "CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) "
            "AS DOUBLE) / COUNT(*) AS avg_tokens "
            "FROM documents GROUP BY lang"
        ),
        "q_tfidf_terms": (
            "WITH terms AS (SELECT doc_id, unnest("
            "regexp_split_to_array(trim(text), '\\s+')) AS term FROM documents), "
            "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms "
            "GROUP BY doc_id, term), "
            "dfc AS (SELECT term, COUNT(*) AS df FROM "
            "(SELECT DISTINCT doc_id, term FROM terms) GROUP BY term), "
            "n AS (SELECT COUNT(*) AS n_docs FROM documents), "
            "scored AS (SELECT doc_id, tf.term, "
            "ROUND(tf * LN(n_docs * 1.0 / df), 4) AS tfidf "
            "FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN n) "
            "SELECT doc_id, term, tfidf, rank FROM "
            "(SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id "
            "ORDER BY tfidf DESC, term) AS rank FROM scored) WHERE rank <= 3"
        ),
        "q_bpe_tokens": (
            "SELECT doc_id, "
            "len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]')) "
            "AS n_bpe_tokens, "
            "len(list_distinct(regexp_extract_all(text, "
            "'[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]'))) AS n_unique_tokens "
            "FROM documents"
        ),
        "q_doc_fingerprint": (
            "SELECT doc_id, md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) "
            "AS content_md5 FROM documents"
        ),
        "q_lang_id": (
            "WITH t AS (SELECT doc_id, "
            "regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents), "
            "s AS ("
            "SELECT doc_id, 'de' AS lang, len(list_filter(toks, x -> lower(x) IN "
            "('der','die','und','das','ist'))) AS score FROM t UNION ALL "
            "SELECT doc_id, 'en', len(list_filter(toks, x -> lower(x) IN "
            "('the','a','and','of','to'))) FROM t UNION ALL "
            "SELECT doc_id, 'es', len(list_filter(toks, x -> lower(x) IN "
            "('el','la','y','los','de'))) FROM t UNION ALL "
            "SELECT doc_id, 'fr', len(list_filter(toks, x -> lower(x) IN "
            "('le','la','et','les','des'))) FROM t UNION ALL "
            "SELECT doc_id, 'zh', len(list_filter(toks, x -> lower(x) IN "
            "('de','le','shi','zai','he'))) FROM t) "
            "SELECT doc_id, lang AS pred_lang, score AS marker_hits FROM "
            "(SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id "
            "ORDER BY score DESC, lang) AS rn FROM s) WHERE rn = 1"
        ),
        "q_ivf_topk": (
            # r11 zero-norm guard in the argmax: guarded 0.0 can WIN
            # over negative sims, DuckDB's -1.0 clamp always loses —
            # the one shape where the engines' rankings diverge
            "WITH c AS (SELECT vec_id AS centroid_id, "
            "CAST(embedding AS DOUBLE[]) AS cv FROM embeddings "
            "ORDER BY vec_id DESC LIMIT 16) "
            "SELECT vec_id, centroid_id FROM "
            "(SELECT e.vec_id, c.centroid_id, ROW_NUMBER() OVER "
            "(PARTITION BY e.vec_id ORDER BY "
            "CASE WHEN list_sum(list_transform(CAST(e.embedding AS "
            "DOUBLE[]), x -> x*x)) = 0 OR list_sum(list_transform(c.cv, "
            "x -> x*x)) = 0 THEN CAST(0.0 AS DOUBLE) ELSE "
            "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv) END "
            "DESC, c.centroid_id) AS rn FROM embeddings e, c) WHERE rn = 1"
        ),
        "q_pii_scrub": (
            # same pattern chain, same order as text.PII_PATTERNS; 'g'
            # because DuckDB's regexp_replace is first-match by default
            "SELECT doc_id, "
            "len(regexp_extract_all(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email, "
            "len(regexp_extract_all(text, '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS n_ssn, "
            "len(regexp_extract_all(text, "
            "'\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b')) AS n_phone, "
            "len(regexp_extract_all(text, "
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ipv4, "
            "md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace("
            "text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
            "'\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'), "
            "'\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<PHONE>', 'g'), "
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g')) "
            "AS redacted_md5 FROM documents"
        ),
        "q_repetition_stats": (
            "WITH toks AS (SELECT doc_id, "
            "regexp_split_to_array(trim(text), '\\s+') AS t FROM documents), "
            # unrounded raw quotients, CAST AS DOUBLE (r10 retirement)
            "base AS (SELECT doc_id, len(t) AS n_tokens, "
            "CAST(len(t) - len(list_distinct(t)) AS DOUBLE) / len(t) "
            "AS dup_token_fraction, t FROM toks), "
            "bi AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS bigram "
            "FROM base, LATERAL unnest(generate_series(1, len(t)-1)) AS u(i)), "
            "cnt AS (SELECT doc_id, bigram, COUNT(*) AS cnt FROM bi "
            "GROUP BY doc_id, bigram), "
            "top AS (SELECT doc_id, bigram, cnt, ROW_NUMBER() OVER "
            "(PARTITION BY doc_id ORDER BY cnt DESC, bigram) AS rn FROM cnt) "
            "SELECT b.doc_id, b.n_tokens, b.dup_token_fraction, "
            "t.bigram AS top_bigram, "
            "CAST(t.cnt AS DOUBLE) / (b.n_tokens - 1) AS top_bigram_fraction "
            "FROM base b JOIN top t ON b.doc_id = t.doc_id AND t.rn = 1"
        ),
        "q_decontaminate": (
            "WITH toks AS (SELECT doc_id, "
            "regexp_split_to_array(trim(text), '\\s+') AS t FROM documents), "
            "sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') "
            "AS shingle FROM toks, LATERAL unnest(generate_series(1, "
            "greatest(len(t)-2, 0))) AS u(i)), "
            "bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id IN "
            "(SELECT doc_id FROM documents ORDER BY doc_id LIMIT 5)), "
            "hits AS (SELECT s.doc_id, COUNT(*) AS n_hits FROM sh s "
            "JOIN bench b ON s.shingle = b.shingle GROUP BY s.doc_id) "
            "SELECT d.doc_id, COALESCE(h.n_hits, 0) AS n_hits, "
            "COALESCE(h.n_hits, 0) > 0 AS contaminated "
            "FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id"
        ),
        "q_pack_sequences": (
            "WITH t AS (SELECT doc_id, lang, "
            "len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens "
            "FROM documents), "
            "c AS (SELECT doc_id, lang, n_tokens, "
            "CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id "
            "ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS tokens_before "
            "FROM t) "
            "SELECT doc_id, lang, n_tokens, "
            "CAST(FLOOR(tokens_before * 1.0 / 2048) AS BIGINT) AS chunk_id FROM c"
        ),
        "q_incremental_dedup": (
            "WITH seen AS (SELECT DISTINCT "
            "md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS k "
            "FROM documents WHERE regexp_matches(source, '^src1.*$')), "
            "newd AS (SELECT doc_id, lang, source, "
            "md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS k "
            "FROM documents WHERE NOT regexp_matches(source, '^src1.*$')) "
            "SELECT doc_id, lang, source FROM newd "
            "WHERE k NOT IN (SELECT k FROM seen)"
        ),
        "q_stream_dedup_history": (
            # the stream-static anti-join is stateless and deterministic
            # (same rows as the batch anti-join), so the oracle is the
            # plain complement filter of the ingested slice
            "SELECT event_id, user_id, event_type FROM events "
            "WHERE event_id % 3 != 0"
        ),
        "q_frame_dedup": (
            # payload = 'FAKEIMG1' || text; 256-byte frames; DuckDB's
            # string md5 == Spark's binary md5 because the corpus is
            # ASCII-pinned (1 char == 1 byte)
            "WITH p AS (SELECT doc_id, 'FAKEIMG1' || text AS payload "
            "FROM documents), "
            "fr AS (SELECT doc_id, md5(substr(payload, s, 256)) AS frame_md5 "
            "FROM p, LATERAL unnest(generate_series(1, "
            "greatest(len(payload), 1), 256)) AS u(s)) "
            "SELECT frame_md5, "
            "CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs, "
            "CAST(COUNT(*) AS BIGINT) AS n_frames "
            "FROM fr GROUP BY frame_md5 "
            "HAVING COUNT(DISTINCT doc_id) >= 2"
        ),
        "q_incremental_dedup_bloom": (
            # the Bloom prefilter is work-pruning only (no false
            # negatives; false positives removed by the verify join),
            # so the oracle is the SAME plain anti-join as
            # q_incremental_dedup — exactness of the fast path IS the
            # contract being checked
            "WITH seen AS (SELECT DISTINCT "
            "md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS k "
            "FROM documents WHERE regexp_matches(source, '^src1.*$')), "
            "newd AS (SELECT doc_id, lang, source, "
            "md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS k "
            "FROM documents WHERE NOT regexp_matches(source, '^src1.*$')) "
            "SELECT doc_id, lang, source FROM newd "
            "WHERE k NOT IN (SELECT k FROM seen)"
        ),
        "q_shared_ngram_fraction": (
            # same 3-gram construction as the q_ngram_jaccard oracle but
            # WITHOUT the distinct — positions, not sets; floored ppm
            # avoids float rounding ties entirely
            "WITH toks AS (SELECT doc_id, "
            "regexp_split_to_array(trim(text), '\\s+') AS t FROM documents), "
            "g AS (SELECT doc_id, array_to_string(t[i:i+2], ' ') AS gram "
            "FROM toks, LATERAL unnest(generate_series(1, greatest(len(t)-2, 0))) "
            "AS u(i)), "
            "tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY doc_id), "
            "dfs AS (SELECT gram FROM (SELECT gram, COUNT(DISTINCT doc_id) AS df "
            "FROM g GROUP BY gram) WHERE df >= 2), "
            "sh AS (SELECT g.doc_id, COUNT(*) AS n_shared FROM g "
            "JOIN dfs ON g.gram = dfs.gram GROUP BY g.doc_id) "
            "SELECT d.doc_id, "
            "CAST(COALESCE(tot.n_grams, 0) AS BIGINT) AS n_grams, "
            "CAST(COALESCE(sh.n_shared, 0) AS BIGINT) AS n_shared, "
            "CAST(CASE WHEN COALESCE(tot.n_grams, 0) = 0 THEN 0 "
            "ELSE FLOOR(COALESCE(sh.n_shared, 0) * 1000000.0 / tot.n_grams) "
            "END AS BIGINT) AS shared_ppm "
            "FROM documents d "
            "LEFT JOIN tot ON d.doc_id = tot.doc_id "
            "LEFT JOIN sh ON d.doc_id = sh.doc_id"
        ),
        "q_tfidf_cosine_pairs": (
            # fixed-point milli-unit weights: ROUND(tf*LN(N/df)*1000) as
            # BIGINT makes dot products and norms exact integer sums —
            # order-independent on both engines (the _det_avg pattern
            # applied to a bilinear form). ROUND ties are impossible
            # (LN of a rational > 1 is irrational)
            "WITH toks AS (SELECT doc_id, "
            "regexp_split_to_array(trim(text), '\\s+') AS t FROM documents), "
            "g AS (SELECT doc_id, array_to_string(t[i:i+2], ' ') AS gram "
            "FROM toks, LATERAL unnest(generate_series(1, greatest(len(t)-2, 0))) "
            "AS u(i)), "
            "tf AS (SELECT doc_id, gram, COUNT(*) AS tf FROM g "
            "GROUP BY doc_id, gram), "
            "dfs AS (SELECT gram, COUNT(*) AS df FROM tf GROUP BY gram), "
            "nd AS (SELECT COUNT(*) AS n FROM documents), "
            "w AS (SELECT tf.doc_id, tf.gram, "
            "CAST(ROUND(tf.tf * LN(nd.n * 1.0 / dfs.df) * 1000.0) AS BIGINT) "
            "AS wi FROM tf JOIN dfs ON tf.gram = dfs.gram, nd "
            "WHERE dfs.df <= 64), "  # mirrors the query's max_df cap
            "nrm AS (SELECT doc_id, CAST(SUM(wi * wi) AS BIGINT) AS nrm "
            "FROM w GROUP BY doc_id), "
            "wn AS (SELECT w.doc_id, w.gram, w.wi, nrm.nrm FROM w "
            "JOIN nrm ON w.doc_id = nrm.doc_id WHERE w.wi != 0), "
            "pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "CAST(SUM(a.wi * b.wi) AS BIGINT) AS dot, "
            "MIN(a.nrm) AS na, MIN(b.nrm) AS nb "
            "FROM wn a JOIN wn b ON a.gram = b.gram AND a.doc_id < b.doc_id "
            "GROUP BY a.doc_id, b.doc_id) "
            "SELECT doc_a, doc_b, "
            "dot / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) "
            "AS cosine_tfidf FROM pairs "
            "WHERE dot / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) "
            ">= CAST(0.3 AS DOUBLE)"
        ),
        "q_sliding_chunks": (
            # stride = 64 - 16 = 48; n_chunks = max(ceil((n-16)/48), 1);
            # final partial window kept; chunk surfaced as md5 of the
            # space-joined token slice
            "WITH toks AS (SELECT doc_id, "
            "regexp_split_to_array(trim(text), '\\s+') AS t FROM documents), "
            "c AS (SELECT doc_id, len(t) AS n, t, "
            "unnest(generate_series(0, GREATEST("
            "CAST(CEIL((len(t) - 16) * 1.0 / 48) AS BIGINT), 1) - 1)) "
            "AS chunk_idx FROM toks) "
            "SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx, "
            "CAST(chunk_idx * 48 AS BIGINT) AS start_tok, "
            "CAST(LEAST(64, n - chunk_idx * 48) AS BIGINT) AS n_tok, "
            "md5(array_to_string(t[chunk_idx * 48 + 1 : chunk_idx * 48 + 64], "
            "' ')) AS chunk_md5 FROM c"
        ),
        "q_hash_split": (
            # same identity-hash arithmetic as text.hash_split: first 8
            # hex digits of md5(doc_id || 'v1') mod 10000
            "WITH b AS (SELECT doc_id, "
            "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'v1'), 1, 8)) "
            "AS BIGINT) % 10000 AS bucket FROM documents) "
            "SELECT doc_id, bucket, "
            "CASE WHEN bucket < 9000 THEN 'train' "
            "WHEN bucket < 9500 THEN 'val' ELSE 'test' END AS split FROM b"
        ),
        "q_unigram_logprob": (
            # mirrors text.unigram_logprob incl. the fixed-point mean:
            # per-token micro-units summed as integers, divided once
            "WITH toks AS (SELECT doc_id, "
            "unnest(regexp_split_to_array(trim(text), '\\s+')) AS token "
            "FROM documents), "
            "counts AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token), "
            "tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total, "
            "COUNT(*) AS v FROM counts), "
            "scored AS (SELECT doc_id, "
            "ln((c + 1) / CAST(n_total + v AS DOUBLE)) AS lp "
            "FROM toks JOIN counts USING (token) CROSS JOIN tot) "
            "SELECT doc_id, "
            "CAST(CASE WHEN SUM(CAST(ROUND(lp * 1000000) AS BIGINT)) < 0 THEN -((2 * (-(SUM(CAST(ROUND(lp * 1000000) AS BIGINT)))) + (COUNT(*) * 100)) // (2 * (COUNT(*) * 100))) ELSE (2 * (SUM(CAST(ROUND(lp * 1000000) AS BIGINT))) + (COUNT(*) * 100)) // (2 * (COUNT(*) * 100)) END AS DOUBLE) / 10000.0 + 0.0 AS avg_logprob, "
            "COUNT(*) AS n_tokens FROM scored GROUP BY doc_id"
        ),
        "q_source_mix": (
            "WITH per AS (SELECT source, COUNT(*) AS n_docs, "
            "CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) "
            "AS BIGINT) AS n_tokens FROM documents GROUP BY source), "
            "tot AS (SELECT COUNT(*) AS n_sources FROM per) "
            "SELECT source, n_docs, n_tokens, "
            "LEAST(CAST(1 AS DOUBLE), CAST(100000 AS DOUBLE) "
            "/ (n_sources * n_tokens)) "
            "AS sample_rate FROM per CROSS JOIN tot"
        ),
        "q_percentile_filter": (
            "WITH ranked AS (SELECT doc_id, lang, n_chars, "
            "ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) "
            "AS rk, COUNT(*) OVER (PARTITION BY lang) AS n FROM documents) "
            "SELECT doc_id, lang, n_chars FROM ranked "
            "WHERE rk > FLOOR(0.1 * n)"
        ),
        "q_cap_per_source": (
            "WITH ranked AS (SELECT doc_id, source, ROW_NUMBER() OVER ("
            "PARTITION BY source "
            "ORDER BY md5(CAST(doc_id AS VARCHAR) || 'cap'), doc_id) AS rk "
            "FROM documents) "
            "SELECT doc_id, source FROM ranked WHERE rk <= 100"
        ),
        "q_merge_latest": (
            # base/updates both come from events, so latest-wins over the
            # union is the latest event per user with the (ts, event_id)
            # tiebreak — new-key inserts exercised by users whose only
            # events sit in the mod-3 update batch
            "WITH ranked AS (SELECT user_id, ts, event_type, value, "
            "event_id, ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY ts DESC, event_id DESC) AS rn FROM events) "
            "SELECT user_id, epoch_ms(ts) AS ts_ms, event_type, value, "
            "event_id FROM ranked WHERE rn = 1"
        ),
        "q_oov_rate": (
            "WITH toks AS (SELECT doc_id, "
            "unnest(regexp_split_to_array(trim(text), '\\s+')) AS token "
            "FROM documents), "
            "vocab AS (SELECT token FROM (SELECT token, COUNT(*) AS c "
            "FROM toks GROUP BY token ORDER BY c DESC, token LIMIT 20)), "
            "marked AS (SELECT t.doc_id, "
            "CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS oov "
            "FROM toks t LEFT JOIN vocab v USING (token)) "
            "SELECT doc_id, COUNT(*) AS n_tokens, "
            "CAST(SUM(oov) AS BIGINT) AS n_oov, "
            "CAST(SUM(oov) AS DOUBLE) / COUNT(*) "
            "AS oov_rate FROM marked GROUP BY doc_id"
        ),
        "q_dedup_stats": (
            "WITH keyed AS (SELECT source, "
            "md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS k "
            "FROM documents) "
            "SELECT source, COUNT(*) AS n_docs, "
            "COUNT(DISTINCT k) AS n_distinct, "
            "CAST(COUNT(*) - COUNT(DISTINCT k) AS DOUBLE) / COUNT(*) "
            "AS dup_rate FROM keyed GROUP BY source"
        ),
        "q_weighted_sample": (
            # A-Res priority replayed in ANSI SQL: u from the md5-prefix
            # bucket, priority = ln(u)/weight, top-100 per lang.
            # WHERE n_chars > 0 (r11, both sides): ln(u)/0 is a
            # non-finite priority, and the engines disagree on NULL
            # placement under DESC — zero-weight rows have inclusion
            # probability 0 in A-Res anyway, so filtering is the only
            # replayable form (mirrors the operator's weight>0 filter)
            "WITH p AS (SELECT doc_id, lang, "
            "ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'ws'), "
            "1, 8)) AS BIGINT) + 0.5) / 4294967296.0) / n_chars AS priority "
            "FROM documents WHERE n_chars > 0) "
            "SELECT doc_id, lang FROM (SELECT doc_id, lang, "
            "ROW_NUMBER() OVER (PARTITION BY lang "
            "ORDER BY priority DESC, doc_id) AS rk FROM p) WHERE rk <= 100"
        ),
        "q_stream_enrich": (
            "SELECT e.event_id, e.user_id, e.event_type, "
            "c.c_mktsegment AS segment FROM events e "
            "LEFT JOIN customer c ON e.user_id = c.c_custkey"
        ),
        "q_frame_sample": (
            "WITH d AS (SELECT doc_id, 8 + length(text) AS n FROM documents) "
            "SELECT doc_id, CAST(i AS INT) AS frame_idx, "
            "CAST(LEAST(256, n - 256 * i) AS INT) AS frame_len "
            "FROM d, LATERAL unnest(generate_series(0, "
            "CAST(CEIL(n / 256.0) AS INT) - 1)) AS u(i)"
        ),
        "q_pandas_udf": (
            "SELECT doc_id, length(text) AS n_chars, "
            "CAST(length(regexp_replace(text, '[^aeiouAEIOU]', '', 'g')) "
            "AS DOUBLE) / GREATEST(length(text), 1) AS vowel_ratio "
            "FROM documents"
        ),
        "q_lang_stats_pandas": (
            "SELECT lang, COUNT(*) AS n_docs, "
            "CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars, "
            "ROUND(quantile_cont(n_chars, 0.9), 4) AS p90_chars "
            "FROM documents GROUP BY lang"
        ),
        "q_prep_pipeline": (
            "WITH toks AS (SELECT doc_id, lang, text, "
            "regexp_split_to_array(trim(text), '\\s+') AS t FROM documents), "
            # unrounded stop_ratio: must mirror quality_score's r10
            # raw-quotient surface or the filter admits different rows
            "q AS (SELECT doc_id, lang, text, len(t) AS n_tokens, "
            "CAST(len(list_filter(t, x -> x IN ('the','a','and','of','to'))) "
            "AS DOUBLE) / len(t) AS stop_ratio FROM toks), "
            "f AS (SELECT * FROM q WHERE n_tokens >= 30 AND stop_ratio <= 0.5), "
            "d AS (SELECT md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS k, "
            "MIN(doc_id) AS doc_id, arg_min(lang, doc_id) AS lang, "
            "arg_min(n_tokens, doc_id) AS n_tokens FROM f GROUP BY 1) "
            "SELECT lang, COUNT(*) AS n_docs, "
            "CAST(SUM(n_tokens) AS BIGINT) AS token_budget "
            "FROM d GROUP BY lang"
        ),
        # Winnowing, portable-hash variant: md5 gram hashes give both
        # engines the same total order, so the window minima match bit
        # for bit. k=5, window=4; zipped unnests pair each gram hash
        # with its position.
        "q_winnowing": (
            "WITH g AS (SELECT doc_id, "
            "list_transform(range(greatest(len(toks)-4, 0)), "
            "i -> md5(array_to_string(toks[i+1:i+5], ' '))) AS grams "
            "FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') "
            "AS toks FROM documents)), "
            "e AS (SELECT doc_id, len(grams) AS n, unnest(grams) AS h, "
            "unnest(range(len(grams))) AS pos FROM g) "
            "SELECT DISTINCT doc_id, fp AS fingerprint FROM ("
            "SELECT doc_id, pos, n, min(h) OVER (PARTITION BY doc_id "
            "ORDER BY pos ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp "
            "FROM e) WHERE pos <= n - 4"
        ),
        # Chunked span dedup: 8-token chunks, spans in > 2 docs removed
        # everywhere, survivors stitched in order.
        "q_chunk_dedup": (
            "WITH c AS (SELECT doc_id, "
            "list_transform(range(CAST(ceil(len(toks)/8.0) AS BIGINT)), "
            "i -> array_to_string(toks[i*8+1:i*8+8], ' ')) AS chunks "
            "FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') "
            "AS toks FROM documents)), "
            "e AS (SELECT doc_id, len(chunks) AS n_chunks, "
            "unnest(chunks) AS chunk_text, "
            "unnest(range(len(chunks))) AS chunk_id FROM c), "
            "df AS (SELECT chunk_text, count(DISTINCT doc_id) AS span_df "
            "FROM e GROUP BY 1) "
            "SELECT e.doc_id, "
            "string_agg(e.chunk_text, ' ' ORDER BY e.chunk_id) AS clean_text, "
            "CAST(max(e.n_chunks) AS BIGINT) AS n_chunks, "
            "CAST(count(*) AS BIGINT) AS n_kept "
            "FROM e JOIN df USING (chunk_text) "
            "WHERE df.span_df <= 2 GROUP BY e.doc_id"
        ),
        # Zipf slope from exact integer micro-unit sums; only the final
        # division is floating point. Integer SUMs stay inside casts so
        # no HUGEINT reaches the output.
        "q_zipf_stats": (
            "WITH tf AS (SELECT source, tok, count(*) AS freq FROM ("
            "SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) "
            "AS tok FROM documents) GROUP BY 1, 2), "
            "r AS (SELECT source, freq, row_number() OVER ("
            "PARTITION BY source ORDER BY freq DESC, tok ASC) AS rnk FROM tf), "
            "m AS (SELECT source, freq, "
            "CAST(round(ln(rnk) * 1000000) AS BIGINT) AS x, "
            "CAST(round(ln(freq) * 1000000) AS BIGINT) AS y FROM r) "
            "SELECT source, CAST(sum(freq) AS BIGINT) AS n_tokens, "
            "CAST(count(*) AS BIGINT) AS n_types, "
            "CAST(count(*) AS DOUBLE) / sum(freq) AS ttr, "
            "CASE WHEN count(*) * sum(x*x) - sum(x) * sum(x) = 0 THEN 0.0 "
            "ELSE CAST(count(*) * sum(x*y) - sum(x) * sum(y) AS DOUBLE) "
            "/ CAST(count(*) * sum(x*x) - sum(x) * sum(x) AS DOUBLE) "
            "END AS zipf_slope "
            "FROM m GROUP BY source"
        ),
        "q_curriculum_bins": (
            "SELECT doc_id, source, n_chars, "
            "ntile(10) OVER (PARTITION BY source ORDER BY n_chars, doc_id) "
            "AS bin FROM documents"
        ),
        # Cross-source contamination matrix: distinct (source, 60-bit
        # md5-prefix shingle key) pairs, self-join bounded by source
        # count, Jaccard from exact integer set sizes.
        "q_source_overlap": (
            "WITH toks AS (SELECT source, "
            "regexp_split_to_array(trim(text), '\\s+') AS t FROM documents), "
            "sh AS (SELECT DISTINCT source, "
            "CAST(('0x' || substr(md5(array_to_string(t[i:i+2], ' ')), 1, 15)) "
            "AS BIGINT) AS h "
            "FROM toks, LATERAL unnest(generate_series(1, greatest(len(t)-2, 0))) "
            "AS u(i)), "
            "sizes AS (SELECT source, COUNT(*) AS sz FROM sh GROUP BY source), "
            "inter AS (SELECT a.source AS source_a, b.source AS source_b, "
            "CAST(COUNT(*) AS BIGINT) AS n_shared FROM sh a JOIN sh b "
            "ON a.h = b.h AND a.source < b.source GROUP BY 1, 2) "
            "SELECT source_a, source_b, n_shared, "
            "CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) "
            "AS jaccard "
            "FROM inter JOIN sizes sa ON sa.source = source_a "
            "JOIN sizes sb ON sb.source = source_b"
        ),
        # Stratified Bernoulli sample replayed via the md5-prefix draw
        # (same portable-uniform pattern as q_weighted_sample)
        "q_stratified_sample": (
            "SELECT doc_id, lang FROM documents WHERE "
            "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), "
            "1, 8)) AS BIGINT) / 4294967296.0 < "
            "CASE lang WHEN 'en' THEN 0.1 ELSE 0.3 END"
        ),
        # Int8 scalar quantization: per-element float ops only (max is
        # order-independent, the norm sums integers), so both engines
        # produce identical quantized vectors; the vector is compared as
        # md5(comma-joined ints) because the driver hash can't take a
        # raw array cell.
        "q_quantize_embeddings": (
            "WITH m AS (SELECT vec_id, embedding, CAST(list_aggregate("
            "list_transform(embedding, x -> abs(x)), 'max') AS DOUBLE) "
            "AS maxabs FROM embeddings), "
            "q AS (SELECT vec_id, "
            "CASE WHEN maxabs = 0 THEN 1.0 ELSE 127.0 / maxabs END AS scale, "
            "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * "
            "(CASE WHEN maxabs = 0 THEN 1.0 ELSE 127.0 / maxabs END)) AS INT)) "
            "AS qvec FROM m) "
            "SELECT vec_id, "
            "md5(array_to_string(qvec, ',')) AS qvec_md5, "
            "round(scale, 6) + 0.0 AS q_scale, "
            "CAST(list_aggregate(list_transform(qvec, "
            "v -> CAST(v AS BIGINT) * v), 'sum') AS BIGINT) AS q_sqnorm "
            "FROM q"
        ),
        # Quantized cosine top-k: int8 dots are small exact integers, so
        # double-summed list_inner_product is bit-exact; ranking and
        # rounded sims match Spark's integer-dot formulation.
        "q_quantized_topk": (
            "WITH m AS (SELECT vec_id, embedding, CAST(list_aggregate("
            "list_transform(embedding, x -> abs(x)), 'max') AS DOUBLE) "
            "AS maxabs FROM embeddings), "
            "q AS (SELECT vec_id, "
            "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * "
            "(CASE WHEN maxabs = 0 THEN 1.0 ELSE 127.0 / maxabs END)) AS INT)) "
            "AS qvec FROM m), "
            "n AS (SELECT vec_id, CAST(qvec AS DOUBLE[]) AS dv, "
            "list_inner_product(CAST(qvec AS DOUBLE[]), CAST(qvec AS DOUBLE[])) "
            "AS sqnorm FROM q), "
            "qry AS (SELECT vec_id AS query_id, dv AS qdv, sqnorm AS qsq "
            "FROM n ORDER BY vec_id LIMIT 5), "
            "s AS (SELECT query_id, n.vec_id, "
            "CASE WHEN n.sqnorm * qsq = 0 THEN 0.0 "
            "ELSE list_inner_product(n.dv, qdv) / sqrt(n.sqnorm * qsq) END "
            "AS raw FROM qry, n) "
            "SELECT query_id, vec_id, round(raw, 4) + 0.0 AS sim, "
            "ROW_NUMBER() OVER (PARTITION BY query_id "
            "ORDER BY raw DESC, vec_id) AS rank FROM s QUALIFY rank <= 5"
        ),
        # MinHash LSH with the portable shingle hash: DuckDB replays the
        # full fixed hash family, the banding, and the agreement count.
        "q_near_dup": _minhash_oracle_sql(),
        # SimHash with the portable 60-bit token hash: per-bit votes,
        # 16-bit bands and XOR popcount replayed as integer arithmetic.
        "q_simhash_near_dup": _simhash_oracle_sql(),
        # Connected components of the (proven) n-gram Jaccard pair graph
        # via recursive CTE; min reachable doc_id per component.
        "q_dedup_clusters": _dedup_clusters_oracle_sql(),
        # leakage-safe split: closure representative (or own id) through
        # the proven md5 bucket arithmetic
        "q_cluster_safe_split": _cluster_safe_split_oracle_sql(),
        # --- streaming (finite availableNow runs are deterministic:
        # single-batch intake + trailing no-data batch, so the emitted
        # sets are closed-form functions of the data) ---
        # append-mode tumbling windows: emitted iff window end <= final
        # watermark (max ts - 10 min)
        "q_stream_tumbling": (
            "WITH w AS (SELECT max(ts) - INTERVAL 10 MINUTE AS wm "
            "FROM events), "
            "b AS (SELECT date_trunc('hour', ts) AS bucket, COUNT(*) AS "
            "n_events, SUM(CAST(round(value * 1e6) AS BIGINT)) / 1e6 "
            "AS sum_value FROM events GROUP BY 1) "
            "SELECT epoch_ms(bucket) AS bucket_ms, n_events, sum_value "
            "FROM b, w WHERE bucket + INTERVAL 1 HOUR <= wm"
        ),
        # append-mode session windows: sessionize (the proven
        # q_session_window shape), end = last event + 30 min gap,
        # emitted iff end <= final watermark (max ts - 1 h)
        "q_stream_session": (
            "WITH flagged AS (SELECT user_id, event_id, ts, CASE WHEN "
            "lag(ts) OVER w IS NULL OR epoch_ms(ts) - epoch_ms(lag(ts) "
            "OVER w) > 1800000 THEN 1 ELSE 0 END AS is_new FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "sess AS (SELECT user_id, ts, SUM(is_new) OVER (PARTITION BY "
            "user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS "
            "sid FROM flagged), "
            "agg AS (SELECT user_id, sid, COUNT(*) AS n_events, "
            "epoch_ms(MIN(ts)) AS session_start_ms, "
            "epoch_ms(MAX(ts) + INTERVAL 30 MINUTE) AS session_end_ms, "
            "MAX(ts) + INTERVAL 30 MINUTE AS send FROM sess "
            "GROUP BY user_id, sid), "
            "w AS (SELECT max(ts) - INTERVAL 1 HOUR AS wm FROM events) "
            "SELECT user_id, session_start_ms, session_end_ms, n_events "
            "FROM agg, w WHERE send <= wm"
        ),
        # dropDuplicatesWithinWatermark over already-unique event_ids:
        # exact pass-through, no drops (single batch => no lateness)
        "q_stream_dedup": (
            "SELECT event_id, user_id, event_type FROM events"
        ),
        # stream-stream join, single-batch intake: no state eviction can
        # hide a pair, so emitted = the batch range join
        "q_stream_join": (
            "SELECT c.event_id AS click_id, p.event_id AS purchase_id "
            "FROM events c JOIN events p ON c.event_type = 'click' "
            "AND p.event_type = 'purchase' AND c.user_id = p.user_id "
            "AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 60 MINUTE"
        ),
        # applyInPandasWithState running totals: one update emission per
        # user per batch; single batch => the per-user batch aggregate
        "q_stream_user_state": (
            "SELECT user_id, COUNT(*) AS n_events, "
            "SUM(CAST(round(value * 1e6) AS BIGINT)) / 1e6 AS total_value, "
            "epoch_ms(MAX(ts)) AS last_ts_ms FROM events GROUP BY user_id"
        ),
        # heuristic language ID: integer marker-hit argmax, tie-broken
        # by language code — replayed as a ranked unpivot
        "q_lang_id": _lang_id_oracle_sql(),
        # Lloyd's k-means, 3 unrolled iterations: argmax-cosine
        # assignment + fixed-point centroid means (both idioms proven on
        # q_ivf_topk / q_centroid_by_label)
        "q_kmeans": _kmeans_oracle_sql(),
        "q_pagerank": _pagerank_oracle_sql(),
        "q_knn_label_agreement": _knn_label_agreement_oracle_sql(),
        "q_trend_slope": (
            "WITH daily AS (SELECT event_type, "
            "CAST(FLOOR(epoch_ms(ts) / 86400000) AS BIGINT) AS day, "
            "CAST(SUM(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS y "
            "FROM events GROUP BY 1, 2), "
            "rb AS (SELECT event_type, "
            "day - MIN(day) OVER (PARTITION BY event_type) AS x, y "
            "FROM daily), "
            "a AS (SELECT event_type, COUNT(*) AS n_days, "
            "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, "
            "CAST(SUM(x * y) AS BIGINT) AS sxy, "
            "CAST(SUM(x * x) AS BIGINT) AS sxx FROM rb GROUP BY 1) "
            "SELECT event_type, n_days, "
            "n_days * sxy - sx * sy AS slope_num, "
            "n_days * sxx - sx * sx AS slope_den, "
            "CASE WHEN n_days * sxx - sx * sx = 0 THEN 0.0 "
            "ELSE CAST(n_days * sxy - sx * sy AS DOUBLE) "
            "/ CAST(n_days * sxx - sx * sx AS DOUBLE) END "
            "AS slope_micro_per_day FROM a"
        ),
        "q_categorical_profile": (
            # term order mirrors profiling.categorical_profile exactly:
            # (n / tot) * ln(tot / n) * 1e6, rounded per value, integer sum
            "WITH c1 AS (SELECT CAST(event_type AS VARCHAR) AS val, "
            "COUNT(*) AS n FROM events GROUP BY 1), "
            "t1 AS (SELECT CAST(SUM(n) AS BIGINT) AS tot, "
            "COUNT(*) AS n_distinct, CAST(MAX(n) AS BIGINT) AS top_n "
            "FROM c1), "
            "e1 AS (SELECT 'event_type' AS column_name, "
            "ANY_VALUE(n_distinct) AS n_distinct, "
            "CAST(SUM(CAST(round((n / CAST(tot AS DOUBLE)) "
            "* ln(tot / CAST(n AS DOUBLE)) * 1e6) AS BIGINT)) AS BIGINT) "
            "AS entropy_micro, "
            "ANY_VALUE((1000 * top_n) // tot) AS top_fraction_milli "
            "FROM c1 CROSS JOIN t1), "
            "c2 AS (SELECT CAST(user_id AS VARCHAR) AS val, COUNT(*) AS n "
            "FROM events GROUP BY 1), "
            "t2 AS (SELECT CAST(SUM(n) AS BIGINT) AS tot, "
            "COUNT(*) AS n_distinct, CAST(MAX(n) AS BIGINT) AS top_n "
            "FROM c2), "
            "e2 AS (SELECT 'user_id' AS column_name, "
            "ANY_VALUE(n_distinct) AS n_distinct, "
            "CAST(SUM(CAST(round((n / CAST(tot AS DOUBLE)) "
            "* ln(tot / CAST(n AS DOUBLE)) * 1e6) AS BIGINT)) AS BIGINT) "
            "AS entropy_micro, "
            "ANY_VALUE((1000 * top_n) // tot) AS top_fraction_milli "
            "FROM c2 CROSS JOIN t2) "
            "SELECT * FROM e1 UNION ALL SELECT * FROM e2"
        ),
        "q_fuzzy_match": (
            "WITH names AS (SELECT p_name AS name, COUNT(*) AS cnt, "
            "regexp_split_to_array(p_name, ' ')[-1] AS blk "
            "FROM part GROUP BY 1) "
            "SELECT a.name AS name_a, b.name AS name_b, "
            "levenshtein(a.name, b.name) AS edit_distance, "
            "a.cnt * b.cnt AS n_pairs "
            "FROM names a JOIN names b ON a.blk = b.blk "
            "AND a.name < b.name "
            "WHERE levenshtein(a.name, b.name) BETWEEN 1 AND 2"
        ),
        "q_pq_topk": _pq_topk_oracle_sql(),
        "q_ivfpq_topk": _ivfpq_topk_oracle_sql(),
        "q_keep_canonical": _keep_canonical_oracle_sql(),
        # integer-exact LSH ANN: quantize (proven), md5-integer
        # hyperplane sign buckets, quantized-cosine rerank (proven)
        "q_lsh_topk": _lsh_topk_oracle_sql(),
        # sketch-then-verify heavy hitters: the verified output is the
        # exact > support frequency set
        "q_heavy_hitters": (
            # unrounded frac (r9 tie-class retirement); CAST AS DOUBLE,
            # not * 1.0 — DuckDB types a 1.0 literal as DECIMAL and a
            # decimal division is NOT the IEEE double quotient Spark runs
            "WITH t AS (SELECT COUNT(*) AS total FROM events) "
            "SELECT event_type, COUNT(*) AS n, "
            "CAST(COUNT(*) AS DOUBLE) / max(t.total) AS frac "
            "FROM events, t GROUP BY event_type "
            "HAVING COUNT(*) > 0.1 * max(t.total)"
        ),
        # multimodal features over the deterministic fake payload
        # ('FAKEIMG1' || text): byte histogram entropy in micro-unit
        # fixed point. BYTE semantics via encode()+hex (r5, verdict ask
        # #6): the Spark side iterates UTF-8 payload bytes, so the
        # oracle must too — the old ascii(substr(...)) form silently
        # assumed one byte per character and was only safe because the
        # corpus is pinned ASCII; this form survives a corpus regen
        # with non-ASCII text (unit-pinned in test_robustness).
        "q_multimodal_features": (
            "WITH p AS (SELECT doc_id, "
            "hex(encode('FAKEIMG1' || text)) AS hx, "
            "octet_length(encode('FAKEIMG1' || text)) AS n "
            "FROM documents), "
            "c AS (SELECT doc_id, n, "
            "CAST(('0x' || substr(hx, 2 * i - 1, 2)) AS INT) AS x "
            "FROM p, LATERAL unnest(generate_series(1, n)) AS u(i)), "
            "h AS (SELECT doc_id, n, x, COUNT(*) AS cnt FROM c "
            "GROUP BY doc_id, n, x), "
            "e AS (SELECT doc_id, CAST(SUM(CAST(floor(-(cnt * 1.0 / n) * "
            "log2(cnt * 1.0 / n) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS micro FROM h GROUP BY doc_id) "
            "SELECT p.doc_id, CAST(p.n AS BIGINT) AS n_bytes, "
            "CAST(1 AS INT) AS header_ok, "
            "e.micro / 1000000.0 AS byte_entropy "
            "FROM p JOIN e ON e.doc_id = p.doc_id"
        ),
        # per-chunk RMS/peak over the same payload, same encode()+hex
        # byte extraction
        "q_audio_features": (
            "WITH p AS (SELECT doc_id, "
            "hex(encode('FAKEIMG1' || text)) AS hx, "
            "octet_length(encode('FAKEIMG1' || text)) AS n "
            "FROM documents), "
            "c AS (SELECT doc_id, CAST((i - 1) // 256 AS INT) AS "
            "chunk_idx, "
            "CAST(('0x' || substr(hx, 2 * i - 1, 2)) AS INT) AS x "
            "FROM p, LATERAL unnest(generate_series(1, n)) AS u(i)) "
            "SELECT doc_id, chunk_idx, "
            "ROUND(sqrt(SUM(x * x) * 1.0 / COUNT(*)), 4) AS rms, "
            "CAST(MAX(x) AS INT) AS peak "
            "FROM c GROUP BY doc_id, chunk_idx"
        ),
        # bigram LM: conditional smoothed log-probs, context counts
        # rolled up from the bigram table, fixed-point per-doc mean
        "q_bigram_logprob": (
            "WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), "
            "'\\s+') AS a FROM documents), "
            "big AS (SELECT doc_id, a[i] AS w1, a[i+1] AS w2 FROM t, "
            "LATERAL unnest(generate_series(1, len(a)-1)) AS u(i)), "
            "bc AS (SELECT w1, w2, COUNT(*) AS cb FROM big GROUP BY w1, w2), "
            "cc AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS cctx FROM bc "
            "GROUP BY w1), "
            "vv AS (SELECT COUNT(DISTINCT tok) AS v FROM "
            "(SELECT unnest(a) AS tok FROM t)), "
            "scored AS (SELECT doc_id, ln((cb + 1) / CAST(cctx + v AS "
            "DOUBLE)) AS lp FROM big JOIN bc USING (w1, w2) "
            "JOIN cc USING (w1) CROSS JOIN vv) "
            "SELECT doc_id, CAST(CASE WHEN SUM(CAST(ROUND(lp * 1000000) AS BIGINT)) < 0 THEN -((2 * (-(SUM(CAST(ROUND(lp * 1000000) AS BIGINT)))) + (COUNT(*) * 100)) // (2 * (COUNT(*) * 100))) ELSE (2 * (SUM(CAST(ROUND(lp * 1000000) AS BIGINT))) + (COUNT(*) * 100)) // (2 * (COUNT(*) * 100)) END AS DOUBLE) / 10000.0 + 0.0 AS avg_logprob, "
            "COUNT(*) AS n_bigrams FROM scored GROUP BY doc_id"
        ),
        # sketch-then-verify (the q_heavy_hitters pattern): the hashed
        # surface is the exact distinct count + the integer accuracy flag;
        # the HLL estimate itself never enters the hash. within_5pct = 1
        # is the oracle's assertion that the rsd=0.02 sketch held its
        # envelope (measured ≤0.67% error across sf0.001..sf0.1).
        "q_approx_distinct": (
            "SELECT event_type, COUNT(DISTINCT user_id) AS exact_users, "
            "1 AS within_5pct FROM events GROUP BY event_type"
        ),
        # ---- round-5 promotions (formerly tests-only operators) ----
        # Gopher rule battery: every ratio replayed with the same integer
        # numerators; float thresholds CAST AS DOUBLE so DuckDB never
        # compares in its exact-DECIMAL domain (0.1 decimal != 0.1 double
        # at the boundary)
        "q_gopher_rules": (
            "WITH t0 AS (SELECT doc_id, text, "
            "regexp_split_to_array(trim(text), '\\s+') AS t FROM documents), "
            "s AS (SELECT doc_id, text, len(t) AS n, "
            "CAST(length(array_to_string(t, '')) AS DOUBLE) / len(t) "
            "AS avg_len, "
            "length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) "
            "AS n_sym, "
            "len(list_filter(t, x -> regexp_matches(x, '^[A-Za-z]+$'))) "
            "AS n_alpha, "
            "(len(t) - len(list_distinct(t))) / len(t) AS dup_frac "
            "FROM t0), "
            "f AS (SELECT doc_id, "
            "(n >= 5 AND n <= 100000) AS r1, "
            "(avg_len >= CAST(2.0 AS DOUBLE) AND "
            "avg_len <= CAST(12.0 AS DOUBLE)) AS r2, "
            "(n_sym <= length(text) * CAST(0.1 AS DOUBLE)) AS r3, "
            "(n_alpha >= n * CAST(0.7 AS DOUBLE)) AS r4, "
            "(dup_frac <= CAST(0.3 AS DOUBLE)) AS r5 FROM s) "
            "SELECT doc_id, CAST(r1 AS INT) AS ok_n_tokens, "
            "CAST(r2 AS INT) AS ok_avg_token_len, "
            "CAST(r3 AS INT) AS ok_symbol_ratio, "
            "CAST(r4 AS INT) AS ok_alpha_ratio, "
            "CAST(r5 AS INT) AS ok_dup_tokens, "
            "CAST(r1 AND r2 AND r3 AND r4 AND r5 AS INT) AS passes_all "
            "FROM f"
        ),
        # CCNet buckets: the proven q_unigram_logprob CTE (micro-unit
        # rounded mean) + per-language percent_rank, doc_id tie-break;
        # boundary fractions CAST AS DOUBLE = the exact doubles Spark's
        # F.lit(1/3)/F.lit(2/3) hold
        "q_ccnet_buckets": (
            "WITH toks AS (SELECT doc_id, "
            "unnest(regexp_split_to_array(trim(text), '\\s+')) AS token "
            "FROM documents), "
            "counts AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token), "
            "tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total, "
            "COUNT(*) AS v FROM counts), "
            "scored AS (SELECT doc_id, "
            "ln((c + 1) / CAST(n_total + v AS DOUBLE)) AS lp "
            "FROM toks JOIN counts USING (token) CROSS JOIN tot), "
            "u AS (SELECT doc_id, "
            "CAST(CASE WHEN SUM(CAST(ROUND(lp * 1000000) AS BIGINT)) < 0 THEN -((2 * (-(SUM(CAST(ROUND(lp * 1000000) AS BIGINT)))) + (COUNT(*) * 100)) // (2 * (COUNT(*) * 100))) ELSE (2 * (SUM(CAST(ROUND(lp * 1000000) AS BIGINT))) + (COUNT(*) * 100)) // (2 * (COUNT(*) * 100)) END AS DOUBLE) / 10000.0 + 0.0 AS avg_logprob "
            "FROM scored GROUP BY doc_id), "
            "j AS (SELECT u.doc_id, d.lang, u.avg_logprob FROM u "
            "JOIN documents d ON d.doc_id = u.doc_id), "
            "r AS (SELECT doc_id, lang, avg_logprob, "
            "percent_rank() OVER (PARTITION BY lang "
            "ORDER BY avg_logprob DESC, doc_id) AS pr FROM j) "
            "SELECT doc_id, lang, avg_logprob, "
            "CASE WHEN pr <= CAST(0.3333333333333333 AS DOUBLE) THEN 'head' "
            "WHEN pr <= CAST(0.6666666666666666 AS DOUBLE) THEN 'middle' "
            "ELSE 'tail' END AS bucket FROM r"
        ),
        "q_apply_bpe": _apply_bpe_oracle_sql(_BPE_MERGES),
        # skew triage on event_type: integer milli shares; // and `div`
        # agree on positive operands (truncation)
        "q_skew_report": (
            "WITH counts AS (SELECT CAST(event_type AS VARCHAR) AS "
            "key_value, COUNT(*) AS n FROM events GROUP BY event_type), "
            "tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tot, "
            "COUNT(*) AS n_keys FROM counts) "
            "SELECT 'event_type' AS key_col, key_value, n, n_keys, "
            "(1000 * n) // tot AS share_milli, "
            "CAST((1000 * n) // tot >= 50 AS INT) AS needs_salt "
            "FROM counts CROSS JOIN tot ORDER BY n DESC, key_value LIMIT 10"
        ),
        "q_semantic_dedup": _semantic_dedup_oracle_sql(0.4),
        # incremental aggregate maintenance: the oracle IS the full
        # recompute — integer micro-unit sums make the monoid merge
        # exactly equal to it
        "q_merge_partial_aggs": (
            "SELECT user_id, "
            "CAST(SUM(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) "
            "AS v_micro, COUNT(*) AS n FROM events GROUP BY user_id"
        ),
        # ---- round-5 batch 2 ----
        # streaming funnel: single-batch intake => one emission per
        # user = the greedy strictly-after chain over all events;
        # sequential correlated MINs replay it
        "q_stream_funnel": (
            "WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms "
            "FROM events WHERE event_type IN ('view','click','purchase')), "
            "u AS (SELECT DISTINCT user_id FROM e), "
            "s1 AS (SELECT u.user_id, (SELECT MIN(ms) FROM e "
            "WHERE e.user_id = u.user_id AND event_type = 'view') AS t1 "
            "FROM u), "
            "s2 AS (SELECT user_id, t1, (SELECT MIN(ms) FROM e "
            "WHERE e.user_id = s1.user_id AND event_type = 'click' "
            "AND ms > s1.t1) AS t2 FROM s1), "
            "s3 AS (SELECT user_id, t1, t2, (SELECT MIN(ms) FROM e "
            "WHERE e.user_id = s2.user_id AND event_type = 'purchase' "
            "AND ms > s2.t2) AS t3 FROM s2) "
            "SELECT user_id, CAST(CASE WHEN t1 IS NULL THEN 0 "
            "WHEN t2 IS NULL THEN 1 WHEN t3 IS NULL THEN 2 ELSE 3 END "
            "AS INT) AS stage, "
            "CAST(COALESCE(t3, t2, t1, -1) AS BIGINT) AS t_ms FROM s3"
        ),
        # snapshot diff: direct value classification is equivalent to
        # the operator's md5 row signatures because only `value` mutates
        "q_snapshot_diff": (
            "WITH old AS (SELECT event_id, user_id, event_type, value "
            "FROM events WHERE event_id % 5 != 4), "
            "new AS (SELECT event_id, user_id, event_type, "
            "CASE WHEN event_id % 7 = 0 THEN value + 1.0 ELSE value END "
            "AS value FROM events WHERE event_id % 5 != 0) "
            "SELECT COALESCE(o.event_id, n.event_id) AS event_id, "
            "CASE WHEN o.event_id IS NULL THEN 'added' "
            "WHEN n.event_id IS NULL THEN 'removed' "
            "WHEN o.value != n.value THEN 'changed' END AS status "
            "FROM old o FULL OUTER JOIN new n ON o.event_id = n.event_id "
            "WHERE o.event_id IS NULL OR n.event_id IS NULL "
            "OR o.value != n.value"
        ),
        # equi-width histogram: bin edges are exact doubles, top bin
        # clamped open-ended
        "q_histogram": (
            "WITH b AS (SELECT event_type AS group_key, "
            "LEAST(CAST(FLOOR(value / CAST(50.0 AS DOUBLE)) AS INT), 9) "
            "AS bin FROM events) "
            "SELECT group_key, bin, "
            "bin * CAST(50.0 AS DOUBLE) AS bin_lo, "
            "(bin + 1) * CAST(50.0 AS DOUBLE) AS bin_hi, "
            "COUNT(*) AS n FROM b GROUP BY group_key, bin"
        ),
        # k-sigma gate: z^2 > 9 cross-multiplied into int64 milli units
        "q_anomaly_events": (
            "WITH r AS (SELECT event_id, user_id, "
            "CAST(round(value * 1000) AS BIGINT) AS vm FROM events), "
            "a AS (SELECT user_id, COUNT(*) AS n, "
            "CAST(SUM(vm) AS BIGINT) AS s, "
            "CAST(SUM(vm * vm) AS BIGINT) AS ssq FROM r GROUP BY user_id) "
            "SELECT event_id, r.user_id, vm AS v_milli, "
            "CAST(n >= 2 AND (n * vm - s) * (n * vm - s) > "
            "9 * (n * ssq - s * s) AS INT) AS is_outlier "
            "FROM r JOIN a ON a.user_id = r.user_id"
        ),
        # TPC-H Q14 shape: integer cents, truncating-div milli share
        "q_sql_promo_revenue": (
            "WITH m AS (SELECT epoch_ms(date_trunc('month', l_shipdate)) "
            "AS month_ms, "
            "SUM(CASE WHEN p_type = 'PROMO' THEN "
            "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS "
            "BIGINT) ELSE 0 END) AS promo_cents, "
            "SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) "
            "AS BIGINT)) AS total_cents "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "GROUP BY date_trunc('month', l_shipdate)) "
            "SELECT month_ms, CAST(promo_cents AS BIGINT) AS promo_cents, "
            "CAST(total_cents AS BIGINT) AS total_cents, "
            "(1000 * CAST(promo_cents AS BIGINT)) // "
            "CAST(total_cents AS BIGINT) AS promo_milli FROM m"
        ),
        # TPC-H Q13 shape
        "q_sql_cust_order_dist": (
            "SELECT c_count, COUNT(*) AS custdist FROM ("
            "SELECT c_custkey, COUNT(o_orderkey) AS c_count "
            "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
            "GROUP BY c_custkey) GROUP BY c_count"
        ),
        # TPC-H Q19 shape
        "q_sql_brand_qty_revenue": (
            "SELECT COALESCE(CAST(SUM(CAST(ROUND(l_extendedprice * "
            "(1 - l_discount) * 100) AS BIGINT)) AS BIGINT), 0) "
            "AS revenue_cents, COUNT(*) AS n_lineitems "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            "WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 15) "
            "OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 25) "
            "OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 35)"
        ),
        "q_tokenizer_fertility": _tokenizer_fertility_oracle_sql(
            _BPE_MERGES
        ),
        # round-6 additions
        "q_semantic_dedup_ivf": _semantic_dedup_ivf_oracle_sql(0.4),
        "q_bpe_learn": _bpe_learn_oracle_sql(_BPE_LEARN_STEPS),
        "q_evolving_read": (
            # what the evolving reader must reconstruct: the pre-
            # evolution batch with the typed default filling the column
            # its files never carried, unioned with the evolved batch
            "SELECT n_nationkey, n_name, 1 AS batch, "
            "CAST(-1 AS BIGINT) AS n_regionkey FROM nation "
            "UNION ALL SELECT n_nationkey, n_name, 2 AS batch, "
            "n_regionkey FROM nation"
        ),
        "q_zorder_layout": _zorder_layout_oracle_sql(
            _ZORDER_BITS, _ZORDER_FILES
        ),
        # round-7 promotions (generators staged + differential-tested r6)
        "q_dsir_importance": _dsir_oracle_sql(),
        "q_source_mix_waterfill": _waterfill_oracle_sql(_WATERFILL_BUDGET),
        # round-7 new operator (generator differential-tested this round)
        "q_substring_dedup": _substring_spans_oracle_sql(20),
        # round-8 promotions (generators staged + differential-tested r7/r7b)
        "q_span_stats": _span_stats_oracle_sql(20),
        "q_cut_duplicate_spans": _cut_spans_oracle_sql(20),
        "q_nb_classifier": _nb_scores_oracle_sql("text LIKE '%dup%'"),
        "q_temperature_mix": _temperature_mix_oracle_sql(
            _TEMPERATURE_BUDGET
        ),
        "q_cluster_diversity": _cluster_diversity_oracle_sql(
            threshold=0.2, m=2
        ),
        # round-9 promotions (generators staged + differential-tested r8)
        "q_nb_apply": _nb_apply_oracle_sql("text LIKE '%dup%'"),
        "q_hybrid_search": _hybrid_oracle_sql(("data", "dup"), topk=20),
    })


def _bpe_seg_ctes(merges: list) -> str:
    """Shared DuckDB CTE prefix replaying text.apply_bpe_merges with a
    frozen merge list; ends with ``per`` = (doc_id, n_subwords,
    n_words).

    Key identity: a left-to-right non-overlapping BPE merge over a
    symbol array equals string ``replace`` over the unit-separator-
    joined symbol string (replace scans left-to-right, never
    re-matches inside a replacement, and continues after it — exactly
    the fold's pending-symbol semantics). chr(31) never occurs in the
    corpus — pinned printable-ASCII at every sf by
    tests/test_robustness.py::
    test_documents_corpus_is_printable_ascii_across_sfs (whitespace
    splitting would not strip \\x1f) — and merged symbols contain no
    separator, so cascading merges like ('m','er') match exactly when
    their inputs have been produced."""
    sep = chr(31)
    # chars joined by the separator: insert sep after every char, trim
    # the trailing one ('.' can't match the whitespace stripped by the
    # tokenizer, so every token char is covered)
    expr = f"rtrim(regexp_replace(w, '(.)', '\\1{sep}', 'g'), '{sep}')"
    for a, b in merges:
        expr = f"replace({expr}, '{a}{sep}{b}', '{a}{b}')"
    return (
        "WITH toks AS (SELECT doc_id, "
        "regexp_split_to_array(trim(text), '\\s+') AS t FROM documents), "
        "w AS (SELECT doc_id, unnest(t) AS w FROM toks), "
        f"seg AS (SELECT doc_id, w, {expr} AS s FROM w), "
        "cnt AS (SELECT doc_id, CAST(SUM(CASE WHEN w = '' THEN 0 ELSE "
        f"len(string_split(s, '{sep}')) END) AS BIGINT) AS n_subwords "
        "FROM seg GROUP BY doc_id), "
        "per AS (SELECT t.doc_id, cnt.n_subwords, len(t.t) AS n_words "
        "FROM toks t JOIN cnt ON cnt.doc_id = t.doc_id) "
    )


def _apply_bpe_oracle_sql(merges: list) -> str:
    return _bpe_seg_ctes(merges) + (
        "SELECT doc_id, n_subwords, n_words FROM per"
    )


def _tokenizer_fertility_oracle_sql(merges: list) -> str:
    """Per-language rollup of the replayed BPE segmentation; milli
    ratios via truncating // on BIGINT sums (positive operands — the
    regime where Spark div and DuckDB // agree)."""
    return _bpe_seg_ctes(merges) + (
        ", agg AS (SELECT d.lang, COUNT(*) AS n_docs, "
        "CAST(SUM(p.n_words) AS BIGINT) AS n_words, "
        "CAST(SUM(p.n_subwords) AS BIGINT) AS n_subwords, "
        "CAST(SUM(length(d.text)) AS BIGINT) AS n_chars "
        "FROM per p JOIN documents d ON d.doc_id = p.doc_id "
        "GROUP BY d.lang) "
        "SELECT lang, n_docs, n_words, n_subwords, "
        "(1000 * n_subwords) // n_words AS fertility_milli, "
        "(1000 * n_chars) // n_subwords AS chars_per_subword_milli "
        "FROM agg"
    )


def _semantic_closure_ctes(threshold: float) -> str:
    """Shared CTE prefix for the SemDeDup oracles: the proven
    q_embedding_near_dup all-pairs cosine comparison, closed
    transitively (the _pair_closure_ctes recursion shape on vec ids),
    ending with ``cl`` = (vec_id, cluster_id = min reachable vec_id).
    The threshold literal is CAST to DOUBLE: DuckDB parses bare float
    literals as DECIMAL; 0.4 is not exactly representable and a
    boundary-divergent pair cascades through the transitive closure
    (CLAUDE.md r5 rule)."""
    return (
        "WITH RECURSIVE pr AS (SELECT a.vec_id AS va, b.vec_id AS vb "
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        f"CAST(b.embedding AS DOUBLE[])) >= CAST({threshold} AS DOUBLE)), "
        "edges AS (SELECT va AS s, vb AS d FROM pr "
        "UNION SELECT vb, va FROM pr), "
        "reach(v, r) AS (SELECT DISTINCT s, s FROM edges "
        "UNION SELECT e.s, reach.r FROM edges e "
        "JOIN reach ON reach.v = e.d), "
        "cl AS (SELECT v AS vec_id, MIN(r) AS cluster_id FROM reach "
        "GROUP BY v) "
    )


def _semantic_dedup_oracle_sql(threshold: float = 0.4) -> str:
    """DuckDB replay of similarity.semantic_dedup(strategy='blocked'):
    the shared closure CTEs, singletons via LEFT JOIN."""
    return _semantic_closure_ctes(threshold) + (
        "SELECT e.vec_id, "
        "COALESCE(cl.cluster_id, e.vec_id) AS cluster_id, "
        "COALESCE(cl.cluster_id, e.vec_id) AS keep_vec_id, "
        "CASE WHEN e.vec_id = COALESCE(cl.cluster_id, e.vec_id) "
        "THEN 'keep' ELSE 'drop' END AS action "
        "FROM embeddings e LEFT JOIN cl ON cl.vec_id = e.vec_id"
    )


def _semantic_dedup_ivf_oracle_sql(threshold: float = 0.4) -> str:
    """Envelope oracle for the BOUNDED SemDeDup branch (the
    q_approx_distinct pattern): the replayable facts are the EXACT
    closure's vector count and drop count; the lossy branch only
    contributes the integer agreement flag, asserted 1 — Spark
    computes it as 20*n_agree >= 19*n_vecs (agreement >= 0.95, the
    pinned ivf_sharded recall config k_cells=32/nprobe=8; measured
    1.000 at sf0.01, 0.999 at sf0.1)."""
    return _semantic_closure_ctes(threshold) + (
        "SELECT CAST((SELECT COUNT(*) FROM embeddings) AS BIGINT) "
        "AS n_vecs, "
        "CAST((SELECT COUNT(*) FROM embeddings e "
        "LEFT JOIN cl ON cl.vec_id = e.vec_id "
        "WHERE COALESCE(cl.cluster_id, e.vec_id) <> e.vec_id) AS BIGINT) "
        "AS n_exact_drop, "
        "1 AS agree_ge_95"
    )


def _bpe_learn_oracle_sql(n_steps: int) -> str:
    """Independent DuckDB re-derivation of the BPE TRAINING loop
    (q_bpe_learn): iteration i segments every vocabulary word with the
    merges chosen by iterations 1..i-1 — with the PREVIOUS argmax rows
    as scalar subqueries, never frozen literals — then recomputes the
    weighted adjacent-pair counts and takes the same (cnt DESC, a, b)
    argmax.

    Merge application is BOUNDARY-ANCHORED chained replace (r6 fix):
    every symbol boundary carries a DOUBLE separator and the pattern
    sep+a+sep+sep+b+sep consumes only the inner halves, so a merge's
    left element can never match the suffix of a neighboring symbol
    (plain single-sep replace turned 'bc','a' + merge (c,a) into 'bca'
    — diverging from the fold, which correctly sees symbols
    ['bc','a']). The outer halves survive each replacement, so
    consecutive same-pair runs still merge left-to-right
    non-overlapping exactly like the fold ('a a a a' -> 'aa','aa').
    With L = len(string_split(s, sep2)) (first and last elements ''),
    symbols are l[2..L-1] and pairs are (l[i], l[i+1]) for i in
    2..L-2."""
    sep = chr(31)
    sep2 = sep + sep
    ctes = [
        "WITH toks AS (SELECT regexp_split_to_array(trim(text), '\\s+') "
        "AS t FROM documents), "
        "words AS (SELECT w, COUNT(*) AS n FROM "
        "(SELECT unnest(t) AS w FROM toks) GROUP BY w), "
        f"s0 AS (SELECT '{sep2}' || "
        f"regexp_replace(w, '(.)', '\\1{sep2}', 'g') AS s, "
        "n FROM words)"
    ]
    for i in range(1, n_steps + 1):
        ctes.append(
            f"p{i} AS (SELECT l[g.i] AS a, l[g.i+1] AS b, "
            "SUM(n) AS cnt FROM "
            f"(SELECT string_split(s, '{sep2}') AS l, n FROM s{i-1}) q, "
            "LATERAL unnest(generate_series(2, greatest(len(l)-2, 1))) "
            "AS g(i) GROUP BY l[g.i], l[g.i+1])"
        )
        ctes.append(
            f"m{i} AS (SELECT a, b, cnt FROM p{i} "
            "ORDER BY cnt DESC, a, b LIMIT 1)"
        )
        if i < n_steps:
            ctes.append(
                f"s{i} AS (SELECT replace(s, "
                f"(SELECT '{sep}' || a || '{sep2}' || b || '{sep}' "
                f"FROM m{i}), "
                f"(SELECT '{sep}' || a || b || '{sep}' FROM m{i})) "
                f"AS s, n FROM s{i-1})"
            )
    selects = " UNION ALL ".join(
        f"SELECT {i} AS step, a, b, CAST(cnt AS BIGINT) AS cnt FROM m{i}"
        for i in range(1, n_steps + 1)
    )
    return ", ".join(ctes) + " " + selects


def _zorder_layout_oracle_sql(bits: int, n_files: int) -> str:
    """DuckDB replay of the q_zorder_layout assignment — the oracle
    predicts the parquet FOOTER values: exact-histogram equi-depth
    cells (cell(v) = cum-count-before * 2^bits // n; `//` truncates,
    positive operands, so it equals Spark `div`), Morton interleave
    with bit position i*k + dim_idx, file bucket by the same cum-count
    arithmetic over distinct z values, then per-bucket count/min/max —
    which is exactly what pyarrow reads back from the written files if
    and only if the physical layout realizes the logical one."""
    cells = 2 ** bits
    inter_terms = " | ".join(
        f"(((c{d} >> {i}) & 1) << {i * 2 + d})"
        for i in range(bits)
        for d in range(2)
    )
    return (
        f"WITH n AS (SELECT COUNT(*) AS n FROM events), "
        "ha AS (SELECT user_id AS v, COUNT(*) AS c FROM events "
        "GROUP BY user_id), "
        "ca AS (SELECT v, (COALESCE(SUM(c) OVER (ORDER BY v "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * {cells}) "
        "// (SELECT n FROM n) AS cell FROM ha), "
        "hb AS (SELECT event_id AS v, COUNT(*) AS c FROM events "
        "GROUP BY event_id), "
        "cb AS (SELECT v, (COALESCE(SUM(c) OVER (ORDER BY v "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * {cells}) "
        "// (SELECT n FROM n) AS cell FROM hb), "
        "rz AS (SELECT e.user_id, e.event_id, "
        "ca.cell AS c0, cb.cell AS c1 FROM events e "
        "JOIN ca ON ca.v = e.user_id JOIN cb ON cb.v = e.event_id), "
        f"z AS (SELECT user_id, event_id, {inter_terms} AS z FROM rz), "
        "hz AS (SELECT z AS zv, COUNT(*) AS c FROM z GROUP BY z), "
        "fz AS (SELECT zv, (COALESCE(SUM(c) OVER (ORDER BY zv "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * {n_files}) "
        "// (SELECT n FROM n) AS file_id FROM hz) "
        "SELECT CAST(fz.file_id AS INT) AS file_id, "
        "COUNT(*) AS n_rows, "
        "MIN(z.user_id) AS min_user_id, MAX(z.user_id) AS max_user_id, "
        "MIN(z.event_id) AS min_event_id, MAX(z.event_id) AS max_event_id "
        "FROM z JOIN fz ON fz.zv = z.z GROUP BY fz.file_id"
    )


def _ngram_jaccard_oracle_sql(threshold: float, n: int = 3) -> str:
    """Shared generator for the exact n-gram-Jaccard keys
    (q_ngram_jaccard at 0.2, q_ppjoin_jaccard at its honest 0.8 regime
    since r6) — one SQL body, threshold-parameterized, so the two keys'
    oracles cannot drift. Mirrors the Spark operators exactly: the
    filter applies to the UNROUNDED jaccard (r8) and since r9 the
    EMITTED surface is unrounded too: ROUND(int/int ratio, 4) was the
    r8 _det_avg tie mechanism one surface over — 84 rationals with
    denominator <= 4000 (e.g. 57/800) round differently (Spark HALF_UP
    on the shortest decimal string vs DuckDB re-rounding x*1e4). The
    raw quotient CAST(n_inter AS DOUBLE) / union is the same
    correctly-rounded IEEE division of the same int64s in both engines
    at every input. Threshold CAST to DOUBLE (DuckDB parses bare float
    literals as DECIMAL — CLAUDE.md r5 rule)."""
    # gram width parameterized r10 for the parameter-sweep
    # differentials (emits the historical string byte-identically at
    # n=3 — manifest-checked)
    return (
        "WITH toks AS (SELECT doc_id, "
        "regexp_split_to_array(trim(text), '\\s+') AS t FROM documents), "
        "sh AS (SELECT DISTINCT doc_id, "
        f"array_to_string(t[i:i+{n - 1}], ' ') AS shingle "
        "FROM toks, LATERAL unnest(generate_series(1, "
        f"greatest(len(t)-{n - 1}, 0))) "
        "AS u(i)), "
        "sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "COUNT(*) AS n_inter FROM sh a JOIN sh b "
        "ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
        "GROUP BY a.doc_id, b.doc_id) "
        "SELECT doc_a, doc_b, j AS jaccard FROM ("
        "SELECT doc_a, doc_b, "
        "CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) AS j "
        "FROM inter JOIN sizes sa ON sa.doc_id = doc_a "
        "JOIN sizes sb ON sb.doc_id = doc_b) "
        f"WHERE j >= CAST({threshold} AS DOUBLE)"
    )


def _containment_oracle_sql(threshold_milli: int = 500, n: int = 3) -> str:
    """DuckDB replay of dedup.containment_pairs: same shingle
    construction as q_ngram_jaccard's oracle; containment threshold +
    milli value are pure integer arithmetic (no float anywhere —
    DuckDB's `//` truncates like Spark's `div`, both operands
    non-negative here so truncate == floor). max_df omitted like the
    jaccard oracle: a no-op on the organic corpus (max df 25).
    Parameterized r10 for the sweep differentials; emits the historical
    q_containment string byte-identically at the defaults."""
    return (
        "WITH toks AS (SELECT doc_id, "
        "regexp_split_to_array(trim(text), '\\s+') AS t FROM documents), "
        "sh AS (SELECT DISTINCT doc_id, "
        f"array_to_string(t[i:i+{n - 1}], ' ') AS shingle "
        "FROM toks, LATERAL unnest(generate_series(1, "
        f"greatest(len(t)-{n - 1}, 0))) "
        "AS u(i)), "
        "sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "COUNT(*) AS n_inter FROM sh a JOIN sh b "
        "ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
        "GROUP BY a.doc_id, b.doc_id) "
        "SELECT doc_a, doc_b, n_inter, sa.sz AS size_a, sb.sz AS size_b, "
        "(n_inter * 1000) // least(sa.sz, sb.sz) AS containment_milli "
        "FROM inter JOIN sizes sa ON sa.doc_id = doc_a "
        "JOIN sizes sb ON sb.doc_id = doc_b "
        f"WHERE n_inter * 1000 >= {int(threshold_milli)} * least(sa.sz, sb.sz)"
    )


def _dsir_oracle_sql(target_pred: str = "lang = 'en'") -> str:
    """DuckDB replay of text.dsir_importance (staged r6, wired to
    q_dsir_importance in the r7 window). The only
    cross-engine risk is ln(): JVM Math.log vs libm may differ in the
    last ulp, which can flip the per-token milli rounding only when the
    log-ratio lands within ~1e-13 of a .0005 boundary — watched by the
    differential test, not yet observed. Everything after the one
    rounded log is exact integer arithmetic on both engines."""
    return (
        "WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array("
        "trim(text), '\\s+')) AS token FROM documents), "
        "rawc AS (SELECT token, COUNT(*) AS c_raw FROM toks "
        "GROUP BY token), "
        "tgtc AS (SELECT token, COUNT(*) AS c_tgt FROM "
        "(SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) "
        f"AS token FROM documents WHERE {target_pred}) GROUP BY token), "
        "lm AS (SELECT COALESCE(r.token, t.token) AS token, "
        "COALESCE(c_raw, 0) AS c_raw, COALESCE(c_tgt, 0) AS c_tgt "
        "FROM rawc r FULL OUTER JOIN tgtc t ON r.token = t.token), "
        "tot AS (SELECT CAST(SUM(c_raw) AS BIGINT) AS n_raw, "
        "CAST(SUM(c_tgt) AS BIGINT) AS n_tgt, COUNT(*) AS v FROM lm), "
        "w AS (SELECT token, CAST(round((ln(CAST(c_tgt + 1 AS DOUBLE)) "
        "- ln(CAST(n_tgt + v AS DOUBLE)) - ln(CAST(c_raw + 1 AS DOUBLE)) "
        "+ ln(CAST(n_raw + v AS DOUBLE))) * 1000) AS BIGINT) AS w_milli "
        "FROM lm, tot) "
        "SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, "
        "CAST(SUM(w.w_milli) AS BIGINT) AS weight_milli "
        "FROM toks t JOIN w ON w.token = t.token GROUP BY t.doc_id"
    )


def _waterfill_oracle_sql(budget_tokens: int) -> str:
    """Closed-form SQL replay of text.source_mix_waterfill's
    driver-side integer solve (staged r6, wired to
    q_source_mix_waterfill in the r7 window). The loop's
    state collapses to window arithmetic: sort sources ascending by
    (tokens, name); a source is taken WHOLE iff its total fits the
    fair share of the budget left after all smaller sources are taken
    whole (prefix condition — the first failure index k is where the
    water level forms); everyone from k on gets level = remaining //
    count, with the division remainder distributed +1 to the first
    `rem` of them in the same sort order (matching the Python loop
    exactly). All integer ops, `//` truncation on positive operands."""
    b = int(budget_tokens)
    return (
        "WITH per AS (SELECT source, COUNT(*) AS n_docs, "
        "CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) "
        "AS BIGINT) AS n_tokens FROM documents GROUP BY source), "
        "ord AS (SELECT source, n_docs, n_tokens, "
        "ROW_NUMBER() OVER (ORDER BY n_tokens, source) AS rn, "
        "COUNT(*) OVER () AS m, "
        "CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY n_tokens, source "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        "AS BIGINT) AS cb FROM per), "
        f"kk AS (SELECT MIN(rn) AS k FROM ord WHERE n_tokens > "
        f"({b} - cb) // (m - rn + 1)), "
        "lvl AS (SELECT "
        f"CAST({b} AS BIGINT) - COALESCE((SELECT cb FROM ord "
        "WHERE rn = (SELECT k FROM kk)), 0) AS remb, "
        "(SELECT MAX(m) FROM ord) - COALESCE((SELECT k FROM kk), 0) + 1 "
        "AS cnt), "
        "fl AS (SELECT remb // cnt AS fair, "
        "remb - (remb // cnt) * cnt AS rem FROM lvl) "
        "SELECT source, n_docs, n_tokens, "
        "CAST(CASE WHEN (SELECT k FROM kk) IS NULL "
        "OR rn < (SELECT k FROM kk) THEN n_tokens "
        "ELSE (SELECT fair FROM fl) + "
        "CASE WHEN rn - (SELECT k FROM kk) < (SELECT rem FROM fl) "
        "THEN 1 ELSE 0 END END AS BIGINT) AS alloc_tokens, "
        "CAST(CASE WHEN n_tokens = 0 THEN 0 ELSE (1000 * "
        "CASE WHEN (SELECT k FROM kk) IS NULL "
        "OR rn < (SELECT k FROM kk) THEN n_tokens "
        "ELSE (SELECT fair FROM fl) + "
        "CASE WHEN rn - (SELECT k FROM kk) < (SELECT rem FROM fl) "
        "THEN 1 ELSE 0 END END) // n_tokens END AS BIGINT) "
        "AS rate_milli FROM ord"
    )


def _nb_scores_oracle_sql(label_sql: str = "text LIKE '%dup%'") -> str:
    """r8 promotion staging: DuckDB replay of classifier.nb_scores —
    the integer-surfaced Naive Bayes quality filter. Structure mirrors
    the operator exactly: per-token add-one log-odds rounded to milli
    units (ONE double log per distinct token, the dsir discipline), doc
    scores as exact int64 dot products, token-less docs scoring the
    prior via the LEFT JOIN. ``label_sql`` must be an ANSI predicate
    over the documents columns that Spark's F.expr parses identically
    (the gated label, `text LIKE '%dup%'`, is the one text-derived
    signal the 31-token synthetic corpus HAS — lang/source are
    independent of the text there, measured in r7)."""
    return (
        "WITH toks AS (SELECT doc_id, "
        f"CASE WHEN {label_sql} THEN 1 ELSE 0 END AS is_pos, tok AS token "
        "FROM (SELECT *, unnest(regexp_split_to_array(trim(text), "
        "'\\s+')) AS tok FROM documents) WHERE len(tok) > 0), "
        "lm AS (SELECT token, CAST(SUM(is_pos) AS BIGINT) AS c_pos, "
        "CAST(SUM(1 - is_pos) AS BIGINT) AS c_neg FROM toks GROUP BY "
        "token), "
        "tot AS (SELECT SUM(c_pos) AS n_pos, SUM(c_neg) AS n_neg, "
        "COUNT(*) AS v FROM lm), "
        "w AS (SELECT token, CAST(round(1000 * ("
        "ln(CAST(c_pos + 1 AS DOUBLE)) - ln(CAST(n_pos + v AS DOUBLE)) "
        "- ln(CAST(c_neg + 1 AS DOUBLE)) + ln(CAST(n_neg + v AS DOUBLE))"
        ")) AS BIGINT) AS lo FROM lm, tot), "
        "lab AS (SELECT doc_id, "
        f"CASE WHEN {label_sql} THEN 1 ELSE -1 END AS y FROM documents), "
        "pri AS (SELECT CAST(round(1000 * ("
        "ln(CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) + 1 AS DOUBLE)) "
        "- ln(CAST(SUM(CASE WHEN y = -1 THEN 1 ELSE 0 END) + 1 AS "
        "DOUBLE)))) AS BIGINT) AS prior FROM lab), "
        "per AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, "
        "CAST(SUM(w.lo) AS BIGINT) AS ev FROM toks t JOIN w USING "
        "(token) GROUP BY t.doc_id) "
        "SELECT l.doc_id, CAST(l.y AS BIGINT) AS y, "
        "CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens, "
        "CAST(pri.prior + COALESCE(per.ev, 0) AS BIGINT) AS score_milli, "
        "CAST(CASE WHEN pri.prior + COALESCE(per.ev, 0) > 0 THEN 1 "
        "ELSE -1 END AS BIGINT) AS pred, "
        "CAST(CASE WHEN l.y = (CASE WHEN pri.prior + COALESCE(per.ev, 0) "
        "> 0 THEN 1 ELSE -1 END) THEN 1 ELSE 0 END AS BIGINT) AS correct "
        "FROM lab l LEFT JOIN per USING (doc_id), pri"
    )


def _nb_apply_oracle_sql(
    label_sql: str = "text LIKE '%dup%'",
    salt: str = "v1",
    train_hi: int = 9000,
) -> str:
    """r9 promotion staging: DuckDB replay of the NB train/apply split
    (classifier.nb_token_logodds + nb_prior_milli on the md5 hash_split
    train slice, classifier.nb_apply on the held-out slice). The split
    is the proven q_hash_split bucket arithmetic; training CTEs are the
    proven _nb_scores_oracle_sql body restricted to the train slice;
    apply is a LEFT join against the frozen vocabulary (OOV tokens
    contribute 0, surfaced via n_in_vocab; token-less/all-OOV docs
    score exactly the training prior). Differential-tested on random
    corpora ahead of any driver gate."""
    b = int(train_hi)
    return (
        "WITH split AS (SELECT doc_id, "
        "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || "
        f"'{salt}'), 1, 8)) AS BIGINT) % 10000 AS bucket FROM documents), "
        f"tr AS (SELECT d.* FROM documents d JOIN split USING (doc_id) "
        f"WHERE bucket < {b}), "
        f"he AS (SELECT d.* FROM documents d JOIN split USING (doc_id) "
        f"WHERE bucket >= {b}), "
        "toks_tr AS (SELECT doc_id, "
        f"CASE WHEN {label_sql} THEN 1 ELSE 0 END AS is_pos, tok AS token "
        "FROM (SELECT *, unnest(regexp_split_to_array(trim(text), "
        "'\\s+')) AS tok FROM tr) WHERE len(tok) > 0), "
        "lm AS (SELECT token, CAST(SUM(is_pos) AS BIGINT) AS c_pos, "
        "CAST(SUM(1 - is_pos) AS BIGINT) AS c_neg FROM toks_tr "
        "GROUP BY token), "
        "tot AS (SELECT SUM(c_pos) AS n_pos, SUM(c_neg) AS n_neg, "
        "COUNT(*) AS v FROM lm), "
        "w AS (SELECT token, CAST(round(1000 * ("
        "ln(CAST(c_pos + 1 AS DOUBLE)) - ln(CAST(n_pos + v AS DOUBLE)) "
        "- ln(CAST(c_neg + 1 AS DOUBLE)) + ln(CAST(n_neg + v AS DOUBLE))"
        ")) AS BIGINT) AS lo FROM lm, tot), "
        "pri AS (SELECT CAST(round(1000 * ("
        f"ln(CAST(COALESCE(SUM(CASE WHEN {label_sql} THEN 1 ELSE 0 END)"
        ", 0) + 1 AS DOUBLE)) - "
        f"ln(CAST(COALESCE(SUM(CASE WHEN {label_sql} THEN 0 ELSE 1 END)"
        ", 0) + 1 AS DOUBLE)))) AS BIGINT) AS prior FROM tr), "
        "toks_he AS (SELECT doc_id, tok AS token FROM (SELECT doc_id, "
        "unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok "
        "FROM he) WHERE len(tok) > 0), "
        "per AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, "
        "CAST(COUNT(w.lo) AS BIGINT) AS n_in_vocab, "
        "CAST(SUM(COALESCE(w.lo, 0)) AS BIGINT) AS ev "
        "FROM toks_he t LEFT JOIN w USING (token) GROUP BY t.doc_id) "
        "SELECT he.doc_id, "
        "CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens, "
        "CAST(COALESCE(per.n_in_vocab, 0) AS BIGINT) AS n_in_vocab, "
        "CAST(pri.prior + COALESCE(per.ev, 0) AS BIGINT) AS score_milli, "
        "CAST(CASE WHEN pri.prior + COALESCE(per.ev, 0) > 0 THEN 1 "
        "ELSE -1 END AS BIGINT) AS pred "
        "FROM he LEFT JOIN per USING (doc_id), pri"
    )


def _hybrid_oracle_sql(
    terms: tuple = ("data", "dup"), topk: int = 20, kk: int = 60
) -> str:
    """r9 promotion staging: DuckDB replay of text.hybrid_search — the
    proven q_bm25_search scoring CTEs (Lucene idf, per-term micro-unit
    rounding, (score, doc_id) tie-break, rank after the limit) fused by
    RRF (integer 1e6 // (k + rank)) with a raw-tf ranker. Each ranker
    emits unique doc_ids by construction, so the operator's per-list
    dedup is a no-op here; fused_rank = ROW_NUMBER over (rrf_micro
    DESC, doc_id). All surfaced values integers."""
    tl = ", ".join(f"'{t}'" for t in terms)
    t = int(topk)
    k = int(kk)
    return (
        "WITH d AS (SELECT doc_id, "
        "len(regexp_split_to_array(trim(text), '\\s+')) AS dl "
        "FROM documents), "
        "st AS (SELECT CAST(SUM(dl) AS BIGINT) AS tot, COUNT(*) AS n "
        "FROM d), "
        "toks AS (SELECT doc_id, "
        "unnest(regexp_split_to_array(trim(text), '\\s+')) AS token "
        "FROM documents), "
        f"q AS (SELECT doc_id, token FROM toks WHERE token IN ({tl})), "
        "df AS (SELECT token, COUNT(DISTINCT doc_id) AS df "
        "FROM q GROUP BY 1), "
        "tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM q GROUP BY 1, 2), "
        "agg AS (SELECT tf.doc_id, "
        "CAST(SUM(CAST(round(ln(1 + (n - df + 0.5) / (df + 0.5)) "
        "* (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl "
        "/ (tot / CAST(n AS DOUBLE)))) * 1e6) AS BIGINT)) AS BIGINT) "
        "AS score_micro FROM tf JOIN df USING (token) "
        "JOIN d ON tf.doc_id = d.doc_id CROSS JOIN st GROUP BY 1), "
        "bm AS (SELECT doc_id, rnk FROM (SELECT CAST(row_number() OVER ("
        "ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rnk, doc_id "
        f"FROM agg) WHERE rnk <= {t}), "
        "tfd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS tfq "
        "FROM q GROUP BY 1), "
        "tfr AS (SELECT doc_id, rnk FROM (SELECT CAST(row_number() OVER ("
        "ORDER BY tfq DESC, doc_id) AS BIGINT) AS rnk, doc_id FROM tfd) "
        f"WHERE rnk <= {t}), "
        "u AS (SELECT doc_id, rnk FROM bm "
        "UNION ALL SELECT doc_id, rnk FROM tfr), "
        "fused AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lists, "
        f"CAST(SUM(1000000 // ({k} + rnk)) AS BIGINT) AS rrf_micro "
        "FROM u GROUP BY doc_id) "
        "SELECT CAST(row_number() OVER (ORDER BY rrf_micro DESC, doc_id) "
        "AS BIGINT) AS fused_rank, doc_id, n_lists, rrf_micro FROM fused"
    )


def _temperature_mix_oracle_sql(budget_tokens: int) -> str:
    """r8 promotion staging: DuckDB replay of
    text.source_mix_temperature's driver-side integer solve. isqrt is
    replayed as floor(sqrt(x)) with a +-1 integer correction (double
    sqrt of an int64 is correctly rounded, so the float error is at
    most one unit and the correction makes the result EXACT); the
    largest-remainder top-up is a ROW_NUMBER over (rem DESC, source) —
    the same deterministic order as the Python sort. All integer ops;
    sum(alloc_tokens) == budget exactly whenever any source has
    tokens."""
    b = int(budget_tokens)
    top = (
        "(CASE WHEN rn <= (SELECT leftover FROM lo) THEN 1 ELSE 0 END)"
    )
    return (
        "WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) "
        "AS BIGINT) AS n_tokens FROM documents GROUP BY source), "
        "s0 AS (SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) "
        "AS BIGINT) AS r0 FROM per), "
        "sw AS (SELECT source, n_docs, n_tokens, "
        "r0 + (CASE WHEN (r0 + 1) * (r0 + 1) <= n_tokens THEN 1 ELSE 0 "
        "END) - (CASE WHEN r0 * r0 > n_tokens THEN 1 ELSE 0 END) AS w "
        "FROM s0), "
        "tot AS (SELECT SUM(w) AS tw FROM sw), "
        "alloc0 AS (SELECT sw.*, tot.tw, "
        f"CASE WHEN tot.tw = 0 THEN 0 ELSE ({b} * sw.w) // tot.tw END "
        "AS base, "
        f"CASE WHEN tot.tw = 0 THEN 0 ELSE ({b} * sw.w) % tot.tw END "
        "AS rem FROM sw, tot), "
        f"lo AS (SELECT CASE WHEN MAX(tw) = 0 THEN 0 ELSE {b} - "
        "SUM(base) END AS leftover FROM alloc0), "
        "rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) "
        "AS rn FROM alloc0) "
        "SELECT source, n_docs, n_tokens, CAST(w AS BIGINT) AS "
        f"weight_isqrt, CAST(base + {top} AS BIGINT) AS alloc_tokens, "
        "CAST(CASE WHEN n_tokens = 0 THEN 0 ELSE "
        f"(1000 * (base + {top})) // n_tokens END AS BIGINT) AS "
        "upsample_milli FROM rk"
    )


def _cluster_diversity_oracle_sql(
    threshold: float = 0.2, m: int = 2
) -> str:
    """r8 promotion staging: DuckDB replay of
    dedup.cluster_diversity_sample over ngram_jaccard_pairs — the
    proven pair-closure CTEs (q_dedup_clusters) plus an
    integer-deterministic retention rank (n_tokens DESC, doc_id) within
    each cluster; singletons rank 1 via the LEFT JOIN fallback."""
    return _pair_closure_ctes(threshold) + (
        ", cl AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach "
        "GROUP BY doc_id), "
        "sized AS (SELECT doc_id, CAST(len(regexp_split_to_array("
        "trim(text), '\\s+')) AS BIGINT) AS n_tokens FROM documents), "
        "keyed AS (SELECT s.doc_id, COALESCE(cl.cluster_id, s.doc_id) "
        "AS cluster_id, s.n_tokens FROM sized s LEFT JOIN cl USING "
        "(doc_id)), "
        "rk AS (SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id, "
        "n_tokens, CAST(ROW_NUMBER() OVER (PARTITION BY cluster_id "
        "ORDER BY n_tokens DESC, doc_id) AS BIGINT) AS rank_in_cluster "
        "FROM keyed) "
        "SELECT doc_id, cluster_id, n_tokens, rank_in_cluster, "
        f"CAST(CASE WHEN rank_in_cluster <= {int(m)} THEN 1 ELSE 0 END "
        "AS BIGINT) AS kept FROM rk"
    )


def _substring_spans_oracle_sql(
    min_len: int = 20, k: int | None = None, scope: str = "cross_doc"
) -> str:
    """r8 promotion staging: DuckDB replay of
    dedup.duplicate_substring_spans. Grams are replayed as STRINGS
    (the operator keys on xxhash64 longs — the same
    collision-negligible equivalence the Jaccard family's oracles
    already accept); duplication is the identical MIN/MAX-doc (or
    COUNT) HAVING, islands the same pos - ROW_NUMBER trick, all
    surfaced values integers. Differential-tested on random corpora
    (tests/test_llm_ops_properties.py) ahead of the driver gate."""
    kk = int(min_len if k is None else k)
    return (
        _substring_ctes(kk, scope)
        + "SELECT doc_id, start_pos, span_tokens, n_grams FROM s "
        + f"WHERE span_tokens >= {int(min_len)}"
    )


def _substring_ctes(kk: int, scope: str) -> str:
    """Shared CTE prefix for the substring-dedup oracle family (spans +
    cut): tokenize, positional grams, duplicated-gram set, islands,
    span rollup. One body, two SELECTs — the spans and cut oracles
    cannot drift apart (the _with_shared_oracles discipline)."""
    having = (
        "MIN(doc_id) <> MAX(doc_id)"
        if scope == "cross_doc"
        else "COUNT(*) >= 2"
    )
    return (
        "WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), "
        "'\\s+') AS t FROM documents), "
        "g AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, "
        f"array_to_string(list_slice(t, i, i + {kk} - 1), ' ') AS gram "
        f"FROM toks, unnest(range(1, len(t) - {kk} + 2)) AS u(i)), "
        f"d AS (SELECT gram FROM g GROUP BY gram HAVING {having}), "
        "h AS (SELECT g.doc_id, g.pos, g.pos - ROW_NUMBER() OVER "
        "(PARTITION BY g.doc_id ORDER BY g.pos) AS grp "
        "FROM g JOIN d USING (gram)), "
        "s AS (SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS start_pos, "
        f"CAST(COUNT(*) + {kk} - 1 AS BIGINT) AS span_tokens, "
        "CAST(COUNT(*) AS BIGINT) AS n_grams FROM h GROUP BY doc_id, grp) "
    )


def _cut_spans_oracle_sql(
    min_len: int = 20, k: int | None = None, scope: str = "cross_doc"
) -> str:
    """r8 promotion staging: DuckDB replay of dedup.cut_duplicate_spans
    — the same span CTEs (shared prefix, cannot drift from the spans
    oracle), then the operator's POSITION-level keep/cut rule: a token
    position is flagged when inside a qualifying span's extent,
    protected when inside the k-window of a duplicated gram's
    canonical occurrence (lexicographic min (doc_id, pos) — replayed
    with ROW_NUMBER over the gram's carriers), cut iff flagged and not
    protected. n_cut_spans counts maximal runs of cut positions (the
    same pos - ROW_NUMBER island trick); rebuild via ORDER BY pos
    string_agg. Every doc appears (clean ones verbatim in token space,
    fully-cut ones empty)."""
    kk = int(min_len if k is None else k)
    return (
        _substring_ctes(kk, scope)
        + (
            ", sp AS (SELECT doc_id, start_pos AS cs, "
            "start_pos + span_tokens - 1 AS ce FROM s "
            f"WHERE span_tokens >= {int(min_len)}), "
            "co AS (SELECT doc_id, pos FROM (SELECT g.doc_id, g.pos, "
            "ROW_NUMBER() OVER (PARTITION BY g.gram "
            "ORDER BY g.doc_id, g.pos) AS rn "
            "FROM g JOIN d USING (gram)) WHERE rn = 1), "
            f"pr AS (SELECT doc_id, pos AS ps, pos + {kk} - 1 AS pe "
            "FROM co), "
            "pt AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, t[i] AS token, "
            "CAST(len(t) AS BIGINT) AS nb "
            "FROM toks, unnest(range(1, len(t) + 1)) AS u(i)), "
            "cutp AS (SELECT pt.doc_id, pt.pos FROM pt WHERE EXISTS "
            "(SELECT 1 FROM sp WHERE sp.doc_id = pt.doc_id "
            "AND pt.pos BETWEEN sp.cs AND sp.ce) AND NOT EXISTS "
            "(SELECT 1 FROM pr WHERE pr.doc_id = pt.doc_id "
            "AND pt.pos BETWEEN pr.ps AND pr.pe)), "
            "kept AS (SELECT pt.* FROM pt WHERE NOT EXISTS "
            "(SELECT 1 FROM cutp WHERE cutp.doc_id = pt.doc_id "
            "AND cutp.pos = pt.pos)), "
            "reb AS (SELECT doc_id, MAX(nb) AS nb, "
            "CAST(COUNT(*) AS BIGINT) AS na, "
            "string_agg(token, ' ' ORDER BY pos) AS ta "
            "FROM kept GROUP BY doc_id), "
            "runs AS (SELECT doc_id, pos - ROW_NUMBER() OVER "
            "(PARTITION BY doc_id ORDER BY pos) AS grp FROM cutp), "
            "nc AS (SELECT doc_id, CAST(COUNT(DISTINCT grp) AS BIGINT) "
            "AS ncs FROM runs GROUP BY doc_id) "
            "SELECT dd.doc_id, "
            "CAST(COALESCE(reb.nb, len(regexp_split_to_array(trim(dd.text), "
            "'\\s+'))) AS BIGINT) AS n_tokens_before, "
            "CAST(COALESCE(reb.na, 0) AS BIGINT) AS n_tokens_after, "
            "CAST(COALESCE(nc.ncs, 0) AS BIGINT) AS n_cut_spans, "
            "COALESCE(reb.ta, '') AS text_after "
            "FROM documents dd LEFT JOIN reb ON reb.doc_id = dd.doc_id "
            "LEFT JOIN nc ON nc.doc_id = dd.doc_id"
        )
    )


def _span_stats_oracle_sql(
    min_len: int = 20, k: int | None = None, scope: str = "cross_doc"
) -> str:
    """r8 promotion staging: DuckDB replay of dedup.duplicate_span_stats
    — the same span CTEs (shared prefix, cannot drift from the spans/cut
    oracles) rolled up per document: covered tokens = the INTERVAL
    UNION of the spans' token extents (islands are disjoint in
    gram-position space but extents overlap when the inter-island gap
    is <= k-2 — the same running-max-of-end merge the operator runs),
    truncating-// milli rate on positive operands (the regime where
    Spark div and DuckDB // agree), clean docs included with zeros via
    the left join."""
    kk = int(min_len if k is None else k)
    return (
        _substring_ctes(kk, scope)
        + (
            ", sp AS (SELECT doc_id, start_pos AS s0, "
            "start_pos + span_tokens - 1 AS e0 FROM s "
            f"WHERE span_tokens >= {int(min_len)}), "
            "iv AS (SELECT doc_id, s0, e0, MAX(e0) OVER "
            "(PARTITION BY doc_id ORDER BY s0 ROWS BETWEEN UNBOUNDED "
            "PRECEDING AND 1 PRECEDING) AS pm FROM sp), "
            "iv2 AS (SELECT doc_id, s0, e0, SUM(CASE WHEN pm IS NULL "
            "OR s0 > pm THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id "
            "ORDER BY s0 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT "
            "ROW) AS igrp FROM iv), "
            "mg AS (SELECT doc_id, igrp, MAX(e0) - MIN(s0) + 1 AS cov "
            "FROM iv2 GROUP BY doc_id, igrp), "
            "pd0 AS (SELECT doc_id, CAST(SUM(cov) AS BIGINT) AS "
            "dup_tokens FROM mg GROUP BY doc_id), "
            "pd AS (SELECT pd0.doc_id, pd0.dup_tokens, "
            "CAST(ns.n_spans AS BIGINT) AS n_spans FROM pd0 JOIN "
            "(SELECT doc_id, COUNT(*) AS n_spans FROM sp GROUP BY "
            "doc_id) ns ON ns.doc_id = pd0.doc_id), "
            "tot AS (SELECT doc_id, CAST(len(regexp_split_to_array("
            "trim(text), '\\s+')) AS BIGINT) AS n_tokens FROM documents) "
            "SELECT tot.doc_id, tot.n_tokens, "
            "CAST(COALESCE(pd.dup_tokens, 0) AS BIGINT) AS dup_tokens, "
            "CAST(COALESCE(pd.n_spans, 0) AS BIGINT) AS n_spans, "
            "CASE WHEN tot.n_tokens = 0 THEN CAST(0 AS BIGINT) "
            "ELSE CAST((1000 * COALESCE(pd.dup_tokens, 0)) // "
            "tot.n_tokens AS BIGINT) END AS dup_rate_milli "
            "FROM tot LEFT JOIN pd ON pd.doc_id = tot.doc_id"
        )
    )


def _with_shared_oracles(d: dict) -> dict:
    """Oracle derivations that must stay coupled to another key's SQL:
    q_ppjoin_jaccard is the prefix-filtered exact-Jaccard twin of
    q_ngram_jaccard — same generator, evaluated at its own re-pinned
    threshold (0.8 since r6), so the algorithmic body cannot drift
    between the two keys."""
    d["q_ppjoin_jaccard"] = _ngram_jaccard_oracle_sql(0.8)
    return d


def _lsh_topk_oracle_sql(
    k: int = 5, bits: int = 8, dim: int = 64, n_queries: int = 5
) -> str:
    """DuckDB replay of similarity.lsh_quantized_topk: the proven
    quantization CTE, integer hyperplane weights regenerated from md5,
    sign-bit buckets, bucket-join candidates, quantized-cosine rerank."""
    return (
        "WITH m AS (SELECT vec_id, embedding, CAST(list_aggregate("
        "list_transform(embedding, x -> abs(x)), 'max') AS DOUBLE) "
        "AS maxabs FROM embeddings), "
        "q AS (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * "
        "(CASE WHEN maxabs = 0 THEN 1.0 ELSE 127.0 / maxabs END)) AS INT)) "
        "AS qvec FROM m), "
        "n AS (SELECT vec_id, qvec, CAST(list_aggregate(list_transform("
        "qvec, v -> CAST(v AS BIGINT) * v), 'sum') AS BIGINT) AS sqnorm "
        "FROM q), "
        "hp AS (SELECT b.b AS bit, p.p AS pos, "
        "(CAST(('0x' || substr(md5(CAST(b.b AS VARCHAR) || ':' || "
        "CAST(p.p AS VARCHAR)), 1, 8)) AS BIGINT) % 15) - 7 AS w "
        f"FROM (SELECT unnest(range({bits})) AS b) b, "
        f"(SELECT unnest(range({dim})) AS p) p), "
        "dots AS (SELECT n.vec_id, hp.bit, "
        "SUM(CAST(n.qvec[hp.pos + 1] AS BIGINT) * hp.w) AS d "
        "FROM n, hp GROUP BY n.vec_id, hp.bit), "
        "sigs AS (SELECT vec_id, CAST(SUM(CASE WHEN d > 0 THEN "
        "(1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS bucket "
        "FROM dots GROUP BY vec_id), "
        "corpus AS (SELECT n.vec_id, n.qvec, n.sqnorm, s.bucket "
        "FROM n JOIN sigs s ON s.vec_id = n.vec_id), "
        "qry AS (SELECT vec_id AS query_id, qvec AS qq, sqnorm AS qsq, "
        f"bucket FROM corpus ORDER BY vec_id LIMIT {n_queries}), "
        "scored AS (SELECT qry.query_id, c.vec_id, "
        "CASE WHEN c.sqnorm = 0 OR qry.qsq = 0 THEN 0.0 ELSE "
        "list_inner_product(CAST(c.qvec AS DOUBLE[]), "
        "CAST(qry.qq AS DOUBLE[])) / sqrt(CAST(c.sqnorm AS DOUBLE) * "
        "qry.qsq) END AS raw FROM qry JOIN corpus c "
        "ON c.bucket = qry.bucket) "
        "SELECT query_id, vec_id, round(raw, 4) + 0.0 AS sim, "
        "ROW_NUMBER() OVER (PARTITION BY query_id "
        f"ORDER BY raw DESC, vec_id) AS rank FROM scored QUALIFY rank <= {k}"
    )


def _knn_label_agreement_oracle_sql(n_queries: int = 32, k: int = 10) -> str:
    """DuckDB replay of similarity.knn_label_agreement: milli-unit
    integer vectors, exact integer squared-L2, (d2, vec_id) tie-break,
    integer agreement counts — bit-identical, not approximate."""
    return (
        "WITH iv AS (SELECT vec_id, label, "
        "list_transform(embedding, x -> "
        "CAST(ROUND(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS v "
        "FROM embeddings), "
        "q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv "
        f"FROM iv ORDER BY vec_id LIMIT {n_queries}), "
        "d AS (SELECT q.query_id, q.qlabel, iv.vec_id, iv.label, "
        "CAST(list_sum(list_transform(list_zip(iv.v, q.qv), "
        "p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS d2 "
        "FROM iv CROSS JOIN q WHERE iv.vec_id <> q.query_id), "
        "r AS (SELECT query_id, qlabel, label, "
        "ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2, vec_id) "
        "AS rn FROM d) "
        "SELECT query_id, qlabel, COUNT(*) AS n_neighbors, "
        "CAST(SUM(CASE WHEN label = qlabel THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS n_agree FROM r WHERE rn <= {k} GROUP BY 1, 2"
    )


def _pagerank_oracle_sql(iterations: int = 3, k: int = 50) -> str:
    """Unrolled-CTE replay of graph.pagerank_topk: one CTE per
    iteration, floor-integer arithmetic (`//` == Spark's `div` on
    non-negative operands), (rank, node) tie-break, rank assigned after
    the limit."""
    sql = (
        "WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS src, "
        "l_suppkey * 2 + 1 AS dst FROM orders "
        "JOIN lineitem ON o_orderkey = l_orderkey), "
        "edges AS (SELECT src, dst FROM e0 "
        "UNION ALL SELECT dst, src FROM e0), "
        "deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1), "
        "r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg), "
    )
    for i in range(iterations):
        sql += (
            f"r{i + 1} AS (SELECT e.dst AS node, "
            f"CAST(150000 + (850000 * SUM(r{i}.r // d.deg)) // 1000000 "
            f"AS BIGINT) AS r "
            f"FROM edges e JOIN r{i} ON e.src = r{i}.node "
            f"JOIN deg d ON e.src = d.src GROUP BY 1), "
        )
    sql += (
        f"fin AS (SELECT node, r FROM r{iterations}) "
        "SELECT * FROM (SELECT CAST(row_number() OVER ("
        "ORDER BY r DESC, node) AS INT) AS rnk, node, "
        "CASE WHEN node % 2 = 1 THEN 'supplier' ELSE 'customer' END "
        "AS entity, node // 2 AS entity_key, r AS rank_micro FROM fin) "
        f"WHERE rnk <= {k}"
    )
    return sql


def _kmeans_oracle_sql(k: int = 8, iterations: int = 3) -> str:
    """DuckDB replay of similarity.kmeans: deterministic init (first k
    vec_ids), per-iteration argmax-cosine assignment (the proven
    q_ivf_topk idiom) and micro-unit fixed-point centroid means (the
    proven q_centroid_by_label idiom, + the float32 cast Spark applies),
    unrolled ``iterations`` times."""
    parts = [
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, "
        "embedding FROM embeddings), "
        "c0 AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv "
        f"FROM embeddings ORDER BY vec_id LIMIT {k})"
    ]
    prev = "c0"
    for i in range(1, iterations + 1):
        # r11 zero-norm guard per iteration: a zero centroid is
        # reachable via exact fixed-point cancellation in the means —
        # guarded cosine scores it 0.0 (can win over negative sims)
        # where DuckDB's list_cosine_similarity clamps to -1.0
        guarded = (
            "CASE WHEN list_sum(list_transform(e.v, x -> x*x)) = 0 "
            f"OR list_sum(list_transform({prev}.cv, x -> x*x)) = 0 "
            "THEN CAST(0.0 AS DOUBLE) ELSE "
            f"list_cosine_similarity(e.v, {prev}.cv) END"
        )
        parts.append(
            f"a{i} AS (SELECT vec_id, cid FROM (SELECT e.vec_id, "
            f"{prev}.cid, ROW_NUMBER() OVER (PARTITION BY e.vec_id "
            f"ORDER BY {guarded} DESC, "
            f"{prev}.cid) AS rn FROM e, {prev}) WHERE rn = 1)"
        )
        if i < iterations:
            parts.append(
                f"m{i} AS (SELECT cid, list(CAST(CAST(m AS REAL) AS "
                "DOUBLE) ORDER BY pos) AS cv FROM (SELECT cid, pos, "
                "SUM(CAST(ROUND(val * 1000000) AS BIGINT)) / "
                "(COUNT(*) * 1000000.0) AS m FROM (SELECT "
                f"a{i}.cid, CAST(unnest(e.embedding) AS DOUBLE) AS val, "
                "generate_subscripts(e.embedding, 1) AS pos FROM e "
                f"JOIN a{i} ON a{i}.vec_id = e.vec_id) "
                "GROUP BY cid, pos) GROUP BY cid)"
            )
            prev = f"m{i}"
    return (
        ", ".join(parts)
        + f" SELECT vec_id, cid AS centroid_id FROM a{iterations}"
    )


def _lang_id_oracle_sql() -> str:
    """DuckDB replay of text.lang_id: per-language marker-token hit
    counts, argmax with ties broken by ascending language code (the same
    order sort_array gives the (neg_score, lang) structs)."""
    from dbt_schema_builder_spark.operators.text import LANG_PROFILES

    score_selects = " UNION ALL ".join(
        "SELECT doc_id, '{lang}' AS lang, "
        "COUNT(*) FILTER (WHERE lower(tok) IN ({markers})) AS sc "
        "FROM toks GROUP BY doc_id".format(
            lang=lang,
            markers=", ".join(f"'{m}'" for m in markers),
        )
        for lang, markers in sorted(LANG_PROFILES.items())
    )
    return (
        "WITH toks AS (SELECT doc_id, "
        "unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok "
        "FROM documents), "
        f"s AS ({score_selects}), "
        "r AS (SELECT doc_id, lang, sc, ROW_NUMBER() OVER (PARTITION BY "
        "doc_id ORDER BY sc DESC, lang) AS rn FROM s) "
        "SELECT doc_id, lang AS pred_lang, CAST(sc AS INT) AS marker_hits "
        "FROM r WHERE rn = 1"
    )


def _simhash_oracle_sql(
    n_bits: int = 60, max_hamming: int = 16, max_bucket: int = 200
) -> str:
    """DuckDB replay of dedup.simhash_near_dup(token_hash='portable',
    max_bucket=200): distinct tokens per doc, 60-bit md5-derived token
    hash, per-bit +1/-1 votes, signature = OR of positive-vote bits,
    16-bit band candidates with the windowed bucket-size cap, Hamming
    via bit_count(xor(...))."""
    votes = ", ".join(
        f"SUM(CASE WHEN (h & (1::BIGINT << {i})) != 0 THEN 1 ELSE -1 END) "
        f"AS v{i}"
        for i in range(n_bits)
    )
    sig_bits = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN (1::BIGINT << {i}) ELSE 0::BIGINT END)"
        for i in range(n_bits)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, (s >> {b * 16}) & 65535 AS bucket "
        "FROM sig"
        for b in range(4)
    )
    return (
        "WITH toks AS (SELECT DISTINCT doc_id, "
        "unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok "
        "FROM documents), "
        "hx AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) "
        "AS BIGINT) AS h FROM toks), "
        f"v AS (SELECT doc_id, {votes} FROM hx GROUP BY doc_id), "
        f"sig AS (SELECT doc_id, ({sig_bits}) AS s FROM v), "
        f"bandkeys AS ({band_selects}), "
        "capped AS (SELECT doc_id, band, bucket FROM (SELECT *, COUNT(*) "
        "OVER (PARTITION BY band, bucket) AS bsz FROM bandkeys) "
        f"WHERE bsz <= {max_bucket}), "
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
        "FROM capped a JOIN capped b ON a.band = b.band "
        "AND a.bucket = b.bucket AND a.doc_id < b.doc_id) "
        "SELECT doc_a, doc_b, "
        "CAST(bit_count(xor(sa.s, sb.s)) AS INT) AS hamming "
        "FROM cand JOIN sig sa ON sa.doc_id = doc_a "
        "JOIN sig sb ON sb.doc_id = doc_b "
        f"WHERE bit_count(xor(sa.s, sb.s)) <= {max_hamming}"
    )


def _pair_closure_ctes(threshold: float = 0.2) -> str:
    """Shared recursive-CTE prefix: the proven q_ngram_jaccard pair SQL
    (df cap is a no-op at oracle SF) closed transitively; ``reach``
    enumerates every (doc_id, reachable doc_id) of the pair graph."""
    return (
        "WITH RECURSIVE toks AS (SELECT doc_id, "
        "regexp_split_to_array(trim(text), '\\s+') AS t FROM documents), "
        "sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS "
        "shingle FROM toks, LATERAL unnest(generate_series(1, "
        "greatest(len(t)-2, 0))) AS u(i)), "
        "sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) "
        "AS n_inter FROM sh a JOIN sh b ON a.shingle = b.shingle "
        "AND a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id), "
        "pr AS (SELECT doc_a, doc_b FROM inter "
        "JOIN sizes sa ON sa.doc_id = doc_a "
        "JOIN sizes sb ON sb.doc_id = doc_b "
        f"WHERE n_inter * 1.0 / (sa.sz + sb.sz - n_inter) >= {threshold}), "
        "edges AS (SELECT doc_a AS s, doc_b AS d FROM pr "
        "UNION SELECT doc_b, doc_a FROM pr), "
        "reach(doc_id, r) AS (SELECT DISTINCT s, s FROM edges "
        "UNION SELECT e.s, reach.r FROM edges e "
        "JOIN reach ON reach.doc_id = e.d) "
    )


def _dedup_clusters_oracle_sql(threshold: float = 0.2) -> str:
    """DuckDB replay of dedup_clusters over ngram_jaccard_pairs:
    cluster_id = min doc_id reachable in the pair graph (incl. self)."""
    return _pair_closure_ctes(threshold) + (
        "SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id"
    )


def _cluster_safe_split_oracle_sql(threshold: float = 0.2) -> str:
    """DuckDB replay of dedup.cluster_safe_split: the transitive-closure
    cluster representative (falling back to the doc's own id for
    singletons) fed through the proven q_hash_split md5 bucket
    arithmetic — so every cluster member provably lands in one split."""
    return _pair_closure_ctes(threshold) + (
        ", cl AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach "
        "GROUP BY doc_id), "
        "keyed AS (SELECT d.doc_id, "
        "COALESCE(cl.cluster_id, d.doc_id) AS cluster_id "
        "FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id), "
        "b AS (SELECT doc_id, cluster_id, "
        "CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR) || 'v1'), "
        "1, 8)) AS BIGINT) % 10000 AS bucket FROM keyed) "
        "SELECT doc_id, cluster_id, bucket, "
        "CASE WHEN bucket < 9000 THEN 'train' "
        "WHEN bucket < 9500 THEN 'val' ELSE 'test' END AS split FROM b"
    )


def _minhash_oracle_sql(
    num_hashes: int = 32, bands: int = 8, max_bucket: int | None = None
) -> str:
    """DuckDB replay of dedup.minhash_lsh_candidates(shingle_hash=
    'portable'): same 3-gram shingles as the q_ngram_jaccard oracle, base
    hash = first 32 bits of md5(shingle), h_i(x) = ((2i+1)*x + 7919i+1)
    mod 4294967311, banded candidates via exact slice equality (Spark
    buckets on xxhash64 of the slice — equal iff the slices are equal,
    collisions aside), agreement counted over all 32 positions.
    ``max_bucket`` (r9) replays the per-(band, bucket) population cap
    as the same windowed count the operator runs; the slice-equality
    caveat applies to the cell population too (an xxhash64 collision
    could merge two cells in Spark but not here — vanishingly unlikely
    and differential-watched). max_bucket=None emits the r8 string
    byte-identically (q_near_dup's banked rows stay honest)."""
    p = 4294967311
    rows_per_band = num_hashes // bands
    mins = ", ".join(
        f"min(({2 * i + 1} * h + {7919 * i + 1}) % {p}) AS mh_{i}"
        for i in range(num_hashes)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, concat_ws(':', {cols}) AS bkey FROM sig".format(
            b=b,
            cols=", ".join(
                f"mh_{b * rows_per_band + j}" for j in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    agree = " + ".join(
        f"CAST(sa.mh_{i} = sb.mh_{i} AS INT)" for i in range(num_hashes)
    )
    if max_bucket is None:
        bandkeys_cte = f"bandkeys AS ({band_selects}), "
    else:
        bandkeys_cte = (
            f"bk0 AS ({band_selects}), "
            "bandkeys AS (SELECT doc_id, band, bkey FROM ("
            "SELECT doc_id, band, bkey, COUNT(*) OVER ("
            "PARTITION BY band, bkey) AS bsz FROM bk0) "
            f"WHERE bsz <= {int(max_bucket)}), "
        )
    return (
        "WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), "
        "'\\s+') AS t FROM documents), "
        "sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS "
        "shingle FROM toks, LATERAL unnest(generate_series(1, "
        "greatest(len(t)-2, 0))) AS u(i)), "
        "hx AS (SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 8)) "
        "AS BIGINT) AS h FROM sh), "
        f"sig AS (SELECT doc_id, {mins} FROM hx GROUP BY doc_id), "
        f"{bandkeys_cte}"
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
        "FROM bandkeys a JOIN bandkeys b ON a.band = b.band "
        "AND a.bkey = b.bkey AND a.doc_id < b.doc_id) "
        f"SELECT doc_a, doc_b, CAST({agree} AS BIGINT) AS n_agree "
        "FROM cand JOIN sig sa ON sa.doc_id = doc_a "
        "JOIN sig sb ON sb.doc_id = doc_b"
    )


def _pq_topk_oracle_sql(
    subspaces: int = 16,
    codes: int = 16,
    sd: int = 4,
    n_queries: int = 5,
    k: int = 10,
    rerank: int = 100,
) -> str:
    """DuckDB replay of similarity.pq_topk: milli-unit integer vectors
    (ROUND half-away matches Spark HALF_UP), sampled codebook = the
    first `codes` vec_ids' subvectors, per-subspace argmin by exact
    integer L2 with code-index tie-break, ADC = sum of query-to-codeword
    integer distances looked up by code, then exact integer-L2 rerank of
    the top-`rerank` ADC shortlist. Every intermediate is integer-exact,
    so the replay is bit-identical, not approximate."""
    return (
        "WITH iv AS (SELECT vec_id, "
        "list_transform(embedding, x -> "
        "CAST(ROUND(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS v "
        "FROM embeddings), "
        "samp AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, v "
        f"FROM (SELECT vec_id, v FROM iv ORDER BY vec_id LIMIT {codes})), "
        f"cb AS (SELECT code, s, v[s * {sd} + 1 : s * {sd} + {sd}] AS cw "
        f"FROM samp, LATERAL unnest(generate_series(0, {subspaces - 1})) "
        "AS u(s)), "
        f"sub AS (SELECT vec_id, s, v[s * {sd} + 1 : s * {sd} + {sd}] AS sv "
        f"FROM iv, LATERAL unnest(generate_series(0, {subspaces - 1})) "
        "AS u(s)), "
        "dists AS (SELECT sub.vec_id, sub.s, cb.code, "
        "CAST(list_sum(list_transform(list_zip(sub.sv, cb.cw), "
        "p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS d2 "
        "FROM sub JOIN cb ON sub.s = cb.s), "
        "enc AS (SELECT vec_id, s, code FROM (SELECT vec_id, s, code, "
        "ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, code) AS rn "
        "FROM dists) WHERE rn = 1), "
        "q AS (SELECT vec_id AS query_id, s, code, d2 FROM dists "
        f"WHERE vec_id IN (SELECT vec_id FROM iv ORDER BY vec_id "
        f"LIMIT {n_queries})), "
        "adc AS (SELECT q.query_id, enc.vec_id, "
        "CAST(SUM(q.d2) AS BIGINT) AS adc_dist "
        "FROM enc JOIN q ON enc.s = q.s AND enc.code = q.code "
        "GROUP BY q.query_id, enc.vec_id), "
        "short AS (SELECT query_id, vec_id FROM ("
        "SELECT query_id, vec_id, "
        "ROW_NUMBER() OVER (PARTITION BY query_id "
        "ORDER BY adc_dist, vec_id) AS rn "
        f"FROM adc) WHERE rn <= {rerank}), "
        "ex AS (SELECT short.query_id, short.vec_id, "
        "CAST(list_sum(list_transform(list_zip(cv.v, qv.v), "
        "p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS d2 "
        "FROM short JOIN iv cv ON cv.vec_id = short.vec_id "
        "JOIN iv qv ON qv.vec_id = short.query_id) "
        "SELECT query_id, vec_id, d2, rank FROM ("
        "SELECT query_id, vec_id, d2, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY query_id "
        "ORDER BY d2, vec_id) AS INT) AS rank "
        f"FROM ex) WHERE rank <= {k}"
    )


def _ivfpq_topk_oracle_sql(
    cells: int = 8,
    nprobe: int = 3,
    subspaces: int = 16,
    codes: int = 16,
    sd: int = 4,
    n_queries: int = 5,
    k: int = 10,
    rerank: int = 100,
) -> str:
    """DuckDB replay of similarity.ivfpq_topk: the PQ oracle plus the
    coarse level — centroid = first `cells` vec_ids' integer vectors,
    cell assignment / query probes by exact integer L2 with index
    tie-break (numpy argmin / stable argsort on the Spark side), ADC
    restricted to probed cells, exact rerank of the shortlist."""
    return (
        "WITH iv AS (SELECT vec_id, "
        "list_transform(embedding, x -> "
        "CAST(ROUND(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS v "
        "FROM embeddings), "
        "samp AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, v "
        f"FROM (SELECT vec_id, v FROM iv ORDER BY vec_id LIMIT {codes})), "
        f"cb AS (SELECT code, s, v[s * {sd} + 1 : s * {sd} + {sd}] AS cw "
        f"FROM samp, LATERAL unnest(generate_series(0, {subspaces - 1})) "
        "AS u(s)), "
        f"sub AS (SELECT vec_id, s, v[s * {sd} + 1 : s * {sd} + {sd}] AS sv "
        f"FROM iv, LATERAL unnest(generate_series(0, {subspaces - 1})) "
        "AS u(s)), "
        "dists AS (SELECT sub.vec_id, sub.s, cb.code, "
        "CAST(list_sum(list_transform(list_zip(sub.sv, cb.cw), "
        "p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS d2 "
        "FROM sub JOIN cb ON sub.s = cb.s), "
        "enc AS (SELECT vec_id, s, code FROM (SELECT vec_id, s, code, "
        "ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, code) AS rn "
        "FROM dists) WHERE rn = 1), "
        "cents AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, v "
        f"FROM (SELECT vec_id, v FROM iv ORDER BY vec_id LIMIT {cells})), "
        "cdists AS (SELECT iv.vec_id, cents.cell, "
        "CAST(list_sum(list_transform(list_zip(iv.v, cents.v), "
        "p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS d2 "
        "FROM iv, cents), "
        "assign AS (SELECT vec_id, cell FROM (SELECT vec_id, cell, "
        "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn "
        "FROM cdists) WHERE rn = 1), "
        "probes AS (SELECT query_id, cell FROM (SELECT vec_id AS query_id, "
        "cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) "
        "AS rn FROM cdists WHERE vec_id IN "
        f"(SELECT vec_id FROM iv ORDER BY vec_id LIMIT {n_queries})) "
        f"WHERE rn <= {nprobe}), "
        "q AS (SELECT vec_id AS query_id, s, code, d2 FROM dists "
        f"WHERE vec_id IN (SELECT vec_id FROM iv ORDER BY vec_id "
        f"LIMIT {n_queries})), "
        "adc AS (SELECT q.query_id, enc.vec_id, "
        "CAST(SUM(q.d2) AS BIGINT) AS adc_dist "
        "FROM enc JOIN assign ON enc.vec_id = assign.vec_id "
        "JOIN probes ON probes.cell = assign.cell "
        "JOIN q ON enc.s = q.s AND enc.code = q.code "
        "AND q.query_id = probes.query_id "
        "GROUP BY q.query_id, enc.vec_id), "
        "short AS (SELECT query_id, vec_id FROM ("
        "SELECT query_id, vec_id, "
        "ROW_NUMBER() OVER (PARTITION BY query_id "
        "ORDER BY adc_dist, vec_id) AS rn "
        f"FROM adc) WHERE rn <= {rerank}), "
        "ex AS (SELECT short.query_id, short.vec_id, "
        "CAST(list_sum(list_transform(list_zip(cv.v, qv.v), "
        "p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS d2 "
        "FROM short JOIN iv cv ON cv.vec_id = short.vec_id "
        "JOIN iv qv ON qv.vec_id = short.query_id) "
        "SELECT query_id, vec_id, d2, rank FROM ("
        "SELECT query_id, vec_id, d2, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY query_id "
        "ORDER BY d2, vec_id) AS INT) AS rank "
        f"FROM ex) WHERE rank <= {k}"
    )


def _keep_canonical_oracle_sql(threshold: float = 0.2) -> str:
    """DuckDB replay of dedup.keep_canonical over the ngram pair graph:
    cluster = min reachable doc_id (recursive CTE), keeper = the
    representative itself, singletons keep themselves."""
    return _pair_closure_ctes(threshold) + (
        ", cl AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach "
        "GROUP BY doc_id) "
        "SELECT d.doc_id, "
        "COALESCE(cl.cluster_id, d.doc_id) AS cluster_id, "
        "COALESCE(cl.cluster_id, d.doc_id) AS keep_doc_id, "
        "CASE WHEN d.doc_id = COALESCE(cl.cluster_id, d.doc_id) "
        "THEN 'keep' ELSE 'drop' END AS action "
        "FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id"
    )
