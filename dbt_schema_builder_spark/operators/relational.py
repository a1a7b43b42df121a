"""Relational analytics operators (SURVEY.md Tier B6-B11).

The reference contains no data-level joins/aggregations beyond its metadata
merge (SURVEY.md section 2, "explicitly absent"); these are the north-star
relational extensions, expressed so Catalyst picks the right physical
strategy at any scale:

- dimension sides of star joins are wrapped in ``F.broadcast`` — at 100 TB
  the fact table never shuffles for a dim join
- aggregations are plain ``groupBy().agg`` so partial (map-side) combine and
  AQE partition coalescing apply
- top-k uses ``orderBy().limit`` which Spark plans as TakeOrderedAndProject
  (no global sort materialization)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def star_join_revenue(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Revenue by nation across the full star schema (TPC-H Q5 shape).

    lineitem (fact) joins orders on the shuffle path; customer / nation /
    region are broadcast so the plan is a single shuffle (lineitem x orders)
    followed by broadcast hash joins — the correct 100 TB plan.
    """
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    return (
        lineitem.select("l_orderkey", revenue)
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.round(F.sum("rev"), 2).alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shape hash aggregation with partial combine: per
    (returnflag, linestatus) sums/averages/counts.

    Tie-class bound (r10 ROUND sweep): the ROUND(SUM/AVG, n) money
    surfaces here and in the other TPC-H shapes are KEPT deliberately —
    they mirror TPC-H's published query form. avg_qty is technically
    the int/int class (quantities are integral-valued doubles, sums
    exact below 2^53), so a fixture whose group mean lands exactly on
    k/20000 would diverge engines; 9 rounds x 2 SFs have not produced
    one, and a hit shows up loudly as a driver hash mismatch whose
    remediation is the same raw-quotient retirement applied elsewhere
    in r10. The money SUMs are double accumulations (order-dependent in
    the last ulps) — the r1-accepted class, stable because ROUND(.,2)
    sits far above the accumulated error for these magnitudes."""
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def semi_anti_customers(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Semi + anti join in one labeled result: customers with at least one
    order vs customers with none. ``left_semi`` / ``left_anti`` avoid
    materializing the join payload — at scale the orders side is only
    scanned for its key column."""
    keys = orders.select("o_custkey")
    has = (
        customer.join(keys, customer.c_custkey == keys.o_custkey, "left_semi")
        .select("c_custkey", F.lit("has_order").alias("segment"))
    )
    hasnt = (
        customer.join(keys, customer.c_custkey == keys.o_custkey, "left_anti")
        .select("c_custkey", F.lit("no_order").alias("segment"))
    )
    return has.unionAll(hasnt)


def rollup_order_stats(orders: DataFrame) -> DataFrame:
    """Multi-level aggregate via ROLLUP (B8): totals per (priority, status),
    per priority, and grand total."""
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_price"),
             F.count(F.lit(1)).alias("n_orders"))
    )


def cube_order_stats(orders: DataFrame) -> DataFrame:
    """Full cube (B8): aggregates for every subset of
    (status, priority) — 4 grouping sets in one pass."""
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
             F.count(F.lit(1)).alias("n_orders"))
    )


def top_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """Window ranking (B9): top-k orders per customer by totalprice with a
    deterministic tie-break on orderkey. Spark runs this as a single
    shuffle on o_custkey + per-partition sort — running at 100 TB this is
    the standard top-N-per-group plan (no global sort)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= k)
    )


def running_customer_totals(orders: DataFrame) -> DataFrame:
    """Analytic window with frame (B9): per-customer running order total in
    orderdate order (deterministic tie-break on orderkey)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


def top_k_orders(orders: DataFrame, k: int = 10) -> DataFrame:
    """Global top-k (B10): planned as TakeOrderedAndProject — each partition
    keeps k rows, driver merges; never a global sort. Deterministic
    tie-break on orderkey."""
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(k)
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_event_counts(events: DataFrame) -> DataFrame:
    """Pivot: per-user event counts, one column per event type. The
    explicit value list keeps the schema static (no extra pass to
    discover pivot values) — required for a stable plan at scale."""
    out = (
        events.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in EVENT_TYPES],
    )


def unpivot_event_counts(pivoted: DataFrame) -> DataFrame:
    """Unpivot (melt) back to long form: (user_id, event_type, n)."""
    return pivoted.unpivot(
        ids=["user_id"],
        values=[f"n_{t}" for t in EVENT_TYPES],
        variableColumnName="event_type",
        valueColumnName="n",
    ).select(
        "user_id",
        F.expr("substring(event_type, 3)").alias("event_type"),
        "n",
    )


def customer_set_ops(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Set operators (B11) over compatible key projections: customers that
    appear in orders (INTERSECT), minus a high-balance slice (EXCEPT),
    unioned with a labeled marker column for hash-stability."""
    cust_keys = customer.select(F.col("c_custkey").alias("custkey"))
    order_keys = orders.select(F.col("o_custkey").alias("custkey"))
    inter = cust_keys.intersect(order_keys)
    rich = customer.where("c_acctbal > 5000").select(
        F.col("c_custkey").alias("custkey")
    )
    return (
        inter.exceptAll(rich).select("custkey", F.lit("modest").alias("bucket"))
        .unionAll(inter.intersect(rich).select("custkey", F.lit("rich").alias("bucket")))
    )


def heavy_hitters(
    df: DataFrame, col: str, support: float = 0.1
) -> DataFrame:
    """Frequent items above a support threshold, sketch-then-verify
    (B34): ``freqItems`` (Karp/Misra-Gries, one pass, bounded 1/support
    state per executor) proposes a candidate superset — it retains every
    item with frequency strictly above ``support`` but may add false
    positives — then one exact counting pass over ONLY the candidate
    rows removes them. At 100 TB the verify pass is a broadcast-filtered
    scan + an aggregation whose key space is at most 1/support items, so
    neither pass shuffles the full key cardinality.

    Emits exact (value, n, frac) for items with frequency > support —
    deterministic and oracle-checkable, unlike the raw sketch output.
    ``frac`` is the UNROUNDED n/total quotient (r9, the jaccard
    tie-class retirement): ROUND of a double ratio of integers diverges
    between engines on 4-decimal-tie rationals; the raw IEEE quotient
    of the same int64s is identical everywhere.
    """
    cands = df.stat.freqItems([col], support).collect()[0][0]
    if not cands:
        cands = [None]
    total = df.select(F.count(F.lit(1)).alias("_total"))
    return (
        df.where(F.col(col).isin(list(cands)))
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .where(F.col("n") > support * F.col("_total"))
        .select(
            col,
            "n",
            (F.col("n") / F.col("_total")).alias("frac"),
        )
    )


def fuzzy_match_names(
    df,
    name_col: str = "p_name",
    max_distance: int = 2,
):
    """Blocked fuzzy entity matching, signature-first: DISTINCT names
    (with multiplicities) are matched within a blocking key (the name's
    last token), verified by exact Levenshtein 1..``max_distance`` —
    identical names are exact-dedup's job and excluded. The
    record-linkage shape that scales: the edit-distance join runs over
    the bounded SIGNATURE table (distinct names), never the record
    table, and ``n_pairs = cnt_a * cnt_b`` expands the record-level
    match count without materializing the pairs (2.4 M record pairs at
    sf0.1 collapse to a handful of name pairs).

    One distinct aggregate on the records (map-side combined) + one
    equi-join on the block key over the signature table. Blocks are
    vocabulary-bounded; if a block's signature population is still hot
    at 100 TB, add a second blocking component or the windowed
    population cap (the simhash max_bucket pattern).
    """
    from pyspark.sql import functions as F

    names = df.groupBy(F.col(name_col).alias("name")).agg(
        F.count(F.lit(1)).alias("cnt")
    ).select("name", "cnt", F.element_at(F.split("name", " "), -1).alias("blk"))
    a = names.select(
        F.col("name").alias("name_a"), F.col("cnt").alias("cnt_a"), "blk"
    )
    b = names.select(
        F.col("name").alias("name_b"), F.col("cnt").alias("cnt_b"), "blk"
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, "blk")
        .where(F.col("name_a") < F.col("name_b"))
        .where(dist.between(1, max_distance))
        .select(
            "name_a",
            "name_b",
            dist.alias("edit_distance"),
            (F.col("cnt_a") * F.col("cnt_b")).alias("n_pairs"),
        )
    )


def merge_partial_aggregates(
    state,
    batch,
    key_cols: list[str],
    sum_cols: list[str],
    count_col: str = "n",
):
    """Incremental materialized-aggregate maintenance: fold a new raw
    batch into a per-key (sums..., count) state table WITHOUT
    re-scanning history — the mechanism behind every incrementally
    maintained rollup (and the batch mirror of the streaming state
    store). Sums and counts are commutative monoids, so
    aggregate-the-batch + union + re-aggregate is EXACTLY equivalent to
    recomputing over all raw data ever seen — provided the summed
    columns are integers (micro-unit convention); float sums would
    drift from the recompute by summation order.

    Cost per increment: one aggregate shuffle over the BATCH plus one
    over (state ∪ batch-partials) — state is keys-sized, never raw
    history. Bucket both sides by the key (``sources.bucketing``) and
    the merge is shuffle-free. Derived means stay exact: mean =
    sum / n computed at read time, never stored.
    """
    from pyspark.sql import functions as F

    partial = batch.groupBy(*key_cols).agg(
        *[F.sum(c).alias(c) for c in sum_cols],
        F.count(F.lit(1)).alias(count_col),
    )
    return (
        state.unionByName(partial)
        .groupBy(*key_cols)
        .agg(
            *[F.sum(c).alias(c) for c in sum_cols],
            F.sum(count_col).alias(count_col),
        )
    )
