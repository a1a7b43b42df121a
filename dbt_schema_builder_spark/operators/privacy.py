"""Privacy gates for training-data release: k-anonymity, distinct
l-diversity, and entropy l-diversity over quasi-identifier columns
(r11/r12/r13, tests-only — the 50-slot driver window is structurally
full, CLAUDE.md r11 lesson).

The reference's policy surface redacts DIRECT identifiers
(templates/model_sql_safe.tpl — name/balance literals); this module
covers the complementary re-identification channel a curation pipeline
must close before corpus release: combinations of innocuous columns
(language x source x length bucket, geo x date, ...) that single out
individuals. k-anonymity (Sweeney 2002) is the standard gate: every
released row must share its quasi-identifier (QI) combination with at
least k-1 others.

Scale design (100 TB):

- ``k_anonymity_report`` is one map-side-combined groupBy on the QI
  columns — the same shuffle a count-distinct profile already pays;
  output is QI-cardinality-bounded, never corpus-sized.
- ``k_anonymize`` uses a WINDOW count over the QI partition instead of
  aggregate + join-back: one exchange, no second corpus scan, and the
  filter is map-side after the window. Suppression only (the
  deterministic mode an oracle can replay); generalization hierarchies
  are a policy decision layered on top by rewriting QI columns before
  the gate.
- NULL QI values: SQL grouping treats NULL as a key (DuckDB and Spark
  agree), so NULL groups are gated like any other — no special-casing,
  and the degenerate-probe NULL frames pass through both ops.

Both ops are pure relational Catalyst (no UDF, no collect) and replay
verbatim in ANSI SQL — differential-tested against DuckDB in
tests/test_privacy.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _validated_quasi(df: DataFrame, quasi: list[str], k: int, op: str):
    """Validate at plan construction (the r6 rule): bad config must
    never become an executor error or a silently-empty result."""
    if not quasi:
        raise ValueError(f"{op}: quasi must name at least one column")
    missing = [c for c in quasi if c not in df.columns]
    if missing:
        raise ValueError(
            f"{op}: quasi columns {missing} not in frame "
            f"(has {df.columns})"
        )
    if k < 1:
        raise ValueError(f"{op}: k must be >= 1, got {k}")


def k_anonymity_report(
    df: DataFrame, quasi: list[str], k: int = 5
) -> DataFrame:
    """Per-QI-group risk report: (quasi..., n_rows, at_risk) where
    at_risk = 1 iff the group has fewer than ``k`` rows — the table a
    release review actually reads, ordered nowhere (let the consumer
    sort). One map-combined groupBy; output bounded by QI cardinality.
    """
    _validated_quasi(df, quasi, k, "k_anonymity_report")
    _validated_no_collision(quasi, {"n_rows", "at_risk"}, "k_anonymity_report")
    return df.groupBy(*quasi).agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) < F.lit(k)).cast("int").alias("at_risk"),
    )


def l_diversity_report(
    df: DataFrame, quasi: list[str], sensitive: str, l: int = 2
) -> DataFrame:
    """Distinct l-diversity risk report (Machanavajjhala et al. 2007),
    the companion gate k-anonymity alone cannot provide: a QI group can
    have >= k rows yet leak the sensitive attribute outright when every
    row in it shares one value. Emits (quasi..., n_rows, n_sensitive,
    at_risk) where n_sensitive = COUNT(DISTINCT sensitive) within the
    group and at_risk = 1 iff n_sensitive < ``l``.

    NULL sensitive values are IGNORED by the distinct count (SQL
    COUNT(DISTINCT) semantics, identical in Spark and DuckDB), so an
    all-NULL group reports n_sensitive = 0 and is at risk — the
    conservative reading: a NULL carries no diversity.

    Scale: one groupBy on the QI columns; distinct-count expands to the
    standard two-phase partial aggregate, output bounded by QI
    cardinality — the same shape as ``k_anonymity_report``.
    """
    _validated_quasi(df, quasi, 1, "l_diversity_report")
    _validated_sensitive(df, quasi, sensitive, "l_diversity_report")
    _validated_no_collision(
        quasi + [sensitive],
        {"n_rows", "n_sensitive", "at_risk"},
        "l_diversity_report",
    )
    if l < 1:
        raise ValueError(f"l_diversity_report: l must be >= 1, got {l}")
    n_distinct = F.countDistinct(F.col(sensitive))
    return df.groupBy(*quasi).agg(
        F.count(F.lit(1)).alias("n_rows"),
        n_distinct.alias("n_sensitive"),
        (n_distinct < F.lit(l)).cast("int").alias("at_risk"),
    )


def _validated_no_collision(cols: list[str], reserved: set[str], op: str):
    """A quasi/sensitive column named like an emitted (or internal)
    column would survive into the groupBy output next to the aggregate
    alias and die downstream in AMBIGUOUS_REFERENCE far from the cause
    — reject loudly at plan construction instead. Casefolded (the r12
    rule: Spark resolves identifiers case-insensitively by default)."""
    clash = sorted({c for c in cols if c.lower() in reserved})
    if clash:
        raise ValueError(
            f"{op}: column(s) {clash} collide (case-insensitively) with "
            f"this report's emitted or internal column names — rename "
            "them first"
        )


def _validated_sensitive(df: DataFrame, quasi: list[str], sensitive: str, op: str):
    if sensitive not in df.columns:
        raise ValueError(
            f"{op}: sensitive column {sensitive!r} not in "
            f"frame (has {df.columns})"
        )
    if sensitive in quasi:
        raise ValueError(
            f"{op}: sensitive column cannot be a quasi "
            f"identifier ({sensitive!r} is in quasi — every group would "
            "trivially report n_sensitive <= 1)"
        )


def entropy_l_diversity_report(
    df: DataFrame, quasi: list[str], sensitive: str, l: int = 2
) -> DataFrame:
    """Entropy l-diversity risk report (Machanavajjhala et al. 2007
    §3), the stronger form distinct-l cannot provide: a group where one
    value holds 99% of rows passes distinct-l at l=2 yet leaks the
    sensitive attribute with near-certainty. The entropy gate requires
    -sum(p_i ln p_i) >= ln(l) over the group's sensitive-value
    distribution. Emits (quasi..., n_rows, n_sensitive,
    entropy_micronats, at_risk).

    Determinism (the repo's fixed-point log convention — zipf_stats /
    dsir milli-nat discipline): per-value ln(n_i) and per-group ln(n)
    are rounded to integer MICRO-nats (log-derived values never land on
    a representable rounding tie, the r10 rule; ln(1) = 0 is exact on
    both engines), and the identity n*H = n*ln(n) - sum(n_i*ln(n_i))
    then runs entirely in int64 — summation-order independent, replayed
    verbatim in DuckDB (tests/test_privacy.py differential). The gate
    compares integers: at_risk iff n*L(n) - S < n*L(l) (with L(x) =
    round(ln(x)*1e6)); `entropy_micronats` itself is the truncating
    integral quotient of two non-negative int64s (`div`, identical in
    Spark and DuckDB for positive operands). Overflow ceiling: n*L(n)
    needs n * 41e6 < 2^63, i.e. up to ~2e11 rows per QI group.

    NULL sensitive values carry no diversity (the distinct-l
    convention): they count in n_rows but are excluded from the
    distribution; a group with zero non-NULL values reports entropy 0
    and is at risk regardless of ``l``.

    Scale: two map-combined aggregates — (quasi..., sensitive) value
    counts, then the QI rollup (the r4c "derive the coarser aggregate
    from the finer one" rule); output bounded by QI cardinality."""
    _validated_quasi(df, quasi, 1, "entropy_l_diversity_report")
    _validated_sensitive(df, quasi, sensitive, "entropy_l_diversity_report")
    if l < 1:
        raise ValueError(f"entropy_l_diversity_report: l must be >= 1, got {l}")
    _validated_no_collision(
        quasi + [sensitive],
        {"n_rows", "n_sensitive", "entropy_micronats", "at_risk",
         "_sv", "_ni", "_ne", "_s", "_ent_scaled", "_thresh"},
        "entropy_l_diversity_report",
    )
    per_val = df.groupBy(
        *quasi, F.col(sensitive).alias("_sv")
    ).agg(F.count(F.lit(1)).alias("_ni"))
    l_ni = F.round(F.log(F.col("_ni").cast("double")) * 1e6).cast("long")
    nn = F.col("_sv").isNotNull()
    agg = per_val.groupBy(*quasi).agg(
        F.sum("_ni").cast("bigint").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(nn, F.col("_ni"))), F.lit(0)
        ).cast("bigint").alias("_ne"),
        F.count(F.when(nn, F.lit(1))).cast("bigint").alias("n_sensitive"),
        # coalesce: an all-NULL group sums over nothing -> NULL (the r8
        # empty-sum lesson)
        F.coalesce(
            F.sum(F.when(nn, F.col("_ni") * l_ni)), F.lit(0)
        ).cast("bigint").alias("_s"),
    )
    ne = F.col("_ne")
    l_ne = F.round(F.log(ne.cast("double")) * 1e6).cast("long")
    l_l = F.round(F.log(F.lit(float(l))) * F.lit(1e6)).cast("long")
    staged = agg.select(
        *quasi,
        "n_rows",
        "n_sensitive",
        "_ne",
        F.when(ne == 0, F.lit(0).cast("long"))
        .otherwise(ne * l_ne - F.col("_s"))
        .alias("_ent_scaled"),
        (ne * l_l).alias("_thresh"),
    )
    return staged.select(
        *quasi,
        "n_rows",
        "n_sensitive",
        # truncating integral div of non-negative int64s: identical in
        # Spark and DuckDB (the r9 rule — never double-divide big longs)
        F.when(F.col("_ne") == 0, F.lit(0).cast("long"))
        .otherwise(F.expr("_ent_scaled div _ne"))
        .alias("entropy_micronats"),
        (
            (F.col("n_sensitive") == 0)
            | (F.col("_ent_scaled") < F.col("_thresh"))
        ).cast("int").alias("at_risk"),
    )


def k_anonymize(df: DataFrame, quasi: list[str], k: int = 5) -> DataFrame:
    """Suppression-mode k-anonymity: drop every row whose QI group has
    fewer than ``k`` members. Window count over the QI partition — one
    exchange, no aggregate-plus-join-back second scan of the corpus
    (the r4c "derive from the finer rollup" rule applied to a filter).
    Returns the input columns unchanged, rows filtered."""
    _validated_quasi(df, quasi, k, "k_anonymize")
    # Helper column name must not collide with a user column, or the
    # user's column would be silently overwritten and dropped (breaking
    # the "input columns unchanged" contract) — uniquify against the
    # actual frame schema (r11 advice). Casefolded: Spark resolves
    # withColumn/drop case-insensitively by default, so a '_QI_N' user
    # column would otherwise still be clobbered (r12 review find).
    taken = {c.lower() for c in df.columns}
    helper = "_qi_n"
    while helper in taken:
        helper += "_"
    w = Window.partitionBy(*[F.col(c) for c in quasi])
    return (
        df.withColumn(helper, F.count(F.lit(1)).over(w))
        .where(F.col(helper) >= F.lit(k))
        .drop(helper)
    )
