"""Privacy gates for training-data release: k-anonymity and distinct
l-diversity over quasi-identifier columns (r11/r12, tests-only — the
50-slot driver window is structurally full, CLAUDE.md r11 lesson).

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
    if sensitive not in df.columns:
        raise ValueError(
            f"l_diversity_report: sensitive column {sensitive!r} not in "
            f"frame (has {df.columns})"
        )
    if sensitive in quasi:
        raise ValueError(
            "l_diversity_report: sensitive column cannot be a quasi "
            f"identifier ({sensitive!r} is in quasi — every group would "
            "trivially report n_sensitive <= 1)"
        )
    if l < 1:
        raise ValueError(f"l_diversity_report: l must be >= 1, got {l}")
    n_distinct = F.countDistinct(F.col(sensitive))
    return df.groupBy(*quasi).agg(
        F.count(F.lit(1)).alias("n_rows"),
        n_distinct.alias("n_sensitive"),
        (n_distinct < F.lit(l)).cast("int").alias("at_risk"),
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
