"""Data-profiling operators: per-column statistics in one pass.

The catalog layer answers "what columns exist" (reference A1); profiling
answers "what's in them" — the first step of any pipeline onboarding new
data. One job, one scan: all per-column aggregates are computed in a
single ``select`` so a 100 TB profile costs one pass, not one per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def _det_avg_nullaware(c: str, scale: float = 1e6):
    """Order-independent mean: round inputs to fixed-point micro-units,
    sum exactly as integers, divide by the non-null count once. Plain
    avg(float) depends on partial-aggregation order; this cannot. The
    emitted surface is the RAW IEEE quotient of the exact int64 micro
    sum (r10 tie-class retirement: ROUND of an exact-int ratio is the
    class the r8 4-decimal-tie find proved divergent — see
    similarity._det_avg_round4's docstring)."""
    units = F.round(F.col(c).cast("double") * scale).cast("long")
    return F.sum(units).cast("double") / (F.count(c) * F.lit(scale))


def profile_numeric(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Per-numeric-column stats: count, nulls, distinct, min/max/avg.
    Returns one row per column (column_name, n, n_null, n_distinct,
    min_value, max_value, avg_value) — computed in a single aggregation,
    then unpivoted driver-side (the aggregate result is one row).

    ``n_distinct`` defaults to the HLL sketch (approx_count_distinct):
    mergeable, one pass, no per-column full shuffle — the 100 TB default.
    ``exact_distinct=True`` switches to exact COUNT(DISTINCT) for
    oracle-checkable runs; at scale that is one expanded shuffle per
    column, so keep it opt-in."""
    if columns is None:
        columns = [
            f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
        ]
    distinct_agg = F.countDistinct if exact_distinct else F.approx_count_distinct
    aggs = []
    for c in columns:
        aggs.extend(
            [
                F.count(F.lit(1)).alias(f"{c}__n"),
                F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__n_null"),
                distinct_agg(c).alias(f"{c}__n_distinct"),
                # raw min/max pass input values through untouched —
                # ROUND of an arbitrary double diverges engines when an
                # input sits on a 4-decimal shortest-repr tie (r10)
                F.min(c).cast("double").alias(f"{c}__min"),
                F.max(c).cast("double").alias(f"{c}__max"),
                _det_avg_nullaware(c).alias(f"{c}__avg"),
            ]
        )
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    out = [
        (
            c,
            row[f"{c}__n"],
            row[f"{c}__n_null"],
            row[f"{c}__n_distinct"],
            row[f"{c}__min"],
            row[f"{c}__max"],
            row[f"{c}__avg"],
        )
        for c in columns
    ]
    return spark.createDataFrame(
        out,
        "column_name string, n bigint, n_null bigint, n_distinct bigint, "
        "min_value double, max_value double, avg_value double",
    )


def approx_quantiles(
    df: DataFrame, column: str, probabilities: list[float] | None = None
) -> DataFrame:
    """Approximate quantiles via percentile_approx (t-digest style sketch;
    single pass, mergeable across partitions — the scale-correct way to
    get percentiles)."""
    probabilities = probabilities or [0.25, 0.5, 0.75, 0.9, 0.99]
    arr = F.percentile_approx(
        column, probabilities, accuracy=10000
    ).alias("q")
    row = df.agg(arr).collect()[0]["q"]
    return df.sparkSession.createDataFrame(
        list(zip(probabilities, [float(v) for v in row])),
        "probability double, value double",
    )

def mad_outliers(
    events: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    n_mads: float = 3.0,
) -> DataFrame:
    """Robust outlier gate per group: flag rows whose absolute deviation
    from the group median exceeds ``n_mads`` times the group's median
    absolute deviation. The MAD gate is the standard robust alternative to
    z-scores (mean/stddev are themselves dragged by the outliers they are
    supposed to catch) — data-quality pipelines use it to quarantine
    corrupt numeric feeds before training-set aggregation.

    Shape: two exact-median passes (percentile(0.5) per group, one
    shuffle each — the deviation pass reuses the first join) and a final
    count rollup. Exact group medians sort within each group partition;
    the group key here is low-cardinality, so at 100 TB prefer
    ``profile_numeric``'s approx_percentile sketch for the medians and
    reserve this exact form for oracle-checked gates — the operator's
    contract (interpolated exact median, both engines average the two
    middle doubles) is what makes it hash-verifiable.
    """
    med = events.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med")
    )
    dev = events.join(F.broadcast(med), group_col).withColumn(
        "adev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = dev.groupBy(group_col).agg(
        F.expr("percentile(adev, 0.5)").alias("mad"),
        F.first("med").alias("med"),
    )
    return (
        dev.drop("med")
        .join(F.broadcast(mad), group_col)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("adev") > F.lit(n_mads) * F.col("mad"), 1).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
            # KEPT rounded (r10 sweep): exact-percentile interpolation
            # is (a+b)/2 in Spark vs a+(b-a)*frac in DuckDB — same
            # value mathematically but potentially one ulp apart, so
            # the ROUND is load-bearing here (it masks the ulp, and
            # med/mad are sqrt-free but interpolated doubles, not
            # int/int rationals — divergence needs a <=5-digit
            # shortest repr on an interpolated midpoint, measure ~0)
            (F.round(F.first("med"), 4) + F.lit(0.0)).alias("med_r4"),
            (F.round(F.first("mad"), 4) + F.lit(0.0)).alias("mad_r4"),
        )
    )



def trend_slope(
    events: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
) -> DataFrame:
    """Per-group least-squares trend of the daily aggregate — the
    monitoring question "is this metric drifting?" answered with the
    closed-form OLS slope over (day index, daily micro-unit sum):
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2).

    Every S is an EXACT integer aggregate: day indices are rebased per
    group (a window min over the bounded per-group day axis) so x stays
    small, y is the micro-unit daily sum. Numerator and denominator are
    emitted as integers beside the raw-quotient slope, so the hashed
    surface is exact integers plus one deterministic IEEE division. One (group, day)
    aggregate shuffle + one tiny per-group rollup. Int64 headroom:
    |Sxy| <= days^2 * max daily |sum| in micro-units — drop to
    milli-units beyond ~1e12 micro-units/day.
    """
    from pyspark.sql.window import Window

    from ..session import epoch_millis

    day = (epoch_millis(F.col("ts")) / F.lit(86400000)).cast("long")
    daily = events.groupBy(group_col, day.alias("day")).agg(
        F.sum(F.round(F.col(value_col) * 1e6).cast("long")).alias("y")
    )
    rebased = daily.withColumn(
        "x", F.col("day") - F.min("day").over(Window.partitionBy(group_col))
    )
    agg = rebased.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")
    return agg.select(
        group_col,
        "n_days",
        num.alias("slope_num"),
        den.alias("slope_den"),
        # raw IEEE quotient of the exact integer surfaces emitted
        # beside it (r10 tie-class retirement); den >= 0 by
        # Cauchy-Schwarz, so a zero numerator cannot yield -0.0
        F.when(den == 0, F.lit(0.0))
        .otherwise(num.cast("double") / den.cast("double"))
        .alias("slope_micro_per_day"),
    )


def categorical_profile(df: DataFrame, columns: list[str]) -> DataFrame:
    """Per-column categorical profile: distinct count, Shannon entropy
    (micro-unit fixed point), and the modal value's share in integer
    milli — the "is this column degenerate / an id / skewed?" triage
    that drives join-strategy and partitioning decisions.

    One count aggregate per column (map-side combined), rollups from the
    count table (never a second scan), entropy terms -p*ln(p) rounded to
    integer micro-units per value and summed exactly (the `_det_avg`
    convention — a float entropy sum is partial-aggregation-order
    dependent). Column results union into one frame.
    """
    outs = []
    for c in columns:
        counts = df.groupBy(
            F.col(c).cast("string").alias("val")
        ).agg(F.count(F.lit(1)).alias("n"))
        tot = counts.agg(
            F.sum("n").alias("tot"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("n").alias("top_n"),
        )
        term = (F.col("n") / F.col("tot")) * F.log(
            F.col("tot") / F.col("n")
        )
        outs.append(
            counts.crossJoin(F.broadcast(tot)).agg(
                F.lit(c).alias("column_name"),
                F.first("n_distinct").alias("n_distinct"),
                F.sum(F.round(term * F.lit(1e6)).cast("long")).alias(
                    "entropy_micro"
                ),
                F.first(F.expr("(1000 * top_n) div tot")).alias(
                    "top_fraction_milli"
                ),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def value_histogram(
    df: DataFrame,
    col: str = "value",
    group: str = "event_type",
    bin_width: float = 50.0,
    n_bins: int = 10,
) -> DataFrame:
    """Equi-width histogram per group — the profiling primitive behind
    distribution dashboards and drift monitors (reference parity: the
    schema builder surfaces column METADATA; this is the data-plane
    profile a warehouse team derives next). One map-side bin expression
    + one count aggregate: a single shuffle on (group, bin), map-side
    combined, so the output is bounded by groups x bins regardless of
    corpus size. The top bin is open-ended (``least`` clamp) so
    outliers can't mint unbounded group keys.

    Bin edges are exact doubles (bin * width with width a small
    integer-valued double), so the surface replays engine-exactly —
    no rounding needed.
    """
    b = F.least(
        F.floor(F.col(col) / F.lit(bin_width)).cast("int"),
        F.lit(n_bins - 1),
    )
    return (
        df.groupBy(F.col(group).alias("group_key"), b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "group_key",
            "bin",
            (F.col("bin") * F.lit(bin_width)).alias("bin_lo"),
            ((F.col("bin") + 1) * F.lit(bin_width)).alias("bin_hi"),
            "n",
        )
    )


def sigma_outliers(
    df: DataFrame,
    col: str = "value",
    by: str = "user_id",
    k: int = 3,
    id_col: str = "event_id",
) -> DataFrame:
    """Per-group k-sigma anomaly gate with EXACT integer arithmetic —
    no float mean/variance ever materializes, so the flag is identical
    across partitionings and engines: z^2 > k^2 rewritten as
    (n*v - s)^2 > k^2 * (n*ssq - s^2) over milli-unit integers
    (population variance, cross-multiplied by n^2). The standard
    data-quality tripwire before ingestion: flag rows whose value sits
    k sigmas from ITS OWN group's mean, not a global threshold.

    One aggregate over the group key + one join back (the aggregate
    side is group-bounded, AQE broadcasts it). int64 headroom (stated
    in MILLI units, with the k^2 and squared-lhs factors): the rhs is
    k^2 * (n*ssq - s^2) <= k^2 * n^2 * max|v_milli|^2 and the lhs is
    squared, (n*vm - s)^2 <= 4 * n^2 * max|v_milli|^2, so with k=3
    both stay below 2^63 while n_per_group * max|v_milli| < ~1e9 —
    i.e. about 2,000 rows/group for values up to 500 (v_milli = 5e5).
    Choose a coarser unit for hotter groups; the docstring ceiling
    convention from pagerank.
    """
    v = F.round(F.col(col) * 1000).cast("bigint")
    rows = df.select(
        F.col(id_col).alias("row_id"), F.col(by).alias("grp"), v.alias("vm")
    )
    agg = rows.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vm").alias("s"),
        F.sum(F.col("vm") * F.col("vm")).alias("ssq"),
    )
    lhs = (F.col("n") * F.col("vm") - F.col("s"))
    rhs = F.lit(k * k) * (
        F.col("n") * F.col("ssq") - F.col("s") * F.col("s")
    )
    return rows.join(agg, "grp").select(
        F.col("row_id").alias(id_col),
        F.col("grp").alias(by),
        F.col("vm").alias("v_milli"),
        ((F.col("n") >= 2) & (lhs * lhs > rhs)).cast("int").alias(
            "is_outlier"
        ),
    )
