"""The engine's UDF surface (SURVEY.md B15 / reference A23).

The reference's only user-extension point is the manual-SQL escape hatch
(reference relation.py:156-204); the Spark engine's equivalent is the
Arrow-batched pandas UDF family. These are the *slow path* by policy —
everything in operators/ stays on built-in functions — but when Python is
unavoidable (custom scoring models, tokenizers), this is the shape:
vectorized over Arrow batches, never row-at-a-time.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


@F.pandas_udf(DoubleType())
def vowel_ratio(text: pd.Series) -> pd.Series:
    """Example scalar pandas UDF: vowels / chars, vectorized with pandas
    string ops over each Arrow batch."""
    total = text.str.len().clip(lower=1)
    vowels = text.str.count(r"[aeiouAEIOU]")
    return (vowels / total).astype("float64")


def text_metrics_pandas(documents: DataFrame) -> DataFrame:
    """Scalar pandas-UDF path: per-document custom metric plus built-in
    columns, to pin the mixed JVM/Arrow projection shape."""
    return documents.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        # raw IEEE quotient (r10 tie-class retirement): the UDF divides
        # two exact ints in float64 — identical to any engine's
        # CAST(int AS DOUBLE)/int; ROUND re-opened the decimal-half class
        vowel_ratio(F.col("text")).alias("vowel_ratio"),
    )


GROUP_STATS_SCHEMA = StructType(
    [
        StructField("lang", StringType(), False),
        StructField("n_docs", LongType(), False),
        StructField("mean_chars", DoubleType(), False),
        StructField("p90_chars", DoubleType(), False),
    ]
)


def lang_stats_apply_in_pandas(documents: DataFrame) -> DataFrame:
    """Grouped-map (applyInPandas) path: per-language stats where the
    aggregate (an exact percentile) genuinely isn't a built-in shuffle-free
    expression. Each language group arrives as one pandas DataFrame."""

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "n_docs": [len(pdf)],
                # raw IEEE quotient (r10): pandas mean of ints is the
                # exact float64 sum / n — Python round() here was
                # BANKER'S at ties, diverging from every SQL engine
                "mean_chars": [float(pdf["n_chars"].mean())],
                # p90 stays rounded: linear-interpolated quantiles can
                # differ from quantile_cont by an ulp (lerp forms), so
                # the round is load-bearing; a 4-decimal-half tie on an
                # interpolated double is measure ~0 (not int/int class)
                "p90_chars": [
                    round(float(pdf["n_chars"].quantile(0.9, interpolation="linear")), 4)
                ],
            }
        )

    return documents.groupBy("lang").applyInPandas(stats, GROUP_STATS_SCHEMA)
