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


# ---------------------------------------------------------------------------
# Unicode normalization (r11, tests-only — the window is full). Every
# web-corpus pipeline runs an NFC pass before dedup/tokenization: the
# same visible text arrives both precomposed (U+00E9) and decomposed
# (e + U+0301), so fingerprints, shingles, and vocab entries silently
# fork without it. Spark has no normalization built-in, so this is a
# genuine member of the UDF surface: one Arrow-batched scalar UDF, and
# every derived column reads the MATERIALIZED result (two-step select —
# the UDF must not be inlined per consumer).

# C0 controls except \t \n \r, plus DEL — the hygiene strip every
# pipeline applies; the class is explicit byte ranges so the Java and
# RE2 regex engines read the identical set.
CONTROL_CLASS = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

_NF_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def _normalize_udf(form: str):
    @F.pandas_udf(StringType())
    def norm(text: pd.Series) -> pd.Series:
        import unicodedata

        return text.map(
            lambda t: t if t is None else unicodedata.normalize(form, t)
        )

    return norm


# ---------------------------------------------------------------------------
# Mojibake repair (r13, tests-only — the window is full). The other
# standard encoding-hygiene pass (ftfy's core fix): UTF-8 bytes misread
# as cp1252/latin-1 produce 'Ã©' for 'é', and web corpora carry this
# class at measurable rates — fingerprints, shingles, and vocab entries
# fork on it exactly like un-normalized Unicode. Spark has no
# byte-level re-decode built-in (encode('cp1252') is lossy '?'
# substitution for unmappable chars), so this is a genuine UDF-surface
# member: one Arrow-batched struct-returning kernel, derived columns
# read the MATERIALIZED struct (plan-pinned single ArrowEvalPython).

# cp1252 leaves five bytes unmapped (0x81 0x8D 0x8F 0x90 0x9D); real
# mojibake renders them as the raw C1 codepoint (the browser/latin-1
# fallback), so the re-encode maps those codepoints back byte-for-byte
# — the "sloppy cp1252" convention ftfy standardized.


def _mojibake_encode(s: str) -> bytes | None:
    """Re-encode a suspected-mojibake string to the bytes a cp1252
    misread would have come from; None when any char is outside
    cp1252 + latin-1 (genuine Unicode — not mojibake of anything)."""
    try:
        return s.encode("cp1252")
    except UnicodeEncodeError:
        out = bytearray()
        for ch in s:
            try:
                out += ch.encode("cp1252")
            except UnicodeEncodeError:
                o = ord(ch)
                if o < 0x100:
                    out.append(o)
                else:
                    return None
        return bytes(out)


def _repair_mojibake(s: str | None, max_passes: int = 3):
    """Fixpoint repair: re-encode and UTF-8-decode until the text stops
    changing (double-mojibake needs two passes; the bound prevents a
    pathological cycle). Pure-ASCII round-trips identically (0 passes);
    genuine latin text ('déjà') fails the UTF-8 decode and is left
    alone. The repair is the mechanical ftfy core WITHOUT the badness
    heuristics: a text that literally means 'Ã©' is repaired anyway —
    callers who must preserve such text gate on the emitted
    ``repair_passes`` surface."""
    if s is None:
        return None, None
    cur = s
    passes = 0
    for _ in range(max_passes):
        b = _mojibake_encode(cur)
        if b is None:
            break
        try:
            dec = b.decode("utf-8")
        except UnicodeDecodeError:
            break
        if dec == cur:
            break
        cur = dec
        passes += 1
    return cur, passes


_MOJIBAKE_SCHEMA = StructType(
    [
        StructField("fixed", StringType(), True),
        StructField("passes", LongType(), True),
    ]
)


@F.pandas_udf(_MOJIBAKE_SCHEMA)
def _mojibake_udf(text: pd.Series) -> pd.DataFrame:
    fixed, passes = zip(*(_repair_mojibake(t) for t in text)) if len(text) else ((), ())
    return pd.DataFrame({"fixed": list(fixed), "passes": list(passes)})


def fix_mojibake(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Repair cp1252/latin-1-misread UTF-8 ('Ã©' -> 'é'); emit the
    input columns unchanged plus (fixed_text, changed, repair_passes)
    — passthrough like ``canonicalize_urls``, so metadata (lang,
    source, url) rides along.

    - ``repair_passes`` counts fixpoint iterations (2 = the text was
      double-mojibake'd); 0 = untouched, NULL for NULL text.
    - ``changed`` = 1 iff any repair applied (passes > 0).
    - No DuckDB replay exists for byte-level re-decoding (the same
      categorized-exemption class as the IDN fold): the hypothesis
      differential in tests/test_privacy.py instead compares the Arrow
      kernel against the direct Python reference over generated
      mojibake of known depth — the generator is the ground truth, so
      a wrong repair cannot hide.

    Scale: one ArrowEvalPython over the scan, map-only, no shuffle —
    at 100 TB this is the same scan-bandwidth-bound shape as
    ``normalize_text``. The two compose with an explicit rename
    (normalize_text reads the ``text`` column):
    ``normalize_text(fix_mojibake(docs).drop("text")
    .withColumnRenamed("fixed_text", "text"))`` — repair BEFORE NFC,
    the repaired text may be denormalized."""
    if text_col not in documents.columns:
        raise ValueError(
            f"fix_mojibake: column {text_col!r} not in frame "
            f"(has {documents.columns})"
        )
    taken = {c.lower() for c in documents.columns}
    for out in ("fixed_text", "changed", "repair_passes", "_mj"):
        if out in taken:
            raise ValueError(
                f"fix_mojibake: frame already has a {out!r} column "
                "(case-insensitive) — rename it or drop it first"
            )
    staged = documents.select(
        "*", _mojibake_udf(F.col(text_col)).alias("_mj")
    )
    return staged.select(
        *documents.columns,
        F.col("_mj.fixed").alias("fixed_text"),
        F.when(F.col("_mj.passes").isNull(), F.lit(None).cast("int"))
        .otherwise((F.col("_mj.passes") > 0).cast("int"))
        .alias("changed"),
        F.col("_mj.passes").alias("repair_passes"),
    )


def normalize_text(
    documents: DataFrame, form: str = "NFC", strip_control: bool = True
) -> DataFrame:
    """Unicode-normalize the text column; emit
    (doc_id, norm_text, changed, n_chars_norm, n_stripped).

    - ``form="NFC"`` is the release default and the only form with a
      cross-engine oracle (DuckDB ``nfc_normalize`` — differential in
      tests/test_privacy.py over composition/ligature/jamo shapes);
      NFD/NFKC/NFKD are API-side.
    - ``strip_control`` removes C0 controls (except tab/newline/CR) and
      DEL AFTER normalization, JVM-side (``CONTROL_CLASS``).
    - ``changed`` means "output text differs from input text" for ANY
      reason — renormalization OR control stripping: a doc already in
      the target form whose only difference is a stripped control still
      flags ``changed=1`` with identical visible text. ``n_stripped``
      (codepoints removed by the control strip) distinguishes the two:
      ``changed=1 AND n_stripped=0`` is a genuine renormalization.
    - NULL text propagates (NULL norm_text / NULL lengths), and
      ``changed`` uses null-safe equality so an unchanged NULL row is 0.

    Scale: one ArrowEvalPython node over the scan — map-only, no
    shuffle; the changed/length columns read the materialized UDF
    output, never re-invoke it."""
    if form not in _NF_FORMS:
        raise ValueError(
            f"normalize_text: form must be one of {_NF_FORMS}, got {form!r}"
        )
    nf = _normalize_udf(form)(F.col("text"))
    staged = documents.select("doc_id", "text", nf.alias("_nf"))
    stripped = (
        F.regexp_replace(F.col("_nf"), CONTROL_CLASS, "")
        if strip_control
        else F.col("_nf")
    )
    staged = staged.select("doc_id", "text", "_nf", stripped.alias("_norm"))
    return staged.select(
        "doc_id",
        F.col("_norm").alias("norm_text"),
        (~F.col("_norm").eqNullSafe(F.col("text"))).cast("int").alias("changed"),
        F.length("_norm").cast("bigint").alias("n_chars_norm"),
        (F.length("_nf") - F.length("_norm")).cast("bigint").alias("n_stripped"),
    )
