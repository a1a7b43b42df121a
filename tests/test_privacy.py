"""r11 tests-only operators: k-anonymity release gates
(operators/privacy.py) and Unicode NFC normalization
(operators/udf.normalize_text). No driver keys — the 50-slot window is
structurally full (CLAUDE.md r11 lesson) — so these carry their value
oracles HERE: fixed-shape pins plus hypothesis random-frame
differentials against DuckDB, the same machinery the driver keys use.

Every non-ASCII codepoint in TEST DATA is a \\uXXXX escape: literal
composed/decomposed text in a source file can be silently
re-normalized by tooling — which would rewrite exactly the
distinctions these tests pin.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from dbt_schema_builder_spark.operators import privacy, udf

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"

# composition atoms, escape-only
CAFE_NFC = "caf\u00e9"
CAFE_NFD = "cafe\u0301"
ENYE_NFC = "\u00f1"
ENYE_NFD = "n\u0303"
FI_LIGATURE = "\ufb01le"
HANGUL_NFC = "\uac00"
HANGUL_JAMO = "\u1100\u1161"


# ---------------------------------------------------------------------------
# k-anonymity


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, src, len(t) if t is not None else 0)
         for i, (lang, src, t) in enumerate(rows)],
        DOC_SCHEMA,
    )


def _duck(rows):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": list(range(len(rows))),
                "text": [t for _, _, t in rows],
                "lang": [lang for lang, _, _ in rows],
                "source": [s for _, s, _ in rows],
                "n_chars": [len(t) if t is not None else 0 for _, _, t in rows],
            }
        ),
    )
    return con


def test_k_anonymize_fixed_shape(spark):
    rows = (
        [("en", "web", f"doc {i}") for i in range(5)]       # big group
        + [("fr", "web", "petit")]                            # singleton
        + [("de", "b", "zwei"), ("de", "b", "noch")]          # pair
        + [(None, "web", "null lang"), (None, "web", "x")]    # NULL group
    )
    docs = _docs(spark, rows)
    kept = privacy.k_anonymize(docs, ["lang", "source"], k=2)
    got = {r.doc_id for r in kept.collect()}
    # singleton fr group suppressed; NULL lang group (2 rows) KEPT —
    # SQL grouping treats NULL as a key on both engines
    assert got == {0, 1, 2, 3, 4, 6, 7, 8, 9}
    # input columns unchanged, helper column dropped
    assert kept.columns == docs.columns

    rep = {
        tuple(r)
        for r in privacy.k_anonymity_report(
            docs, ["lang", "source"], k=2
        ).collect()
    }
    assert ("fr", "web", 1, 1) in rep
    assert ("en", "web", 5, 0) in rep
    assert (None, "web", 2, 0) in rep


def test_k_anonymize_preserves_user_qi_n_column(spark):
    """A user frame already carrying a `_qi_n` column must pass through
    unclobbered (r11 advice): the helper count uniquifies its name
    against the frame schema instead of overwriting-then-dropping the
    user's column."""
    rows = [
        (0, "en", "web", 111),
        (1, "en", "web", 222),
        (2, "fr", "web", 333),  # singleton: suppressed at k=2
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, lang string, source string, _qi_n bigint"
    )
    kept = privacy.k_anonymize(docs, ["lang", "source"], k=2)
    assert kept.columns == docs.columns
    got = {(r.doc_id, r._qi_n) for r in kept.collect()}
    assert got == {(0, 111), (1, 222)}
    # case-variant collision: Spark resolves withColumn/drop
    # case-insensitively by default, so '_QI_N' must also be protected
    cased = spark.createDataFrame(
        [(0, "en", "web", 7), (1, "en", "web", 8)],
        "doc_id bigint, lang string, source string, _QI_N bigint",
    )
    kept2 = privacy.k_anonymize(cased, ["lang", "source"], k=2)
    assert kept2.columns == cased.columns
    assert {(r.doc_id, r._QI_N) for r in kept2.collect()} == {(0, 7), (1, 8)}


def test_k_anonymity_validates_config(spark):
    docs = _docs(spark, [("en", "web", "x")])
    with pytest.raises(ValueError, match="at least one column"):
        privacy.k_anonymize(docs, [], k=2)
    with pytest.raises(ValueError, match="not in frame"):
        privacy.k_anonymity_report(docs, ["nope"], k=2)
    with pytest.raises(ValueError, match="k must be >= 1"):
        privacy.k_anonymize(docs, ["lang"], k=0)


def test_l_diversity_fixed_shape(spark):
    rows = (
        # (en, web): 3 rows, 3 distinct texts -> diverse at l=2
        [("en", "web", "one"), ("en", "web", "two"), ("en", "web", "three")]
        # (fr, web): 3 rows but ONE value -> k-anonymous yet NOT diverse
        + [("fr", "web", "same")] * 3
        # (de, b): all-NULL sensitive -> n_sensitive 0, at risk
        + [("de", "b", None), ("de", "b", None)]
    )
    rep = {
        (r.lang, r.source): r
        for r in privacy.l_diversity_report(
            _docs(spark, rows), ["lang", "source"], "text", l=2
        ).collect()
    }
    assert rep[("en", "web")].n_sensitive == 3
    assert rep[("en", "web")].at_risk == 0
    assert rep[("fr", "web")].n_rows == 3
    assert rep[("fr", "web")].n_sensitive == 1
    assert rep[("fr", "web")].at_risk == 1
    assert rep[("de", "b")].n_sensitive == 0
    assert rep[("de", "b")].at_risk == 1


def test_l_diversity_validates_config(spark):
    docs = _docs(spark, [("en", "web", "x")])
    with pytest.raises(ValueError, match="sensitive column 'nope' not in"):
        privacy.l_diversity_report(docs, ["lang"], "nope", l=2)
    with pytest.raises(ValueError, match="cannot be a quasi"):
        privacy.l_diversity_report(docs, ["lang", "text"], "text", l=2)
    with pytest.raises(ValueError, match="l must be >= 1"):
        privacy.l_diversity_report(docs, ["lang"], "text", l=0)


@settings(max_examples=12, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["en", "fr", None]),
            st.sampled_from(["s0", "s1"]),
            st.sampled_from(["alpha", "beta", "gamma", None]),
        ),
        min_size=1,
        max_size=12,
    ),
    l=st.integers(min_value=1, max_value=4),
)
def test_l_diversity_matches_duckdb_on_random_frames(spark, rows, l):
    """Random-frame differential: NULL QI groups, NULL sensitive values
    (ignored by the distinct count on both engines), all-NULL groups,
    l above every group's diversity."""
    got = {
        tuple(r)
        for r in privacy.l_diversity_report(
            _docs(spark, rows), ["lang", "source"], "text", l=l
        ).collect()
    }
    con = _duck(rows)
    want = {
        tuple(r)
        for r in con.execute(
            "SELECT lang, source, COUNT(*) AS n_rows, "
            "COUNT(DISTINCT text) AS n_sensitive, "
            f"CAST(COUNT(DISTINCT text) < {l} AS INT) AS at_risk "
            "FROM documents GROUP BY lang, source"
        ).fetchall()
    }
    assert got == want


def _entropy_oracle_sql(l: int) -> str:
    """DuckDB replay of the micro-nat entropy identity: n*H = n*L(n) -
    sum(n_i*L(n_i)) with L(x) = round(ln(x)*1e6) as BIGINT — the same
    fixed-point log convention zipf_stats/dsir use. '//' on BIGINTs
    truncates like Spark's `div` (non-negative operands here)."""
    return (
        "WITH pv AS (SELECT lang, source, text AS sv, COUNT(*) AS ni "
        "FROM documents GROUP BY lang, source, text), "
        "agg AS (SELECT lang, source, "
        "CAST(SUM(ni) AS BIGINT) AS n_rows, "
        "CAST(COALESCE(SUM(CASE WHEN sv IS NOT NULL THEN ni END), 0) "
        "AS BIGINT) AS ne, "
        "CAST(COUNT(CASE WHEN sv IS NOT NULL THEN 1 END) AS BIGINT) "
        "AS n_sensitive, "
        "CAST(COALESCE(SUM(CASE WHEN sv IS NOT NULL THEN ni * "
        "CAST(round(ln(CAST(ni AS DOUBLE)) * 1000000) AS BIGINT) END), 0) "
        "AS BIGINT) AS s "
        "FROM pv GROUP BY lang, source), "
        "e AS (SELECT lang, source, n_rows, n_sensitive, ne, "
        "CASE WHEN ne = 0 THEN 0 ELSE ne * "
        "CAST(round(ln(CAST(ne AS DOUBLE)) * 1000000) AS BIGINT) - s END "
        "AS ent_scaled, "
        f"ne * CAST(round(ln(CAST({l} AS DOUBLE)) * 1000000) AS BIGINT) "
        "AS thresh FROM agg) "
        "SELECT lang, source, n_rows, n_sensitive, "
        "CAST(CASE WHEN ne = 0 THEN 0 ELSE ent_scaled // ne END AS BIGINT) "
        "AS entropy_micronats, "
        "CAST(n_sensitive = 0 OR ent_scaled < thresh AS INT) AS at_risk "
        "FROM e"
    )


def test_entropy_l_diversity_fixed_shape(spark):
    import math

    rows = (
        # (en, web): a,a,b,c -> H = ln4 - (2*ln2)/4... = ~1.0397 nats
        [("en", "web", "a"), ("en", "web", "a"),
         ("en", "web", "b"), ("en", "web", "c")]
        # (fr, web): 9 of one value + 1 other -> passes DISTINCT l=2
        # but H ~ 0.325 < ln(2): the case entropy-l exists for
        + [("fr", "web", "same")] * 9 + [("fr", "web", "other")]
        # (de, b): single value -> entropy exactly 0
        + [("de", "b", "only")] * 3
        # (es, b): all-NULL sensitive -> entropy 0, at risk at any l
        + [("es", "b", None), ("es", "b", None)]
    )
    rep = {
        (r.lang, r.source): r
        for r in privacy.entropy_l_diversity_report(
            _docs(spark, rows), ["lang", "source"], "text", l=2
        ).collect()
    }
    en = rep[("en", "web")]
    # integer replay of the identity by hand
    L = lambda x: round(math.log(x) * 1e6)  # noqa: E731
    want_en = (4 * L(4) - 2 * L(2)) // 4
    assert (en.n_rows, en.n_sensitive, en.entropy_micronats, en.at_risk) == (
        4, 3, want_en, 0
    )
    fr = rep[("fr", "web")]
    assert fr.n_sensitive == 2  # distinct-l would PASS at l=2...
    assert fr.at_risk == 1      # ...entropy-l correctly flags it
    assert fr.entropy_micronats == (10 * L(10) - 9 * L(9)) // 10
    assert rep[("de", "b")].entropy_micronats == 0
    assert rep[("de", "b")].at_risk == 1
    assert rep[("es", "b")].n_sensitive == 0
    assert rep[("es", "b")].entropy_micronats == 0
    assert rep[("es", "b")].at_risk == 1
    # the distinct report disagrees on (fr, web) — the gate gap
    dist = {
        (r.lang, r.source): r.at_risk
        for r in privacy.l_diversity_report(
            _docs(spark, rows), ["lang", "source"], "text", l=2
        ).collect()
    }
    assert dist[("fr", "web")] == 0


def test_entropy_l_diversity_validates_config(spark):
    docs = _docs(spark, [("en", "web", "x")])
    with pytest.raises(ValueError, match="sensitive column 'nope' not in"):
        privacy.entropy_l_diversity_report(docs, ["lang"], "nope", l=2)
    with pytest.raises(ValueError, match="cannot be a quasi"):
        privacy.entropy_l_diversity_report(docs, ["lang", "text"], "text", l=2)
    with pytest.raises(ValueError, match="l must be >= 1"):
        privacy.entropy_l_diversity_report(docs, ["lang"], "text", l=0)
    # l=1 is trivially satisfied (H >= 0 = ln(1)) when any value exists
    one = privacy.entropy_l_diversity_report(
        _docs(spark, [("en", "web", "x")]), ["lang", "source"], "text", l=1
    ).collect()
    assert one[0].at_risk == 0


def test_reports_reject_emitted_name_collisions(spark):
    """A quasi/sensitive column named like an emitted (or internal)
    report column would survive the groupBy next to the aggregate alias
    and die in AMBIGUOUS_REFERENCE downstream — rejected loudly at plan
    construction, casefolded (r13 review fix)."""
    df = spark.createDataFrame(
        [(1, "en", "x", "s")],
        "N_ROWS bigint, lang string, text string, _sv string",
    )
    with pytest.raises(ValueError, match="collide"):
        privacy.k_anonymity_report(df, ["N_ROWS", "lang"], k=2)
    with pytest.raises(ValueError, match="collide"):
        privacy.l_diversity_report(df, ["N_ROWS"], "text", l=2)
    with pytest.raises(ValueError, match="collide"):
        privacy.entropy_l_diversity_report(df, ["lang"], "_sv", l=2)


@settings(max_examples=12, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["en", "fr", None]),
            st.sampled_from(["s0", "s1"]),
            st.sampled_from(["alpha", "beta", "gamma", None]),
        ),
        min_size=1,
        max_size=14,
    ),
    l=st.integers(min_value=1, max_value=4),
)
def test_entropy_l_diversity_matches_duckdb_on_random_frames(spark, rows, l):
    """Random-frame differential for the micro-nat entropy replay:
    NULL QI groups, NULL/mixed sensitive values, all-NULL groups,
    single-value groups (entropy exactly 0), l above every group's
    entropy."""
    got = {
        tuple(r)
        for r in privacy.entropy_l_diversity_report(
            _docs(spark, rows), ["lang", "source"], "text", l=l
        ).collect()
    }
    con = _duck(rows)
    want = {tuple(r) for r in con.execute(_entropy_oracle_sql(l)).fetchall()}
    assert got == want, got ^ want


kanon_rows = st.lists(
    st.tuples(
        st.sampled_from(["en", "fr", "de", None]),
        st.sampled_from(["s0", "s1"]),
        st.sampled_from(["alpha", "beta gamma", ""]),
    ),
    min_size=0,
    max_size=12,
)


@settings(max_examples=12, deadline=None)
@given(rows=kanon_rows, k=st.integers(min_value=1, max_value=4))
def test_k_anonymize_matches_duckdb_on_random_frames(spark, rows, k):
    """Random-frame differential: suppression and the risk report vs
    their ANSI replays — NULL QI groups, empty frames, k=1 (keep all),
    and k above every group size all arise here."""
    docs = _docs(spark, rows)
    con = _duck(rows)

    got = {
        tuple(r)
        for r in privacy.k_anonymize(docs, ["lang", "source"], k=k).collect()
    }
    want = {
        tuple(r)
        for r in con.execute(
            "SELECT doc_id, text, lang, source, n_chars FROM ("
            "SELECT *, COUNT(*) OVER (PARTITION BY lang, source) AS qn "
            f"FROM documents) WHERE qn >= {k}"
        ).fetchall()
    }
    assert got == want

    got_rep = {
        tuple(r)
        for r in privacy.k_anonymity_report(
            docs, ["lang", "source"], k=k
        ).collect()
    }
    want_rep = {
        tuple(r)
        for r in con.execute(
            "SELECT lang, source, COUNT(*) AS n_rows, "
            f"CAST(COUNT(*) < {k} AS INT) AS at_risk "
            "FROM documents GROUP BY lang, source"
        ).fetchall()
    }
    assert got_rep == want_rep


def test_k_anonymize_plan_has_one_exchange(spark):
    """Plan pin: the suppression filter is a WINDOW over the QI
    partition — exactly one exchange, no aggregate-plus-join-back
    second corpus scan."""
    docs = _docs(spark, [("en", "web", "x"), ("en", "web", "y")])
    plan = (
        privacy.k_anonymize(docs, ["lang", "source"], k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan


# ---------------------------------------------------------------------------
# Unicode normalization


def test_normalize_text_fixed_shapes(spark):
    rows = [
        (0, "plain ascii"),
        (1, CAFE_NFC),                      # precomposed: unchanged
        (2, CAFE_NFD),                      # decomposed -> composes
        (3, ENYE_NFD + " and more"),        # combining tilde
        (4, HANGUL_JAMO),                   # jamo -> syllable under NFC
        (5, FI_LIGATURE),                   # ligature fi: NFC keeps it
        (6, "ctl\x01\x1f\x7fchars"),        # C0/DEL stripped
        (7, "keep\ttabs\nand\rbreaks"),     # tab/newline/CR survive
        (8, None),                          # NULL propagates
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in udf.normalize_text(df).collect()}
    assert got[0].norm_text == "plain ascii" and got[0].changed == 0
    assert got[1].norm_text == CAFE_NFC and got[1].changed == 0
    assert got[2].norm_text == CAFE_NFC and got[2].changed == 1
    assert got[2].n_chars_norm == 4
    assert got[2].n_stripped == 0  # renormalized, nothing stripped
    assert got[3].norm_text == ENYE_NFC + " and more" and got[3].changed == 1
    assert got[4].norm_text == HANGUL_NFC and got[4].changed == 1
    assert got[5].norm_text == FI_LIGATURE and got[5].changed == 0
    assert got[6].norm_text == "ctlchars" and got[6].changed == 1
    assert got[6].n_stripped == 3  # strip-only change, 3 controls removed
    assert got[7].changed == 0 and got[7].n_stripped == 0
    assert got[8].norm_text is None and got[8].changed == 0
    assert got[8].n_chars_norm is None and got[8].n_stripped is None


def test_normalize_text_validates_form(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="form must be one of"):
        udf.normalize_text(df, form="NFX")


def test_normalize_text_udf_evaluated_once(spark):
    """The changed/length columns must read the MATERIALIZED UDF output:
    exactly one ArrowEvalPython node in the plan."""
    df = spark.createDataFrame([(0, "x")], "doc_id bigint, text string")
    plan = (
        udf.normalize_text(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ArrowEvalPython") == 1, plan


# ---------------------------------------------------------------------------
# Mojibake repair (r13). No DuckDB replay exists for byte-level
# re-decode (categorized exemption, the IDN-fold class): the
# differential generates mojibake of KNOWN depth (the generator is the
# ground truth) and compares the Arrow kernel against the direct
# Python reference — a wrong repair cannot hide.


def _moji(s: str) -> str:
    """One level of cp1252 misreading: UTF-8 bytes decoded as sloppy
    cp1252 (the five unmapped bytes fall back to their raw C1
    codepoint, matching browsers and the kernel's re-encode)."""
    out = []
    for byte in s.encode("utf-8"):
        try:
            out.append(bytes([byte]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(byte))
    return "".join(out)


def test_fix_mojibake_fixed_shapes(spark):
    deja = "d\u00e9j\u00e0 vu"
    amac = "\u0101"  # 'a' with macron: UTF-8 C4 81 — 0x81 is a cp1252 hole
    texts = [
        _moji(deja),          # classic single mojibake
        _moji(_moji("\u00e9")),  # double mojibake -> 2 passes
        "plain ascii",        # untouched
        "caf\u00e9",     # GENUINE latin text: utf-8 decode fails, kept
        _moji(amac),          # exercises the latin-1 hole fallback
        "\u65e5\u672c",  # genuine CJK: outside cp1252, kept
        "\U0001f600",         # astral emoji: kept
        None,                 # NULL propagates
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {r.doc_id: r for r in udf.fix_mojibake(df).collect()}
    assert (got[0].fixed_text, got[0].repair_passes) == (deja, 1)
    assert (got[1].fixed_text, got[1].repair_passes) == ("\u00e9", 2)
    assert got[1].changed == 1
    assert (got[2].fixed_text, got[2].repair_passes) == ("plain ascii", 0)
    assert got[2].changed == 0
    assert (got[3].fixed_text, got[3].repair_passes) == ("caf\u00e9", 0)
    assert (got[4].fixed_text, got[4].repair_passes) == (amac, 1)
    assert (got[5].fixed_text, got[5].repair_passes) == ("\u65e5\u672c", 0)
    assert got[6].repair_passes == 0
    assert got[7].fixed_text is None
    assert got[7].changed is None and got[7].repair_passes is None


def test_fix_mojibake_validates_config(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="column 'nope' not in frame"):
        udf.fix_mojibake(df, text_col="nope")
    clash = spark.createDataFrame(
        [(0, "x", 1)], "doc_id bigint, text string, Repair_Passes int"
    )
    with pytest.raises(ValueError, match="already has a 'repair_passes'"):
        udf.fix_mojibake(clash)


def test_fix_mojibake_passes_input_columns_through(spark):
    """Passthrough contract (r13 review fix): metadata columns ride
    along unchanged, so the repair composes with the rest of the
    pipeline without a join-back."""
    df = spark.createDataFrame(
        [(0, _moji("d\u00e9j\u00e0"), "en", "web")],
        "doc_id bigint, text string, lang string, source string",
    )
    out = udf.fix_mojibake(df)
    assert out.columns == [
        "doc_id", "text", "lang", "source",
        "fixed_text", "changed", "repair_passes",
    ]
    (r,) = out.collect()
    assert (r.lang, r.source, r.fixed_text, r.changed) == (
        "en", "web", "d\u00e9j\u00e0", 1
    )
    # the documented normalize_text composition actually runs
    renamed = out.drop("text").withColumnRenamed("fixed_text", "text")
    normed = udf.normalize_text(renamed).collect()
    assert normed[0].norm_text == "d\u00e9j\u00e0"


def test_fix_mojibake_udf_evaluated_once(spark):
    """The three output columns read the MATERIALIZED struct: exactly
    one ArrowEvalPython node."""
    df = spark.createDataFrame([(0, "x")], "doc_id bigint, text string")
    plan = (
        udf.fix_mojibake(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ArrowEvalPython") == 1, plan


_MOJI_BASE = st.sampled_from(
    ["d\u00e9j\u00e0", "\u0101", "\u00e9", "ascii only", "",
     "\u0153uvre", "\u65e5\u672c", "mixed \u00fc end"]
)


@settings(max_examples=15, deadline=None)
@given(
    pairs=st.lists(
        st.one_of(
            st.none(),
            st.tuples(_MOJI_BASE, st.integers(min_value=0, max_value=2)),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_fix_mojibake_matches_python_reference(spark, pairs):
    """Known-depth differential: text mojibake'd 0-2 times must repair
    through the Arrow kernel exactly as through the direct Python
    reference (and, for encodable bases, back to the base itself)."""
    texts = []
    for p in pairs:
        if p is None:
            texts.append(None)
            continue
        base, depth = p
        t = base
        for _ in range(depth):
            t = _moji(t)
        texts.append(t)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {
        r.doc_id: (r.fixed_text, r.repair_passes)
        for r in udf.fix_mojibake(df).collect()
    }
    from dbt_schema_builder_spark.operators.udf import _repair_mojibake

    want = {i: _repair_mojibake(t) for i, t in enumerate(texts)}
    assert got == want


# Codepoint pool where Python's unicodedata and DuckDB's utf8proc are
# long-stable-identical under NFC: ASCII, Latin-1 precomposed, their
# decomposed twins, a ligature NFC keeps, Hangul jamo that compose, and
# strip-class controls.
_ATOMS = st.sampled_from(
    [
        "word", "x", "",
        CAFE_NFC, CAFE_NFD,
        ENYE_NFC, ENYE_NFD,
        FI_LIGATURE,
        HANGUL_NFC, HANGUL_JAMO,
        "\x01", "\x1f", "\x7f",
        "\t", " ",
    ]
)
nfc_texts = st.lists(_ATOMS, min_size=0, max_size=8).map("".join)


@settings(max_examples=15, deadline=None)
@given(texts=st.lists(st.one_of(nfc_texts, st.none()), min_size=1, max_size=8))
def test_normalize_text_matches_duckdb_on_random_strings(spark, texts):
    """Random-string differential vs DuckDB's nfc_normalize + the same
    explicit control-class strip: concatenated combining marks,
    mark-after-mark, controls adjacent to composition sites, NULLs."""
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {tuple(r) for r in udf.normalize_text(df).collect()}
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": [r[0] for r in rows],
                      "text": [r[1] for r in rows]}),
    )
    want = {
        tuple(r)
        for r in con.execute(
            "WITH n AS (SELECT doc_id, text, nfc_normalize(text) AS nf, "
            "regexp_replace(nfc_normalize(text), "
            "'[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g') "
            "AS norm_text FROM documents) "
            "SELECT doc_id, norm_text, "
            "CAST(norm_text IS DISTINCT FROM text AS INT) AS changed, "
            "CAST(length(norm_text) AS BIGINT) AS n_chars_norm, "
            "CAST(length(nf) - length(norm_text) AS BIGINT) AS n_stripped "
            "FROM n"
        ).fetchall()
    }
    assert got == want, got ^ want
