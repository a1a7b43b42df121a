"""r12 tests-only operator: within-document repeated-line removal
(text.dedup_lines). No driver key — the 50-slot window is structurally
full (CLAUDE.md r11 lesson: new functionality defaults to tests-only
rows) — so the operator carries its value oracle HERE: fixed-shape pins
plus a hypothesis random-corpus differential against DuckDB's
list_filter/list_position replay, the same machinery the driver keys
use, plus the map-only plan pin.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from dbt_schema_builder_spark.operators import text

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"

# The oracle replays keep-first-occurrence with DuckDB list lambdas:
# list_position is the 1-based FIRST index, so an element survives iff
# its own (1-based) position equals it — identical to the Spark
# array_position filter.
ORACLE = (
    "WITH s AS (SELECT doc_id, string_split(text, chr(10)) AS l "
    "FROM documents) "
    "SELECT doc_id, "
    "array_to_string(list_filter(l, (x, i) -> list_position(l, x) = i), "
    "chr(10)) AS clean_text, "
    "CAST(len(l) AS BIGINT) AS n_lines, "
    "CAST(len(l) - len(list_filter(l, (x, i) -> list_position(l, x) = i)) "
    "AS BIGINT) AS n_dupe_lines FROM s"
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [
            (i, t, "en", "web", len(t) if t is not None else 0)
            for i, t in enumerate(texts)
        ],
        DOC_SCHEMA,
    )


@pytest.mark.parametrize("strategy", ["inline", "exploded"])
def test_dedup_lines_fixed_shapes(spark, strategy):
    texts = [
        "nav\nbody one\nnav\nbody two\nnav",  # boilerplate collapses
        "a\nb\nc",                              # all unique: unchanged
        "same\nsame\nsame",                     # collapses to one line
        "x",                                    # single line
        "",                                     # empty text = one empty line
        "a\n\nb\n\na",                          # empty INTERIOR lines dedup too
        None,                                   # NULL propagates
    ]
    got = {
        r.doc_id: r
        for r in text.dedup_lines(_docs(spark, texts), strategy=strategy).collect()
    }
    assert got[0].clean_text == "nav\nbody one\nbody two"
    assert got[0].n_lines == 5 and got[0].n_dupe_lines == 2
    assert got[1].clean_text == "a\nb\nc" and got[1].n_dupe_lines == 0
    assert got[2].clean_text == "same"
    assert got[2].n_lines == 3 and got[2].n_dupe_lines == 2
    assert got[3].clean_text == "x" and got[3].n_lines == 1
    assert got[4].clean_text == "" and got[4].n_lines == 1
    assert got[4].n_dupe_lines == 0
    assert got[5].clean_text == "a\n\nb"  # first empty line kept in place
    assert got[5].n_dupe_lines == 2
    assert got[6].clean_text is None
    assert got[6].n_lines is None and got[6].n_dupe_lines is None


def test_dedup_lines_plan_is_map_only(spark):
    """Plan pin: zero data-dependent shuffle — exactly the one
    round-robin repartition for parallelism (the single-file-scan rule),
    TWO Generates (the explode-let barriers: split() pinned to one
    evaluation, and the O(L^2) filter output materialized before its
    two consumers — HOFs are CodegenFallback, excluded from codegen
    subexpression elimination), no Join, no Sort. The filter HOF must
    appear exactly once in the plan."""
    plan = (
        text.dedup_lines(_docs(spark, ["a\nb"]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan
    assert plan.count("Generate") == 2, plan
    assert plan.count("array_position") == 1, plan


def test_dedup_lines_validates_strategy(spark):
    with pytest.raises(ValueError, match="unknown strategy"):
        text.dedup_lines(_docs(spark, ["a"]), strategy="nope")


def test_dedup_lines_duplicate_doc_ids_stay_per_row(spark):
    """Duplicate doc_ids are LEGAL input (wet_text_corpus emits
    content-addressed ids, so identical extractions share one) and the
    operator is per-ROW: both strategies must emit one output row per
    input row, never merge duplicate-key rows (r13 review find: the
    exploded strategy's doc_id groupBy produced one garbage row with
    duplicated lines and NEGATIVE n_dupe_lines)."""
    df = spark.createDataFrame(
        [(7, "a\nb\na"), (7, "a\nb\na"), (7, "x")],
        "doc_id bigint, text string",
    )
    for strategy in ("inline", "exploded"):
        rows = sorted(
            (r.clean_text, r.n_lines, r.n_dupe_lines)
            for r in text.dedup_lines(df, strategy=strategy).collect()
        )
        assert rows == [("a\nb", 3, 1), ("a\nb", 3, 1), ("x", 1, 0)], (
            strategy,
            rows,
        )


def test_dedup_lines_exploded_plan_shape(spark):
    """Plan pin for the O(L log L) strategy: the round-robin
    repartition plus exactly TWO data-dependent exchanges (the
    (doc_id, line) window and the groupBy re-assembly — AQE may elide
    one by reusing the partitioning, so pin a 2..3 band), no Join, and
    NO quadratic array_position kernel anywhere."""
    plan = (
        text.dedup_lines(_docs(spark, ["a\nb"]), strategy="exploded")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert 2 <= plan.count("Exchange") <= 3, plan
    assert "Join" not in plan, plan
    assert "array_position" not in plan, plan


# Line atoms chosen to force collisions (few distinct values), include
# the empty line, and exercise multi-char lines; docs join 0-8 of them
# with '\n' (0 atoms -> empty text).
_LINES = st.sampled_from(["alpha", "beta x", "", "a", "alpha", "  "])
line_texts = st.lists(_LINES, min_size=0, max_size=8).map("\n".join)


@settings(max_examples=15, deadline=None)
@given(texts=st.lists(st.one_of(line_texts, st.none()), min_size=1, max_size=8))
def test_dedup_lines_matches_duckdb_on_random_corpora(spark, texts):
    """Random-corpus differential, BOTH strategies against the same
    replay (the exactness contract: strategy is a regime choice, never
    a semantics choice): repeated/empty/whitespace lines in arbitrary
    positions, single-line docs, empty docs, NULLs."""
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(texts)), "text": pd.array(texts, dtype=object)}
        ),
    )
    want = {tuple(r) for r in con.execute(ORACLE).fetchall()}
    for strategy in ("inline", "exploded"):
        got = {
            tuple(r)
            for r in text.dedup_lines(
                _docs(spark, texts), strategy=strategy
            ).collect()
        }
        assert got == want, (strategy, got ^ want)
