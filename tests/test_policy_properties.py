"""Property-based tests (hypothesis) for the policy layer: invariants that
must hold for *any* config, not just the fixtures — the upgrade over the
reference's example-based tests (SURVEY.md section 5)."""

from hypothesis import given, settings, strategies as st

from dbt_schema_builder_spark.config import (
    AppPolicy,
    InvalidConfigurationException,
    SourcePolicy,
)
from dbt_schema_builder_spark.policy.identifiers import (
    RESERVED_WORDS,
    quote_identifier,
    relation_alias,
)

names = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,15}", fullmatch=True)


@given(name=names, prefix=st.one_of(st.none(), names))
def test_relation_alias_never_reserved(name, prefix):
    """The aliased relation name never collides with a reserved word."""
    alias = relation_alias(name, prefix)
    assert alias.upper() not in RESERVED_WORDS or prefix
    # idempotence on non-colliding names
    if not prefix and name.upper() not in RESERVED_WORDS:
        assert alias == name


@given(name=names)
def test_quoted_identifier_roundtrip(name):
    q = quote_identifier(name)
    if q != name:
        assert q.startswith("`") and q.endswith("`")
    else:
        assert name.upper() not in RESERVED_WORDS


@given(
    include=st.lists(names, max_size=5),
    tables=st.lists(names, min_size=1, max_size=10),
)
def test_include_filter_is_subset(include, tables):
    p = SourcePolicy(name="S", include=include)
    selected = [t for t in tables if p.selects(t)]
    if include:
        assert {t.lower() for t in selected} <= {i.lower() for i in include}
    else:
        assert selected == tables


@given(
    exclude=st.lists(names, max_size=5),
    tables=st.lists(names, min_size=1, max_size=10),
)
def test_exclude_filter_is_disjoint(exclude, tables):
    p = SourcePolicy(name="S", exclude=exclude)
    selected = {t.lower() for t in tables if p.selects(t)}
    assert selected.isdisjoint({e.lower() for e in exclude})


@given(include=st.lists(names, min_size=1), exclude=st.lists(names, min_size=1))
def test_include_exclude_always_rejected(include, exclude):
    try:
        SourcePolicy(name="S", include=include, exclude=exclude)
        raised = False
    except InvalidConfigurationException:
        raised = True
    assert raised


@settings(max_examples=25, deadline=None)
@given(
    redacted=st.dictionaries(
        st.sampled_from(["c_name", "c_acctbal", "c_mktsegment"]),
        st.one_of(st.integers(-1000, 1000), st.text(max_size=10)),
        max_size=3,
    )
)
def test_redaction_schema_parity_and_no_leak(spark, tables, redacted):
    """For any redaction map: SAFE keeps schema identical to PII and the
    redacted columns expose exactly one constant value."""
    from dbt_schema_builder_spark.policy.redaction import (
        pii_projection,
        safe_projection,
    )

    df = tables["customer"]
    try:
        safe = safe_projection(df, redacted)
    except InvalidConfigurationException:
        # incompatible literal/type combos must fail at plan construction
        # (never as a runtime executor error) — that is the invariant
        assert any(
            k == "c_acctbal" and isinstance(v, str) for k, v in redacted.items()
        )
        return
    pii = pii_projection(df)
    assert safe.columns == pii.columns  # reference README.rst:22-24
    assert [f.dataType for f in safe.schema.fields] == [
        f.dataType for f in pii.schema.fields
    ]
    for col in redacted:
        distinct = safe.select(col).distinct().count()
        assert distinct == 1, f"{col} leaked {distinct} values"


@given(pattern=st.sampled_from(["MAIN.PART.*", "MAIN.SUPPLIER", "MAIN..*"]))
def test_unmanaged_match_is_anchored(pattern):
    p = AppPolicy(app="MAIN", unmanaged_tables=[pattern])
    # a table name extending past the pattern must not match unless the
    # regex covers it
    if pattern == "MAIN.SUPPLIER":
        assert p.is_unmanaged("supplier")
        assert not p.is_unmanaged("supplier_x")
