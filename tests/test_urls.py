"""r12 tests-only operator family: URL canonicalization
(operators/urls.py). No driver keys — the 50-slot window is
structurally full — so the operators carry their value oracles HERE:
fixed-shape pins for every documented canonicalization step plus a
hypothesis random-URL differential against a DuckDB CTE chain replaying
the same ordered regex/array transforms, plus the map-only plan pin.
r13 additions mirrored into the oracle: unreserved percent-decode
(step 3), escape-hex uppercase (step 5), greedy-to-last-'@' userinfo
strip (step 6, the multi-@ ADVICE fix), and blocklist-side
normalization. The IDN fold is the one non-SQL step: its differential
compares the Arrow kernel against the direct Python codec instead
(categorized exemption — punycode is RFC 3492 bootstring, not a
string transform DuckDB can replay).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from dbt_schema_builder_spark.operators import urls

# The oracle replays the operator's ordered step chain as CTEs. '||'
# (not concat) preserves NULL propagation — DuckDB concat SKIPS NULLs
# while Spark's returns NULL. Every regexp_replace carries 'g' (the r2
# events lesson: DuckDB is first-match by default, Spark is replace-all).
# Tracking-param removal is scoped to the substring from the first '?'
# (strpos split), mirroring the operator — '&' is a legal PATH char.
# The percent passes replay the split-on-'%' indexed list_transform
# (DuckDB lambda index is 1-based where Spark's is 0-based); the hex
# parse is the ('0x' || hex)::INT idiom, reached only through a
# prior-WHEN regex validation (CASE branches evaluate lazily; a bare
# AND might not).
_PCT = "('0x' || upper(substr(x, 1, 2)))::INT"
ORACLE = (
    "WITH s0 AS (SELECT doc_id, url, trim(url) AS u FROM urls), "
    "s1 AS (SELECT doc_id, url, "
    "regexp_replace(u, '(?s)#.*', '', 'g') AS u FROM s0), "
    # step 3: decode %XX of unreserved chars (ALPHA/DIGIT/-._~)
    "s1b AS (SELECT doc_id, url, array_to_string(list_transform("
    "string_split(u, '%'), (x, i) -> CASE WHEN i = 1 THEN x "
    "WHEN NOT regexp_matches(x, '^[0-9A-Fa-f]{2}') THEN '%' || x "
    f"WHEN ({_PCT} BETWEEN 65 AND 90) OR ({_PCT} BETWEEN 97 AND 122) "
    f"OR ({_PCT} BETWEEN 48 AND 57) OR ({_PCT} IN (45, 46, 95, 126)) "
    f"THEN chr({_PCT}) || substr(x, 3) "
    "ELSE '%' || x END), '') AS u FROM s1), "
    "s2 AS (SELECT doc_id, url, u, "
    "regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0) AS h "
    "FROM s1b), "
    "s3 AS (SELECT doc_id, url, "
    "lower(h) || substr(u, length(h) + 1) AS u FROM s2), "
    # step 5: uppercase the hex of every remaining escape
    "s3a AS (SELECT doc_id, url, array_to_string(list_transform("
    "string_split(u, '%'), (x, i) -> CASE WHEN i = 1 THEN x "
    "WHEN regexp_matches(x, '^[0-9A-Fa-f]{2}') "
    "THEN '%' || upper(substr(x, 1, 2)) || substr(x, 3) "
    "ELSE '%' || x END), '') AS u FROM s3), "
    # step 6: userinfo greedy to the LAST '@' (multi-@ ADVICE fix)
    "s3b AS (SELECT doc_id, url, regexp_replace(u, "
    "'^([a-z][a-z0-9+.-]*://)[^/?#]*@', '\\1', 'g') AS u FROM s3a), "
    "s3c AS (SELECT doc_id, url, regexp_replace(u, "
    "'^([a-z][a-z0-9+.-]*://[^/?#]*?)\\.+([:/?#]|$)', '\\1\\2', 'g') "
    "AS u FROM s3b), "
    "s4 AS (SELECT doc_id, url, regexp_replace(regexp_replace(u, "
    "'^(http://[^/?#:]*):80([/?#]|$)', '\\1\\2', 'g'), "
    "'^(https://[^/?#:]*):443([/?#]|$)', '\\1\\2', 'g') AS u FROM s3c), "
    "s5p AS (SELECT doc_id, url, "
    "CASE WHEN strpos(u, '?') = 0 THEN u "
    "ELSE substr(u, 1, strpos(u, '?') - 1) END AS base, "
    "CASE WHEN strpos(u, '?') = 0 THEN '' "
    "ELSE substr(u, strpos(u, '?')) END AS q FROM s4), "
    "s5 AS (SELECT doc_id, url, base || regexp_replace(regexp_replace("
    "regexp_replace(q, "
    "'&(utm_[^=&#]*|fbclid|gclid)=[^&#]*', '', 'g'), "
    "'^\\?(utm_[^=&#]*|fbclid|gclid)=[^&#]*&', '?', 'g'), "
    "'^\\?(utm_[^=&#]*|fbclid|gclid)=[^&#]*$', '', 'g') AS u FROM s5p), "
    "s6 AS (SELECT doc_id, url, regexp_replace(u, "
    "'^([a-z][a-z0-9+.-]*://[^/?#]*)/$', '\\1', 'g') AS canon_url "
    "FROM s5) "
    "SELECT doc_id, url, canon_url, "
    "regexp_extract(canon_url, '^[a-z][a-z0-9+.-]*://([^/?#:]*)', 1) "
    "AS host FROM s6"
)

# the blocklist side normalizes exactly like _normalized_blocklist:
# casefold, trim, strip leading/trailing dots
BLOCK_NORM = (
    "SELECT regexp_replace(regexp_replace(lower(trim(domain)), "
    "'\\.+$', '', 'g'), '^\\.+', '', 'g') AS domain FROM blocked"
)


def _frame(spark, url_list):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(url_list)],
        "doc_id bigint, url string",
    )


def test_canonicalize_fixed_shapes(spark):
    cases = {
        # scheme+host lowercase, path case preserved
        "HTTP://Example.COM/A/b": ("http://example.com/A/b", "example.com"),
        # default port stripped, explicit port kept
        "http://a.com:80/x": ("http://a.com/x", "a.com"),
        "https://a.com:443": ("https://a.com", "a.com"),
        "http://a.com:8080/x": ("http://a.com:8080/x", "a.com"),
        # https keeps :80 (not its default)
        "https://a.com:80/x": ("https://a.com:80/x", "a.com"),
        # fragment stripped
        "http://a.com/p#frag#more": ("http://a.com/p", "a.com"),
        # tracking params with separator repair
        "http://a.com/p?utm_source=f&q=1": ("http://a.com/p?q=1", "a.com"),
        "http://a.com/p?q=1&utm_a=2": ("http://a.com/p?q=1", "a.com"),
        "http://a.com/p?utm_a=1&fbclid=2": ("http://a.com/p", "a.com"),
        # root slash stripped, deep trailing slash preserved
        "http://a.com/": ("http://a.com", "a.com"),
        "http://a.com/a/": ("http://a.com/a/", "a.com"),
        # whitespace trimmed; schemeless passes through (host '')
        "  http://a.com  ": ("http://a.com", "a.com"),
        "Example.com/x?utm_a=1": ("Example.com/x", ""),
        # userinfo stripped (the blocklist-evasion prefix), and the
        # port behind it still strips
        "http://u:p@A.com/x": ("http://a.com/x", "a.com"),
        "http://u@a.com:80/x": ("http://a.com/x", "a.com"),
        # multi-@ authority strips to the LAST '@' (WHATWG host
        # resolution — the r13 ADVICE evasion fix)
        "http://a@b@bad.io/x": ("http://bad.io/x", "bad.io"),
        "http://u:p@x@y@a.com:80/x": ("http://a.com/x", "a.com"),
        # trailing host dots stripped, incl. before a port
        "http://Bad.io./x": ("http://bad.io/x", "bad.io"),
        "http://a.com.:80/x": ("http://a.com/x", "a.com"),
        # '&utm_' in the PATH is data, not tracking (no '?' present)
        "http://a.com/x&utm_a=1": ("http://a.com/x&utm_a=1", "a.com"),
        # unreserved percent-escapes decode ('%61'='a','%42'='B',
        # '%7e'='~'), non-unreserved escapes uppercase ('%2f'->'%2F'),
        # invalid escapes pass through
        "http://a.com/%61%42%7e": ("http://a.com/aB~", "a.com"),
        "http://a.com/p%2fq": ("http://a.com/p%2Fq", "a.com"),
        "http://a.com/%zz": ("http://a.com/%zz", "a.com"),
        "http://a.com/x%": ("http://a.com/x%", "a.com"),
        # decode-created host dot gets the dot treatment; decoded
        # port digits get the port strip ('%38%30' = '80')
        "http://bad%2Eio/x": ("http://bad.io/x", "bad.io"),
        "http://bad%2eio%2E/x": ("http://bad.io/x", "bad.io"),
        "http://a.com:%38%30/x": ("http://a.com/x", "a.com"),
        # encoded 'utm_' ('%5F'='_') is recognized after decode
        "http://a.com/p?utm%5Fa=1&q=2": ("http://a.com/p?q=2", "a.com"),
        # '%40' is NOT decoded (not unreserved): no userinfo strip
        "http://u%40h.com/x": ("http://u%40h.com/x", "u%40h.com"),
        # host-case alias via escape: '%41' decodes before the
        # authority lowercase, so 'ex%41mple.com' == 'example.com'
        "http://ex%41mple.com/x": ("http://example.com/x", "example.com"),
        # everything at once
        " HTTPS://U@B.io.:443/P?utm_b=x&k=v#f ": (
            "https://b.io/P?k=v",
            "b.io",
        ),
    }
    got = {
        r.url: (r.canon_url, r.host)
        for r in urls.canonicalize_urls(_frame(spark, list(cases))).collect()
    }
    for raw, want in cases.items():
        assert got[raw] == want, (raw, got[raw], want)


def test_canonicalize_null_and_config(spark):
    out = urls.canonicalize_urls(_frame(spark, [None, "http://a.com"])).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[0].canon_url is None and by_id[0].host is None
    with pytest.raises(ValueError, match="column 'nope' not in frame"):
        urls.canonicalize_urls(_frame(spark, ["x"]), url_col="nope")
    clash = _frame(spark, ["x"]).withColumnRenamed("url", "host")
    with pytest.raises(ValueError, match="already has a 'host' column"):
        urls.canonicalize_urls(clash, url_col="doc_id")


def test_host_report_fixed_shape(spark):
    rows = [
        "HTTP://A.com/x?utm_a=1",
        "http://a.com/x",          # same canonical page
        "http://a.com/y",
        "https://b.io/",
    ]
    rep = {
        r.host: (r.n_urls, r.n_canon)
        for r in urls.host_report(_frame(spark, rows)).collect()
    }
    assert rep["a.com"] == (3, 2)
    assert rep["b.io"] == (1, 1)


def test_canonicalize_plan_is_map_only(spark):
    plan = (
        urls.canonicalize_urls(_frame(spark, ["http://a.com"]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Join" not in plan, plan


_SCHEMES = st.sampled_from(["http://", "HTTP://", "https://", "Https://", ""])
_USERINFO = st.sampled_from(["", "u@", "U:p@", "a@b@", "u:p@x@y@"])
_HOSTS = st.sampled_from(
    ["Example.com", "a.B.co", "x.io", "Bad.io.", "b%2Eco", "ex%41mple.com"]
)
_PORTS = st.sampled_from(["", ":80", ":443", ":8080", ":%38%30"])
_PATHS = st.sampled_from(
    ["", "/", "/a/B", "/a/", "/A%20b", "/x&utm_a=1", "/%61%42%7e",
     "/p%2fq", "/%zz", "/x%", "/%40x"]
)
_PARAMS = st.lists(
    st.sampled_from(
        ["utm_source=x", "utm_a=", "fbclid=9", "gclid=z", "a=1", "B=2",
         "q=h", "utm%5Fb=1", "k=%2f%2F"]
    ),
    min_size=0,
    max_size=4,
)
_FRAGS = st.sampled_from(["", "#f", "#a#b", "#"])
_WS = st.sampled_from(["", " ", "  "])


@st.composite
def _url(draw):
    query = "&".join(draw(_PARAMS))
    return (
        draw(_WS)
        + draw(_SCHEMES)
        + draw(_USERINFO)
        + draw(_HOSTS)
        + draw(_PORTS)
        + draw(_PATHS)
        + ("?" + query if query else "")
        + draw(_FRAGS)
        + draw(_WS)
    )


def test_blocklist_filter_fixed_shapes(spark):
    df = _frame(
        spark,
        [
            "http://a.b.Example.com/x",  # parent-domain hit -> dropped
            "http://example.com.evil.org/y",  # example.com is NOT a suffix
            "http://ok.org/z",
            None,                         # no host -> kept
            "schemeless",                 # host '' -> kept
            "https://BAD.io:443/q",       # exact host hit -> dropped
            "http://u:p@bad.io/e1",       # userinfo evasion -> dropped
            "http://Bad.io./e2",          # trailing-dot evasion -> dropped
            "http://x@y@bad.io/e3",       # multi-@ evasion -> dropped
            "http://bad%2Eio/e4",         # encoded-dot evasion -> dropped
        ],
    )
    # messy blocklist entries normalize before the join (r13 ADVICE
    # fix: 'Example.COM ' / '.bad.io.' previously never matched)
    bl = spark.createDataFrame(
        [(" Example.COM ",), (".bad.io.",)], "domain string"
    )
    kept = {r.doc_id for r in urls.blocklist_filter(df, bl).collect()}
    assert kept == {1, 2, 3, 4}


def test_blocklist_filter_validates_config(spark):
    df = _frame(spark, ["http://a.com"])
    with pytest.raises(ValueError, match="must have a 'domain' column"):
        urls.blocklist_filter(
            df, spark.createDataFrame([("x",)], "d string")
        )
    bl = spark.createDataFrame([("a.com",)], "domain string")
    with pytest.raises(ValueError, match="key column 'nope' not in"):
        urls.blocklist_filter(df, bl, key_col="nope")
    # NULL keys are rejected loudly: a NULL key can never match the
    # anti-join, so a blocked row would silently pass a compliance gate
    null_key = spark.createDataFrame(
        [(None, "http://a.com/x")], "doc_id bigint, url string"
    )
    with pytest.raises(ValueError, match="contains NULLs"):
        urls.blocklist_filter(null_key, bl)
    # a NULL or effectively-empty blocklist entry is rejected loudly:
    # it would either never match or match every schemeless row
    for bad in [None, "", "   ", " . "]:
        bad_bl = spark.createDataFrame(
            pd.DataFrame({"domain": pd.array([bad, "ok.com"], dtype=object)})
        )
        with pytest.raises(ValueError, match="effectively-empty"):
            urls.blocklist_filter(df, bad_bl)


def test_canonicalize_rejects_case_variant_collisions(spark):
    """Spark resolves identifiers case-insensitively by default: a
    'Host' column would be silently clobbered by the lowercase guard,
    then die downstream in an ambiguity error (r12 review find)."""
    clash = spark.createDataFrame(
        [(0, "http://a.com", "x")], "doc_id bigint, url string, Host string"
    )
    with pytest.raises(ValueError, match="already has a 'host' column"):
        urls.canonicalize_urls(clash)


_BLOCK = ["example.com", "bad.io", "b.co", " Example.COM ", ".bad.io."]


@settings(max_examples=15, deadline=None)
@given(
    url_list=st.lists(st.one_of(_url(), st.none()), min_size=1, max_size=8),
    block=st.lists(st.sampled_from(_BLOCK), min_size=0, max_size=3, unique=True),
)
def test_blocklist_filter_matches_duckdb(spark, url_list, block):
    """Random differential: the suffix-expansion semi join vs DuckDB's
    lateral list-slice replay — parent-domain hits, exact hits, empty
    blocklists, MESSY blocklist spellings (case/whitespace/dots), hosts
    whose every suffix misses, NULL/schemeless rows."""
    df = _frame(spark, url_list)
    bl = spark.createDataFrame(
        [(d,) for d in block] or [("never-matches.invalid",)],
        "domain string",
    )
    got = {
        tuple(r) for r in urls.blocklist_filter(df, bl).collect()
    }
    con = duckdb.connect()
    con.register(
        "urls",
        pd.DataFrame(
            {
                "doc_id": range(len(url_list)),
                "url": pd.array(url_list, dtype=object),
            }
        ),
    )
    con.register(
        "blocked",
        pd.DataFrame({"domain": block or ["never-matches.invalid"]}),
    )
    want = {
        tuple(r)
        for r in con.execute(
            f"WITH c AS ({ORACLE}), blk AS ({BLOCK_NORM}), sfx AS ("
            "SELECT c.doc_id, array_to_string("
            "string_split(c.host, '.')[s.i:], '.') AS domain "
            "FROM c, unnest(generate_series(1, "
            "len(string_split(c.host, '.')))) AS s(i)) "
            "SELECT * FROM c WHERE doc_id NOT IN ("
            "SELECT DISTINCT sfx.doc_id FROM sfx "
            "JOIN blk USING (domain))"
        ).fetchall()
    }
    assert got == want, got ^ want


@settings(max_examples=20, deadline=None)
@given(url_list=st.lists(st.one_of(_url(), st.none()), min_size=1, max_size=10))
def test_canonicalize_matches_duckdb_on_random_urls(spark, url_list):
    """Random-URL differential: every combination of case, default and
    explicit ports, tracking-only / tracking-first / tracking-last query
    strings, bare and stacked fragments, schemeless strings, whitespace,
    percent-escapes (unreserved, reserved, invalid, in host/port/path/
    query), multi-@ userinfo, NULLs — the operator chain and the CTE
    replay must agree exactly."""
    got = {
        tuple(r)
        for r in urls.canonicalize_urls(_frame(spark, url_list)).collect()
    }
    con = duckdb.connect()
    con.register(
        "urls",
        pd.DataFrame(
            {
                "doc_id": range(len(url_list)),
                "url": pd.array(url_list, dtype=object),
            }
        ),
    )
    want = {tuple(r) for r in con.execute(ORACLE).fetchall()}
    assert got == want, got ^ want


# ---------------------------------------------------------------------------
# IDN / punycode fold — the one non-SQL-replayable step (RFC 3492
# bootstring). Categorized differential exemption: no DuckDB oracle; the
# hypothesis differential instead compares the Arrow-batched kernel
# against the direct Python stdlib codec, which proves the Spark
# plumbing (batching, NULL handling, schema) — the codec is its own
# reference implementation.
# ---------------------------------------------------------------------------


def _py_fold(h):
    if h is None:
        return None
    try:
        return h.encode("idna").decode("ascii")
    except (UnicodeError, ValueError):
        return h


def test_fold_idn_hosts_fixed_shapes(spark):
    hosts = [
        "bücher.de",          # -> punycode
        "münchen.de",
        "日本.jp",
        "example.com",        # ASCII round-trips byte-identical
        "xn--bcher-kva.de",   # already-punycode round-trips
        "",                   # '' round-trips
        None,                 # NULL propagates
        "a..b",               # codec rejects (empty label) -> unchanged
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "doc_id bigint, host string"
    )
    got = {r.doc_id: r.host_ascii for r in urls.fold_idn_hosts(df).collect()}
    want = {i: _py_fold(h) for i, h in enumerate(hosts)}
    assert got == want
    assert got[0] == "xn--bcher-kva.de"
    assert got[2] == "xn--wgv71a.jp"


def test_fold_idn_hosts_validates_config(spark):
    df = spark.createDataFrame([(0, "a.com")], "doc_id bigint, host string")
    with pytest.raises(ValueError, match="column 'nope' not in frame"):
        urls.fold_idn_hosts(df, host_col="nope")
    clash = spark.createDataFrame(
        [(0, "a.com", "x")], "doc_id bigint, host string, Host_ASCII string"
    )
    with pytest.raises(ValueError, match="already has a 'host_ascii'"):
        urls.fold_idn_hosts(clash)


_IDN_LABELS = st.sampled_from(
    ["bücher", "münchen", "a", "b0", "xn--bcher-kva", "日本", "", "x-y",
     "straße", "ÅΩ"]
)


@settings(max_examples=15, deadline=None)
@given(
    hosts=st.lists(
        st.one_of(
            st.none(),
            st.lists(_IDN_LABELS, min_size=1, max_size=3).map(".".join),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_fold_idn_matches_python_codec(spark, hosts):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(len(hosts)), "host": pd.array(hosts, dtype=object)}
        )
    )
    got = {r.doc_id: r.host_ascii for r in urls.fold_idn_hosts(df).collect()}
    want = {i: _py_fold(h) for i, h in enumerate(hosts)}
    assert got == want


def test_blocklist_filter_idn_fold(spark):
    """idn_fold=True folds BOTH sides before the suffix join: a Unicode
    host is caught by a punycode blocklist entry and vice versa."""
    df = _frame(
        spark,
        [
            "http://bücher.de/x",            # unicode host, punycode entry
            "http://xn--mnchen-3ya.de/y",    # punycode host, unicode entry
            "http://a.bücher.de/z",          # subdomain of unicode host
            "http://ok.org/w",
        ],
    )
    bl = spark.createDataFrame(
        [("xn--bcher-kva.de",), ("münchen.de",)], "domain string"
    )
    kept_folded = {
        r.doc_id for r in urls.blocklist_filter(df, bl, idn_fold=True).collect()
    }
    assert kept_folded == {3}
    # without folding, the cross-spelling pairs slip through
    kept_raw = {r.doc_id for r in urls.blocklist_filter(df, bl).collect()}
    assert kept_raw == {0, 1, 2, 3}
