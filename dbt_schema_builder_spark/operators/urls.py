"""URL canonicalization for web-corpus curation (r12, tests-only — the
50-slot driver window is structurally full, CLAUDE.md r11 lesson).

Web-scale training pipelines dedup and sample BY URL before any
content-level pass (the CommonCrawl convention): the same page arrives
under `HTTP://u@Example.com:80/a?utm_source=feed#frag` and
`http://example.com/a`, and a raw-string key silently keeps both. This
module derives the canonical key with a deterministic, ORDERED chain of
pure string/regex transforms — every step replayable verbatim in ANSI
SQL (DuckDB differential in tests/test_urls.py), no UDF, no parsing
library.

Canonicalization steps, in order (documented because the order is the
contract — e.g. userinfo must go before the port strip or
'u:p@host:80' hides the port behind the ':' in the userinfo):

1. trim surrounding whitespace
2. strip the fragment (first '#' to end, dot-all)
3. lowercase the scheme://authority prefix (path/query case is
   preserved — paths are case-sensitive on most origins)
4. strip userinfo ('user:pass@' up to the first '@' in the authority —
   the classic blocklist-evasion prefix; a literal '@' inside userinfo
   must be percent-encoded per RFC 3986, so first '@' = the delimiter)
5. strip trailing dots from the host ('bad.io.' resolves identically
   to 'bad.io' — the other classic evasion form)
6. strip the scheme's DEFAULT port only (http:80, https:443 — an
   explicit :8080 is a different origin and survives)
7. strip tracking query parameters (utm_*, fbclid, gclid) INSIDE the
   query string only — '&' is a legal path character (RFC 3986
   sub-delims), so the replaces are applied to the substring from the
   first '?', never to the path — with separator repair ('?a&b' never
   results)
8. strip the trailing slash of a bare root path (scheme://host/ ->
   scheme://host; deeper path slashes are preserved — '/a/' vs '/a'
   is origin-dependent and NOT collapsed)
9. host = the lowercased authority minus userinfo/port/trailing dots;
   '' (not NULL) for schemeless strings, matching regexp_extract's
   no-match convention on both engines

Scale design (100 TB): map-only — a fixed chain of regexp kernels
inside whole-stage codegen, zero data-dependent shuffle, scan-bandwidth
bound (plan-pinned in tests). The chain is materialized behind
explode-let Generates at its two consumption boundaries (the r12 CSE
rule: CollapseProject would otherwise inline the whole regex chain once
per downstream consumer). `host_report` is the one aggregate: a groupBy
on the derived host whose output is host-cardinality-bounded.

NULL urls propagate NULL canon_url/host (the pure-SQL-path convention;
the oracle uses '||' because DuckDB's concat() SKIPS NULLs while
Spark's returns NULL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tracking parameters every major pipeline strips; the class is a
# regex ALTERNATION shared by operator and oracle (keep RE2-compatible:
# no backrefs, no lookaround)
TRACKING_PARAMS = "utm_[^=&#]*|fbclid|gclid"

_SCHEME_AUTH = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"


def _pre_query(u: Column) -> Column:
    """Steps 1-6: everything left of the query split."""
    u0 = F.trim(u)
    # (?s): a URL containing a newline after '#' still loses the whole
    # fragment (dot-all in both Java regex and RE2)
    u1 = F.regexp_replace(u0, "(?s)#.*", "")
    head = F.regexp_extract(u1, _SCHEME_AUTH, 0)
    u2 = F.concat(
        F.lower(head), u1.substr(F.length(head) + F.lit(1), F.length(u1))
    )
    u3 = F.regexp_replace(
        u2, "^([a-z][a-z0-9+.-]*://)[^/?#@]*@", "$1"
    )
    u3 = F.regexp_replace(
        u3, "^([a-z][a-z0-9+.-]*://[^/?#]*?)\\.+([:/?#]|$)", "$1$2"
    )
    u4 = F.regexp_replace(u3, "^(http://[^/?#:]*):80([/?#]|$)", "$1$2")
    return F.regexp_replace(u4, "^(https://[^/?#:]*):443([/?#]|$)", "$1$2")


def _post_query(u: Column) -> Column:
    """Steps 7-8 over the materialized pre-query form: tracking-param
    removal scoped to the query substring, then the root-slash strip."""
    qpos = F.instr(u, "?")
    base = F.when(qpos == F.lit(0), u).otherwise(
        u.substr(F.lit(1), qpos - F.lit(1))
    )
    query = F.when(qpos == F.lit(0), F.lit("")).otherwise(
        u.substr(qpos, F.length(u))
    )
    # separator-repairing order within the query: '&t=v' anywhere, then
    # a '?t=v&' head promotes the next param, then a bare '?t=v' tail
    q = F.regexp_replace(query, f"&({TRACKING_PARAMS})=[^&#]*", "")
    q = F.regexp_replace(q, f"^\\?({TRACKING_PARAMS})=[^&#]*&", "?")
    q = F.regexp_replace(q, f"^\\?({TRACKING_PARAMS})=[^&#]*$", "")
    rejoined = F.concat(base, q)
    return F.regexp_replace(
        rejoined, "^([a-z][a-z0-9+.-]*://[^/?#]*)/$", "$1"
    )


def _ci(columns: list[str]) -> set[str]:
    """Spark resolves identifiers case-insensitively by default, so
    every collision/presence check casefolds (r12 review find: a user
    'Host' column slipped a case-sensitive guard, then died downstream
    in an AMBIGUOUS_REFERENCE far from the cause)."""
    return {c.lower() for c in columns}


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append ``canon_url`` and ``host`` (see module docstring for the
    step contract). Input columns pass through unchanged; map-only."""
    if url_col not in df.columns:
        raise ValueError(
            f"canonicalize_urls: column {url_col!r} not in frame "
            f"(has {df.columns})"
        )
    for helper in ("canon_url", "host", "_u6"):
        if helper in _ci(df.columns):
            raise ValueError(
                f"canonicalize_urls: frame already has a {helper!r} "
                "column (case-insensitive) — rename it or drop it first"
            )
    # two explode-let boundaries: the pre-query chain is consumed 5x by
    # the query-split expressions, the full canon 2x (emission + host)
    staged = df.select(
        "*", F.explode(F.array(_pre_query(F.col(url_col)))).alias("_u6")
    )
    staged = staged.select(
        "*", F.explode(F.array(_post_query(F.col("_u6")))).alias("canon_url")
    )
    return staged.select(
        *df.columns,
        "canon_url",
        F.regexp_extract(
            F.col("canon_url"), "^[a-z][a-z0-9+.-]*://([^/?#:]*)", 1
        ).alias("host"),
    )


def blocklist_filter(
    df: DataFrame,
    blocked_domains: DataFrame,
    url_col: str = "url",
    key_col: str = "doc_id",
) -> DataFrame:
    """Drop rows whose canonical host — or ANY parent domain of it —
    appears in ``blocked_domains`` (one column: ``domain``), the
    UT1-blocklist step web pipelines run right after URL
    canonicalization: blocking ``example.com`` must also block
    ``a.b.example.com``, so each host expands to its dot-suffix chain
    ({a.b.example.com, b.example.com, example.com, com}) and a row is
    dropped when any suffix matches.

    ``key_col`` must uniquely identify rows and be NON-NULL: a NULL key
    can never match itself in the anti-join (SQL null semantics), so a
    blocked row with a NULL key would silently pass a compliance
    filter — rejected LOUDLY at plan construction instead (one bounded
    limit-1 scan, the kmeans eager-guard convention). Returns the
    canonicalized frame (input columns + canon_url + host) with blocked
    rows removed; NULL urls have no host and are always kept.

    Scale: the canonicalized frame is persisted (track_persist — it
    feeds both the suffix expansion and the anti-join left side, and
    the ~10-regex chain must not run twice over the corpus); suffix
    expansion is a map-side Generate bounded by label depth (~5
    suffixes/host); the blocklist joins BROADCAST (semi) so the corpus
    never shuffles on it; the final anti-join is key-vs-key. The host's
    split() is materialized behind an explode-let before the per-suffix
    lambda consumes it (the r12 CSE rule)."""
    from ..session import track_persist

    if "domain" not in blocked_domains.columns:
        raise ValueError(
            "blocklist_filter: blocked_domains must have a 'domain' "
            f"column (has {blocked_domains.columns})"
        )
    if key_col not in df.columns:
        raise ValueError(
            f"blocklist_filter: key column {key_col!r} not in frame "
            f"(has {df.columns})"
        )
    if df.where(F.col(key_col).isNull()).limit(1).count() > 0:
        raise ValueError(
            f"blocklist_filter: key column {key_col!r} contains NULLs — "
            "a NULL key cannot be matched by the anti-join, so blocked "
            "rows would silently pass; assign non-null keys upstream"
        )
    canon = track_persist(canonicalize_urls(df, url_col=url_col))
    parts_frame = canon.select(
        key_col,
        F.explode(F.array(F.split(F.col("host"), "\\."))).alias("_parts"),
    )
    n = F.size("_parts")
    suffixes = parts_frame.select(
        key_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.array_join(F.slice("_parts", i, n), "."),
            )
        ).alias("domain"),
    )
    hits = (
        suffixes.join(F.broadcast(blocked_domains), "domain", "left_semi")
        .select(key_col)
        .distinct()
    )
    return canon.join(hits, key_col, "left_anti")


def host_report(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host curation report over canonicalized URLs:
    (host, n_urls, n_canon) — total rows and DISTINCT canonical pages
    per host, the table a crawl-sampling policy reads. Output bounded
    by host cardinality."""
    canon = canonicalize_urls(df, url_col=url_col)
    return canon.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("canon_url").alias("n_canon"),
    )
