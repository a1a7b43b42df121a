"""URL canonicalization for web-corpus curation (r12, tests-only — the
50-slot driver window is structurally full, CLAUDE.md r11 lesson).

Web-scale training pipelines dedup and sample BY URL before any
content-level pass (the CommonCrawl convention): the same page arrives
under `HTTP://Example.com:80/a?utm_source=feed#frag` and
`http://example.com/a`, and a raw-string key silently keeps both. This
module derives the canonical key with a deterministic, ORDERED chain of
pure string/regex transforms — every step replayable verbatim in ANSI
SQL (DuckDB differential in tests/test_urls.py), no UDF, no parsing
library.

Canonicalization steps, in order (documented because the order is the
contract — e.g. ports are stripped only after the host is lowercased):

1. trim surrounding whitespace
2. strip the fragment (first '#' to end, dot-all)
3. lowercase the scheme://host prefix (path/query case is preserved —
   paths are case-sensitive on most origins)
4. strip the scheme's DEFAULT port only (http:80, https:443 — an
   explicit :8080 is a different origin and survives)
5. strip tracking query parameters (utm_*, fbclid, gclid) with
   separator repair ('?a&b' never results)
6. strip the trailing slash of a bare root path (scheme://host/ ->
   scheme://host; deeper path slashes are preserved — '/a/' vs '/a'
   is origin-dependent and NOT collapsed)
7. host = the lowercased authority minus any port; '' (not NULL) for
   schemeless strings, matching regexp_extract's no-match convention
   on both engines

Scale design (100 TB): map-only — a fixed chain of regexp kernels
inside whole-stage codegen, zero shuffle, scan-bandwidth bound
(plan-pinned in tests). `host_report` is the one aggregate: a groupBy
on the derived host whose output is host-cardinality-bounded, with the
distinct count expanding to the standard two-phase partial aggregate.

NULL urls propagate NULL canon_url/host (the pure-SQL-path convention;
the oracle wraps DuckDB's NULL-skipping concat in an explicit CASE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tracking parameters every major pipeline strips; the class is a
# regex ALTERNATION shared by operator and oracle (keep RE2-compatible:
# no backrefs, no lookaround)
TRACKING_PARAMS = "utm_[^=&#]*|fbclid|gclid"

_SCHEME_HOST = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"


def _canonical(u: Column) -> Column:
    u0 = F.trim(u)
    # (?s): a URL containing a newline after '#' still loses the whole
    # fragment (dot-all in both Java regex and RE2)
    u1 = F.regexp_replace(u0, "(?s)#.*", "")
    head = F.regexp_extract(u1, _SCHEME_HOST, 0)
    u2 = F.concat(
        F.lower(head), u1.substr(F.length(head) + F.lit(1), F.length(u1))
    )
    u3 = F.regexp_replace(
        u2, "^(http://[^/?#:]*):80([/?#]|$)", "$1$2"
    )
    u3 = F.regexp_replace(
        u3, "^(https://[^/?#:]*):443([/?#]|$)", "$1$2"
    )
    # tracking params, separator-repairing order: '&t=v' anywhere, then
    # a '?t=v&' head promotes the next param, then a bare '?t=v' tail
    u4 = F.regexp_replace(u3, f"&({TRACKING_PARAMS})=[^&#]*", "")
    u4 = F.regexp_replace(u4, f"\\?({TRACKING_PARAMS})=[^&#]*&", "?")
    u4 = F.regexp_replace(u4, f"\\?({TRACKING_PARAMS})=[^&#]*$", "")
    return F.regexp_replace(u4, "^([a-z][a-z0-9+.-]*://[^/?#]*)/$", "$1")


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append ``canon_url`` and ``host`` (see module docstring for the
    step contract). Input columns pass through unchanged; map-only."""
    if url_col not in df.columns:
        raise ValueError(
            f"canonicalize_urls: column {url_col!r} not in frame "
            f"(has {df.columns})"
        )
    for helper in ("canon_url", "host"):
        if helper in df.columns:
            raise ValueError(
                f"canonicalize_urls: frame already has a {helper!r} "
                "column — rename it or drop it first"
            )
    canon = _canonical(F.col(url_col))
    staged = df.select("*", canon.alias("canon_url"))
    return staged.select(
        "*",
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

    ``key_col`` must uniquely identify rows (the hit set is keyed on it
    — duplicate keys would drop all rows sharing a hit key). Returns
    the canonicalized frame (input columns + canon_url + host) with
    blocked rows removed; NULL urls have no host and are always kept.

    Scale: suffix expansion is a map-side Generate bounded by label
    depth (~5 suffixes/host); the blocklist joins BROADCAST (semi) so
    the corpus never shuffles; the final anti-join is key-vs-key. The
    host's split() is materialized behind an explode-let before the
    per-suffix lambda consumes it (the r12 CSE rule)."""
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
    canon = canonicalize_urls(df, url_col=url_col)
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
