"""URL canonicalization for web-corpus curation (r12, tests-only — the
50-slot driver window is structurally full, CLAUDE.md r11 lesson).

Web-scale training pipelines dedup and sample BY URL before any
content-level pass (the CommonCrawl convention): the same page arrives
under `HTTP://u@Example.com:80/a?utm_source=feed#frag` and
`http://example.com/a`, and a raw-string key silently keeps both. This
module derives the canonical key with a deterministic, ORDERED chain of
pure string/regex/array transforms — every step replayable verbatim in
ANSI SQL (DuckDB differential in tests/test_urls.py), no UDF, no
parsing library. (The one non-SQL step, IDN/punycode host folding, is a
SEPARATE opt-in operator — `fold_idn_hosts` below.)

Canonicalization steps, in order (documented because the order is the
contract — e.g. userinfo must go before the port strip or
'u:p@host:80' hides the port behind the ':' in the userinfo):

1. trim surrounding whitespace
2. strip the fragment (first '#' to end, dot-all)
3. decode percent-escapes of UNRESERVED characters (RFC 3986 2.3:
   ALPHA / DIGIT / '-' '.' '_' '~') — '%61' == 'a', 'bad%2Eio' ==
   'bad.io', 'utm%5Fsource' == 'utm_source'; decoding an unreserved
   escape can never create a delimiter (the unreserved set contains
   none), so it is safe URI-wide and MUST run before the lowercase /
   userinfo / dot / port / tracking steps so decoded characters get
   their treatment (decode-created host dots are stripped, a decoded
   'utm_source' is recognized)
4. lowercase the scheme://authority prefix (path/query case is
   preserved — paths are case-sensitive on most origins); runs AFTER
   step 3 so a '%41' decoded into the host lowercases with it
5. uppercase the hex of every REMAINING percent-escape ('%2f' ->
   '%2F', RFC 3986 6.2.2.1) — runs AFTER step 4 so the authority
   lowercase cannot undo it; '%2F' vs '%2f' alias pairs now key
   identically
6. strip userinfo — everything from after '://' to the LAST '@'
   before a path/query boundary (greedy `[^/?#]*@`): WHATWG URL
   parsing resolves the host as everything after the last '@', so a
   multi-@ authority like 'a@b@bad.io' must strip to 'bad.io' (a
   first-@ strip leaves 'b@bad.io' — the r12 ADVICE evasion); a
   literal '@' inside userinfo would be '%40', which step 3 never
   decodes
7. strip trailing dots from the host ('bad.io.' resolves identically
   to 'bad.io' — the other classic evasion form)
8. strip the scheme's DEFAULT port only (http:80, https:443 — an
   explicit :8080 is a different origin and survives)
9. strip tracking query parameters (utm_*, fbclid, gclid) INSIDE the
   query string only — '&' is a legal path character (RFC 3986
   sub-delims), so the replaces are applied to the substring from the
   first '?', never to the path — with separator repair ('?a&b' never
   results)
10. strip the trailing slash of a bare root path (scheme://host/ ->
    scheme://host; deeper path slashes are preserved — '/a/' vs '/a'
    is origin-dependent and NOT collapsed)
11. host = the lowercased authority minus userinfo/port/trailing dots;
    '' (not NULL) for schemeless strings, matching regexp_extract's
    no-match convention on both engines

Scale design (100 TB): map-only — a fixed chain of regexp/array
kernels, zero data-dependent shuffle, scan-bandwidth bound (plan-pinned
in tests). The chain is materialized behind explode-let Generates at
its THREE consumption boundaries (the r12 CSE rule: CollapseProject
would otherwise inline the chain once per downstream consumer; the
percent passes are array HOFs, which are CodegenFallback, so
re-inlining them is doubly expensive): the decoded form feeds the
authority extraction 3x, the pre-query form feeds the query-split 5x,
the full canon feeds emission + host 2x. `host_report` is the one
aggregate: a groupBy on the derived host whose output is
host-cardinality-bounded.

NULL urls propagate NULL canon_url/host (the pure-SQL-path convention;
the oracle uses '||' because DuckDB's concat() SKIPS NULLs while
Spark's returns NULL).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# tracking parameters every major pipeline strips; the class is a
# regex ALTERNATION shared by operator and oracle (keep RE2-compatible:
# no backrefs, no lookaround)
TRACKING_PARAMS = "utm_[^=&#]*|fbclid|gclid"

_SCHEME_AUTH = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

# a percent-escape element (after split on '%') starts with two hex
# digits; anything else means the '%' was a literal (invalid URL) and
# passes through unchanged
_HEX2 = "^[0-9A-Fa-f]{2}"


def _pct_decode_unreserved(u: Column) -> Column:
    """Step 3: decode %XX escapes of RFC 3986 unreserved characters
    (ALPHA 0x41-0x5A/0x61-0x7A, DIGIT 0x30-0x39, '-' 0x2D, '.' 0x2E,
    '_' 0x5F, '~' 0x7E); every other escape is left byte-identical
    (its hex case is normalized later, AFTER the authority lowercase).

    Split on '%': element 0 is the literal prefix; each later element
    is what followed one '%'. The when() branches operate only on the
    lambda element itself (cheap scalar ops — not the r12 CSE trap,
    which is consuming an expensive OUTER expression per element)."""
    parts = F.split(u, "%", -1)

    def fix(x: Column, i: Column) -> Column:
        valid = x.rlike(_HEX2)
        # conv() only ever sees valid hex (ANSI-safe): the otherwise()
        # value is a dummy the unres predicate rejects via valid
        hx = F.upper(F.when(valid, x.substr(F.lit(1), F.lit(2))).otherwise(F.lit("00")))
        code = F.conv(hx, 16, 10).cast("int")
        unres = (
            ((code >= 65) & (code <= 90))
            | ((code >= 97) & (code <= 122))
            | ((code >= 48) & (code <= 57))
            | code.isin(45, 46, 95, 126)
        )
        rest = x.substr(F.lit(3), F.length(x))
        return F.when(i == F.lit(0), x).otherwise(
            F.when(valid & unres, F.concat(F.char(code), rest)).otherwise(
                F.concat(F.lit("%"), x)
            )
        )

    # %-free fast path: the split+transform HOFs are CodegenFallback
    # (r13 A/B: the two percent passes cost ~1.2x on an all-'%' frame),
    # and most URLs carry no escape at all — CASE WHEN branches
    # evaluate lazily per row, so they skip the HOF entirely. This is a
    # row-level conditional AROUND a HOF, not a conditional consumed
    # INSIDE a lambda (the r12 CSE trap does not apply).
    return F.when(F.instr(u, "%") == F.lit(0), u).otherwise(
        F.array_join(F.transform(parts, fix), "")
    )


def _pct_upper(u: Column) -> Column:
    """Step 5: uppercase the hex digits of every remaining escape
    ('%2f' -> '%2F'); non-hex after '%' passes through unchanged."""
    parts = F.split(u, "%", -1)

    def fix(x: Column, i: Column) -> Column:
        return F.when(i == F.lit(0), x).otherwise(
            F.when(
                x.rlike(_HEX2),
                F.concat(
                    F.lit("%"),
                    F.upper(x.substr(F.lit(1), F.lit(2))),
                    x.substr(F.lit(3), F.length(x)),
                ),
            ).otherwise(F.concat(F.lit("%"), x))
        )

    # %-free fast path (see _pct_decode_unreserved)
    return F.when(F.instr(u, "%") == F.lit(0), u).otherwise(
        F.array_join(F.transform(parts, fix), "")
    )


def _decoded(u: Column) -> Column:
    """Steps 1-3: trim, fragment strip, unreserved percent-decode."""
    u0 = F.trim(u)
    # (?s): a URL containing a newline after '#' still loses the whole
    # fragment (dot-all in both Java regex and RE2)
    u1 = F.regexp_replace(u0, "(?s)#.*", "")
    return _pct_decode_unreserved(u1)


def _pre_query(u: Column) -> Column:
    """Steps 4-8 over the MATERIALIZED decoded form (`u` must be a
    plain column, not the step-3 expression: it is consumed 3x here)."""
    head = F.regexp_extract(u, _SCHEME_AUTH, 0)
    u2 = F.concat(
        F.lower(head), u.substr(F.length(head) + F.lit(1), F.length(u))
    )
    u2 = _pct_upper(u2)
    # userinfo: greedy to the LAST '@' before a path/query boundary
    # (WHATWG host resolution; first-@ stripping is evadable with
    # 'a@b@bad.io' — r13 ADVICE fix)
    u3 = F.regexp_replace(
        u2, "^([a-z][a-z0-9+.-]*://)[^/?#]*@", "$1"
    )
    u3 = F.regexp_replace(
        u3, "^([a-z][a-z0-9+.-]*://[^/?#]*?)\\.+([:/?#]|$)", "$1$2"
    )
    u4 = F.regexp_replace(u3, "^(http://[^/?#:]*):80([/?#]|$)", "$1$2")
    return F.regexp_replace(u4, "^(https://[^/?#:]*):443([/?#]|$)", "$1$2")


def _post_query(u: Column) -> Column:
    """Steps 9-10 over the materialized pre-query form: tracking-param
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
    for helper in ("canon_url", "host", "_u3", "_u6"):
        if helper in _ci(df.columns):
            raise ValueError(
                f"canonicalize_urls: frame already has a {helper!r} "
                "column (case-insensitive) — rename it or drop it first"
            )
    # three explode-let boundaries: the decoded form is consumed 3x by
    # the authority extraction, the pre-query chain 5x by the
    # query-split expressions, the full canon 2x (emission + host)
    staged = df.select(
        "*", F.explode(F.array(_decoded(F.col(url_col)))).alias("_u3")
    )
    staged = staged.select(
        "*", F.explode(F.array(_pre_query(F.col("_u3")))).alias("_u6")
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


@F.pandas_udf(StringType())
def _idn_fold(hosts: pd.Series) -> pd.Series:
    """IDNA 2003 fold via the stdlib 'idna' codec (no third-party
    library): a Unicode host encodes to its punycode xn-- form; an
    already-ASCII host round-trips byte-identical (the stdlib codec
    does NOT casefold pure-ASCII labels — apply this to CANONICAL
    hosts, which are already lowercase). '' round-trips to ''. Hosts
    the codec rejects (empty labels like 'a..b', over-long labels)
    pass through UNCHANGED — conservative: an unconvertible alias keys
    separately rather than colliding or erroring, and a blocklist
    consumer still sees the original spelling."""

    def fold(h):
        if h is None:
            return None
        try:
            return h.encode("idna").decode("ascii")
        except (UnicodeError, ValueError):
            return h

    return hosts.map(fold)


def fold_idn_hosts(
    df: DataFrame, host_col: str = "host", out_col: str = "host_ascii"
) -> DataFrame:
    """Append ``out_col``: the IDN/punycode ASCII fold of ``host_col``
    ('bücher.de' -> 'xn--bcher-kva.de'), so a Unicode spelling and its
    punycode form key identically — the alias class (and
    blocklist-evasion vector) the pure-regex chain cannot close,
    because punycode is a real algorithm (RFC 3492 bootstring), not a
    string transform.

    Kept OUT of `canonicalize_urls` deliberately: this is the one
    non-SQL-replayable step (no DuckDB oracle — the differential in
    tests/test_urls.py instead compares the Arrow-batched kernel
    against the direct Python codec, which proves the Spark plumbing;
    the codec is its own reference). Arrow-batched pandas_udf, map-only,
    no shuffle; at 100 TB this is a per-row ASCII check + rare
    punycode encode, scan-bandwidth bound."""
    if host_col not in df.columns:
        raise ValueError(
            f"fold_idn_hosts: column {host_col!r} not in frame "
            f"(has {df.columns})"
        )
    if out_col.lower() in _ci(df.columns):
        raise ValueError(
            f"fold_idn_hosts: frame already has a {out_col!r} column "
            "(case-insensitive) — rename it or drop it first"
        )
    return df.withColumn(out_col, _idn_fold(F.col(host_col)))


def _normalized_blocklist(blocked_domains: DataFrame) -> DataFrame:
    """Blocklist entries arrive from hand-maintained files: normalize
    the join side the same way the host side is canonicalized
    (casefold, trim, strip leading/trailing dots — a leading-dot entry
    '.example.com' is the common 'all subdomains' spelling, and under
    suffix expansion the bare domain blocks subdomains AND the apex, a
    conservative superset). An entry that is NULL or empties out after
    normalization would either never match or match every schemeless
    row's '' host — both silent compliance failures — so they are
    rejected LOUDLY (r13 ADVICE fix; previously 'Example.COM' or
    'bad.io.' silently never matched the canonicalized host side)."""
    bl = blocked_domains.select(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.trim(F.col("domain"))), "\\.+$", ""),
            "^\\.+",
            "",
        ).alias("domain")
    )
    bad = bl.where(F.col("domain").isNull() | (F.col("domain") == "")).limit(1)
    if bad.count() > 0:
        raise ValueError(
            "blocklist_filter: blocked_domains contains a NULL or "
            "effectively-empty entry after normalization — it would "
            "either never match or match every schemeless row; remove it"
        )
    return bl


def blocklist_filter(
    df: DataFrame,
    blocked_domains: DataFrame,
    url_col: str = "url",
    key_col: str = "doc_id",
    idn_fold: bool = False,
) -> DataFrame:
    """Drop rows whose canonical host — or ANY parent domain of it —
    appears in ``blocked_domains`` (one column: ``domain``), the
    UT1-blocklist step web pipelines run right after URL
    canonicalization: blocking ``example.com`` must also block
    ``a.b.example.com``, so each host expands to its dot-suffix chain
    ({a.b.example.com, b.example.com, example.com, com}) and a row is
    dropped when any suffix matches. The blocklist side is normalized
    to the host side's canonical form first (see
    ``_normalized_blocklist``). With ``idn_fold=True`` both the host
    and the blocklist entries are additionally punycode-folded
    (``fold_idn_hosts``) before the suffix expansion, closing the
    Unicode-spelling evasion ('bücher.de' vs 'xn--bcher-kva.de') at
    the cost of the one non-SQL step.

    ``key_col`` must uniquely identify rows and be NON-NULL: a NULL key
    can never match itself in the anti-join (SQL null semantics), so a
    blocked row with a NULL key would silently pass a compliance
    filter — rejected LOUDLY at plan construction instead (one bounded
    limit-1 scan, the kmeans eager-guard convention). Returns the
    canonicalized frame (input columns + canon_url + host) with blocked
    rows removed; NULL urls have no host and are always kept.

    Scale: the canonicalized frame is persisted (track_persist — it
    feeds both the suffix expansion and the anti-join left side, and
    the ~10-step chain must not run twice over the corpus); suffix
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
    bl = _normalized_blocklist(blocked_domains)
    canon = track_persist(canonicalize_urls(df, url_col=url_col))
    join_host = F.col("host")
    if idn_fold:
        join_host = _idn_fold(join_host)
        bl = bl.select(_idn_fold(F.col("domain")).alias("domain"))
    parts_frame = canon.select(
        key_col,
        F.explode(F.array(F.split(join_host, "\\."))).alias("_parts"),
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
        suffixes.join(F.broadcast(bl), "domain", "left_semi")
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
