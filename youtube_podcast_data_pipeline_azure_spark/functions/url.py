"""URL normalization and domain extraction for crawl curation.

A web-crawl training corpus keys its dedup, mixing, and takedown
bookkeeping on URLs — but raw crawl URLs are noisy: scheme/host case,
default ports, tracking parameters (utm_*, gclid, …), unordered query
strings, and trailing slashes all split one logical page across many
strings.  C4/RefinedWeb-style pipelines therefore canonicalize URLs
BEFORE any per-URL dedup and aggregate their mixture tables at the
domain grain.  The reference has no analog (its keys are YouTube ids);
this pack is part of the engine's training-data-pipeline surface
(SURVEY.md §2.C).

Everything is built-in regexp / higher-order-array expressions —
JVM-side, whole-stage codegen, zero shuffles, a pure per-row map over
the scan at 100 TB.  Patterns avoid backreferences and lookaround so
they are valid in BOTH Java regex (Spark) and RE2 (DuckDB); the SQL
twins are generated from the same constants and can never drift.

Contract: http(s) web-crawl URLs.  The normalization is:

1. scheme and host lowercased; userinfo stripped from the authority
2. default ports dropped (``:80`` on http, ``:443`` on https)
3. fragment dropped
4. tracking params removed (:data:`TRACKING_PARAM_RE`), remaining
   query params sorted bytewise; an emptied query drops its ``?``
5. trailing slashes collapsed from the path; an empty path becomes ``/``

``url_domain`` additionally strips one leading ``www.`` — a documented
heuristic for the registrable domain (a true public-suffix-list lookup
is data, not an expression; at the mixture-table grain the heuristic is
the standard first cut).

Inputs that don't match ``scheme://`` yield NULL from both functions —
on BOTH engines — so out-of-contract crawl rows fail identically
instead of silently drifting between Spark ('' on no regex match) and
DuckDB (NULL on no regex match).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters that never identify content (analytics/click ids)
TRACKING_PARAM_RE = r"^(utm_[a-z]+|gclid|fbclid|msclkid|ref|ref_src)="

#: component extractors — one regex each, shared verbatim with DuckDB
_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_AUTH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
#: anchored to before any fragment — a '?' INSIDE the fragment (SPA
#: hash routing, e.g. /p#/view?q=1) is NOT a query string (ADVICE r8)
_QUERY_RE = r"^[^#?]*\?([^#]*)"
_USERINFO_RE = r"^[^@]*@"
_TRAILING_SLASH_RE = r"/+$"
_WWW_RE = r"^www\."


def _host(c: Column) -> Column:
    """Lowercased host with userinfo and default ports stripped —
    scheme-aware (``:80`` only on http, ``:443`` only on https)."""
    scheme = F.lower(F.regexp_extract(c, _SCHEME_RE, 1))
    auth = F.lower(
        F.regexp_replace(F.regexp_extract(c, _AUTH_RE, 1), _USERINFO_RE, "")
    )
    return F.when(
        (scheme == "http") & auth.endswith(":80"),
        F.substring(auth, 1, F.length(auth) - 3),
    ).when(
        (scheme == "https") & auth.endswith(":443"),
        F.substring(auth, 1, F.length(auth) - 4),
    ).otherwise(auth)


def url_normalize(col: Column | str) -> Column:
    """Canonical form of an http(s) URL (see module contract).

    Inputs outside the ``scheme://`` contract (bare domains, relative
    URLs) yield NULL — identically in the DuckDB twin — so dirty crawl
    URLs fail the same way on both engines instead of drifting (ADVICE
    r8: Spark's regexp_extract returns '' on no match where DuckDB
    returns NULL, so ungated out-of-contract rows produced a garbage
    string on one engine and NULL on the other).
    """
    c = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(c, _SCHEME_RE, 1))
    path = F.regexp_replace(
        F.regexp_extract(c, _PATH_RE, 1), _TRAILING_SLASH_RE, ""
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_extract(c, _QUERY_RE, 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(q, "&"),
                lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
            )
        ),
        "&",
    )
    return F.when(
        c.rlike(_SCHEME_RE),
        F.concat(
            scheme,
            F.lit("://"),
            _host(c),
            path,
            F.when(kept == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), kept)
            ),
        ),
    )


def url_domain(col: Column | str) -> Column:
    """Registrable-domain heuristic: normalized host minus one leading
    ``www.``.  NULL outside the ``scheme://`` contract (same gate as
    :func:`url_normalize`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.rlike(_SCHEME_RE), F.regexp_replace(_host(c), _WWW_RE, "")
    )


def _host_sql(col_sql: str) -> str:
    auth = (
        f"regexp_replace(lower(regexp_extract({col_sql}, "
        f"'{_AUTH_RE}', 1)), '{_USERINFO_RE}', '')"
    )
    scheme = f"lower(regexp_extract({col_sql}, '{_SCHEME_RE}', 1))"
    return (
        f"CASE WHEN {scheme} = 'http' AND {auth} LIKE '%:80' "
        f"THEN left({auth}, len({auth}) - 3) "
        f"WHEN {scheme} = 'https' AND {auth} LIKE '%:443' "
        f"THEN left({auth}, len({auth}) - 4) "
        f"ELSE {auth} END"
    )


def url_normalize_sql(col_sql: str) -> str:
    """DuckDB twin of :func:`url_normalize`, same constants."""
    scheme = f"lower(regexp_extract({col_sql}, '{_SCHEME_RE}', 1))"
    path_raw = (
        f"regexp_replace(regexp_extract({col_sql}, '{_PATH_RE}', 1), "
        f"'{_TRAILING_SLASH_RE}', '')"
    )
    path = f"CASE WHEN {path_raw} = '' THEN '/' ELSE {path_raw} END"
    # DuckDB regexp_extract yields NULL on no match where Spark yields
    # '' — the query part is the only component that can fail to match
    q = f"coalesce(regexp_extract({col_sql}, '{_QUERY_RE}', 1), '')"
    # coalesce: DuckDB array_to_string([]) is NULL; Spark array_join
    # of an empty array is ''
    kept = (
        f"coalesce(array_to_string(list_sort(list_filter("
        f"string_split({q}, '&'), p -> p <> '' AND NOT "
        f"regexp_matches(p, '{TRACKING_PARAM_RE}'))), '&'), '')"
    )
    return (
        f"CASE WHEN regexp_matches({col_sql}, '{_SCHEME_RE}') THEN "
        f"{scheme} || '://' || {_host_sql(col_sql)} || {path} || "
        f"CASE WHEN {kept} = '' THEN '' ELSE '?' || {kept} END "
        f"END"
    )


def url_domain_sql(col_sql: str) -> str:
    """DuckDB twin of :func:`url_domain` (same NULL gate)."""
    return (
        f"CASE WHEN regexp_matches({col_sql}, '{_SCHEME_RE}') THEN "
        f"regexp_replace({_host_sql(col_sql)}, '{_WWW_RE}', '') END"
    )
