"""URL canonicalization + domain-aware dedup primitives — the crawl-
curation step every web-scale training corpus runs before any text-level
dedup: the same page arrives under dozens of URL spellings (mirror
hosts, tracking parameters, fragments, default ports, parameter order),
and canonical-URL exact dedup removes that whole class for the cost of a
string normalization plus one hash groupBy — orders of magnitude cheaper
than letting MinHash rediscover each mirror pair from text.

The rules are the standard public ones (RFC 3986 normalization plus the
conventional crawl extensions):

- scheme and host lowercase (RFC 3986 §6.2.2.1)
- fragment dropped (never sent to the server)
- default ports dropped (``:80`` http, ``:443`` https)
- ``www.`` host prefix dropped (mirror-host folding — a stated POLICY
  choice; pass ``strip_www=False`` to keep strict-host semantics)
- trailing-slash runs on the path collapse; empty path becomes ``/``
- tracking parameters removed (``utm_*``, ``gclid``, ``fbclid``,
  ``msclkid``, ``mc_cid``, ``mc_eid``, ``ref``), remaining parameters
  SORTED so order differences can't split a group

Everything is a pure column-expression chain (regex extracts + array
filter/sort — JVM-side, map-side, zero shuffles), deliberately NOT
``parse_url``: DuckDB has no parse_url, and the oracle replays the same
regex steps verbatim (:func:`sql_canonicalize_url` renders the identical
chain as DuckDB SQL), so canonical forms are engine-reproducible bit for
bit. URLs without ``://`` pass through lower+trim only (garbage in,
deterministic garbage out — the dedup grouping still works).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = [
    "TRACKING_PARAMS",
    "canonicalize_url",
    "sql_canonicalize_url",
    "url_domain",
    "sql_url_domain",
]

# conventional cross-site tracking parameters (exact keys; utm_* by prefix)
TRACKING_PARAMS = ("gclid", "fbclid", "msclkid", "mc_cid", "mc_eid", "ref")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def _is_tracking(key: Column) -> Column:
    return key.startswith("utm_") | key.isin(*TRACKING_PARAMS)


def canonicalize_url(url: Column, strip_www: bool = True) -> Column:
    """Canonical form of ``url`` under the module's rules — one chained
    column expression, no UDF, no shuffle."""
    u = F.regexp_replace(F.trim(url), r"#.*$", "")  # fragment first
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    authority = F.regexp_extract(rest, r"^([^/?]*)", 1)
    pathq = F.substring(rest, F.length(authority) + F.lit(1), F.lit(1 << 30))
    host = F.lower(F.regexp_replace(authority, r":\d+$", ""))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    port_part = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    raw_path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.regexp_replace(raw_path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~_is_tracking(F.element_at(F.split(p, "=", 2), 1)),
        )
    )
    query_part = F.when(
        F.size(kept) > 0,
        F.concat(F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(F.lit(""))
    canon = F.concat(scheme, F.lit("://"), host, port_part, path, query_part)
    # schemeless inputs: deterministic lower+trim passthrough
    return F.when(scheme == "", F.lower(F.trim(url))).otherwise(canon)


def sql_canonicalize_url(url_sql: str, strip_www: bool = True) -> str:
    """The identical canonicalization chain rendered as DuckDB SQL —
    generated from the same rule set so the oracle can never drift from
    :func:`canonicalize_url`. ``url_sql`` must be a bare column/alias
    reference (it is interpolated several times)."""
    track_list = ", ".join(f"'{t}'" for t in TRACKING_PARAMS)
    u = f"regexp_replace(trim({url_sql}), '#.*$', '')"
    scheme = f"lower(regexp_extract({u}, '{_SCHEME_RE}', 1))"
    rest = f"regexp_replace({u}, '{_SCHEME_RE}', '')"
    authority = f"regexp_extract({rest}, '^([^/?]*)', 1)"
    pathq = f"substr({rest}, length({authority}) + 1)"
    host = f"lower(regexp_replace({authority}, ':[0-9]+$', ''))"
    if strip_www:
        host = f"regexp_replace({host}, '^www\\.', '')"
    port = f"regexp_extract({authority}, ':([0-9]+)$', 1)"
    port_part = (
        f"CASE WHEN {port} = '' OR ({scheme} = 'http' AND {port} = '80') "
        f"OR ({scheme} = 'https' AND {port} = '443') THEN '' "
        f"ELSE ':' || {port} END"
    )
    raw_path = f"regexp_extract({pathq}, '^([^?]*)', 1)"
    path = (
        f"CASE WHEN regexp_replace({raw_path}, '/+$', '') = '' THEN '/' "
        f"ELSE regexp_replace({raw_path}, '/+$', '') END"
    )
    query = f"regexp_extract({pathq}, '\\?(.*)$', 1)"
    kept = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT (starts_with(string_split(p, '=')[1], 'utm_') "
        f"OR string_split(p, '=')[1] IN ({track_list}))))"
    )
    query_part = (
        f"CASE WHEN len({kept}) > 0 THEN '?' || array_to_string({kept}, '&') "
        f"ELSE '' END"
    )
    return (
        f"CASE WHEN {scheme} = '' THEN lower(trim({url_sql})) "
        f"ELSE {scheme} || '://' || {host} || {port_part} || {path} "
        f"|| {query_part} END"
    )


def url_domain(canon: Column) -> Column:
    """Registrable host of an already-canonical URL (the per-domain
    cap/weight grouping key). No public-suffix list in this container,
    so 'domain' = full canonical host — a stated simplification; swap
    in a PSL-backed extraction where the dependency exists."""
    return F.regexp_extract(canon, r"^[a-z][a-z0-9+.-]*://([^/:?]*)", 1)


def sql_url_domain(canon_sql: str) -> str:
    return f"regexp_extract({canon_sql}, '^[a-z][a-z0-9+.-]*://([^/:?]*)', 1)"


# -- URL filter rules (crawl-frontier hygiene) ---------------------------------
#
# The standard pre-fetch/pre-ingest URL filters every text crawl runs
# (public heuristics: asset extensions, crawler traps, oversized URLs).
# Spark predicates and their DuckDB renderings generate from the SAME
# rule table so an oracle replay can never drift. Rules evaluate on the
# CANONICAL form (lowercased host, sorted params) — run
# :func:`canonicalize_url` first.

BLOCKED_EXTENSIONS = (
    "jpg", "jpeg", "png", "gif", "ico", "svg", "webp",
    "css", "js", "woff", "woff2", "ttf",
    "mp3", "mp4", "avi", "mov",
    "zip", "gz", "tar", "exe",
)
MAX_URL_LEN = 512
MAX_PATH_DEPTH = 8
MAX_QUERY_PARAMS = 8
REPEAT_SEGMENT_LIMIT = 3  # same path segment this many times = a trap

_EXT_RE = r"\.(" + "|".join(BLOCKED_EXTENSIONS) + r")$"


def default_url_filter_rules(canon: Column) -> list:
    """``[(rule_name, passes_predicate)]`` over a canonical URL column.
    A URL is KEPT iff every predicate is true; reports group rejects by
    the FIRST failing rule in this order. The domain blocklist runs
    FIRST — a crawl frontier checks its blocklist before parsing
    anything else (see :mod:`moisturizer_spark.operators.blocklist`;
    deferred import: blocklist imports this module's domain helpers)."""
    from moisturizer_spark.operators.blocklist import domain_blocklist_rule

    path = F.regexp_extract(canon, r"^[a-z][a-z0-9+.-]*://[^/?]*([^?]*)", 1)
    query = F.regexp_extract(canon, r"\?(.*)$", 1)
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    max_seg_repeat = F.array_max(
        F.transform(
            F.array_distinct(segs),
            lambda s: F.size(F.filter(segs, lambda x: x == s)),
        )
    )
    return [
        domain_blocklist_rule(canon),
        ("asset_extension", ~path.rlike(_EXT_RE)),
        ("too_long", F.length(canon) <= MAX_URL_LEN),
        ("path_too_deep", F.size(segs) <= MAX_PATH_DEPTH),
        (
            "too_many_params",
            F.when(query == "", F.lit(0)).otherwise(
                F.size(F.split(query, "&"))
            )
            <= MAX_QUERY_PARAMS,
        ),
        (
            "repeated_segment",
            F.coalesce(max_seg_repeat, F.lit(0)) < REPEAT_SEGMENT_LIMIT,
        ),
    ]


def sql_default_url_filter_rules(canon_sql: str) -> list:
    """The identical rule cascade rendered as DuckDB predicates —
    generated from the same constants as :func:`default_url_filter_rules`."""
    from moisturizer_spark.operators.blocklist import (
        sql_domain_blocklist_predicate,
    )

    path = (
        f"regexp_extract({canon_sql}, "
        "'^[a-z][a-z0-9+.-]*://[^/?]*([^?]*)', 1)"
    )
    query = f"regexp_extract({canon_sql}, '\\?(.*)$', 1)"
    segs = f"list_filter(string_split({path}, '/'), s -> s <> '')"
    max_seg_repeat = (
        f"list_max(list_transform(list_distinct({segs}), "
        f"s -> len(list_filter({segs}, x -> x = s))))"
    )
    return [
        ("blocked_domain", sql_domain_blocklist_predicate(canon_sql)),
        ("asset_extension", f"NOT regexp_matches({path}, '{_EXT_RE}')"),
        ("too_long", f"length({canon_sql}) <= {MAX_URL_LEN}"),
        ("path_too_deep", f"len({segs}) <= {MAX_PATH_DEPTH}"),
        (
            "too_many_params",
            f"(CASE WHEN {query} = '' THEN 0 "
            f"ELSE len(string_split({query}, '&')) END) <= {MAX_QUERY_PARAMS}",
        ),
        (
            "repeated_segment",
            f"coalesce({max_seg_repeat}, 0) < {REPEAT_SEGMENT_LIMIT}",
        ),
    ]
