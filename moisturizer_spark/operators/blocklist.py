"""Badwords / domain-blocklist filtering — the C4-style crawl-hygiene
stage (Raffel et al. 2020 drop any page containing a word from a public
obscenity blocklist; RefinedWeb / Dolma additionally drop whole hosts
via curated domain blocklists such as the UT1 categories). This module
is the rule layer between the URL cascade (pre-fetch hygiene,
``operators/urls.py``) and the quality funnel (content heuristics,
``textan.default_quality_rules``): token-level blocklisting of document
TEXT, and domain-level blocklisting of canonical URLs.

Design (the ``default_url_filter_rules`` pattern): every predicate is a
pure JVM column expression generated from ONE shared constant table,
with a DuckDB rendering generated from the SAME constants, so an oracle
replay can never drift from the Spark plan. Matching is token-exact
(C4 matches words, not substrings — "class" must not trip on "ass"),
and domain matching is suffix-aware (blocking ``example.org`` blocks
``a.example.org`` but NOT ``notexample.org``).

The shipped word/domain lists are deterministic DEMO placeholders drawn
from the synthetic corpus vocabulary: the real public lists (LDNOOBW
words, UT1 domain categories) are drop-in replacements via the ``words``
/ ``domains`` parameters — every operator is list-agnostic, and
reproducing an obscenity list verbatim in source adds nothing the
parameter doesn't.

Two filter semantics are provided, both used in public pipelines:

- ``mode="any"`` — C4's rule: one hit drops the document;
- ``mode="density"`` — fraction-threshold rule (Dolma-style): drop only
  when blocklisted tokens exceed ``max_permille`` of all tokens, the
  right semantics for lists whose words are only disqualifying in bulk.

Scale: the token scan is one higher-order ``filter`` over the
already-computed token array (map-side, whole-stage codegen, zero
shuffles, no UDF); the domain check is one regexp extract + a bounded
OR-chain over the blocklist (broadcast-free: the list is a literal in
the plan — fine for curated lists of 10⁰–10⁴ entries; past that, swap
in a broadcast semi-join on registrable domain, which this module's
callers can do without API change since rules are plain predicates).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from moisturizer_spark.operators.urls import sql_url_domain, url_domain

__all__ = [
    "DEMO_BADWORDS",
    "DEMO_BLOCKED_DOMAINS",
    "BADWORDS_MAX_PERMILLE",
    "badword_hits",
    "sql_badword_hits",
    "badwords_rule",
    "sql_badwords_predicate",
    "domain_blocklist_rule",
    "sql_domain_blocklist_predicate",
]

# Deterministic DEMO blocklists (see module docstring): real deployments
# pass LDNOOBW / UT1 lists through the same parameters. "slow" is the
# planted member of the synthetic corpus vocabulary so rows are
# non-vacuous at every scale; "unsafeword" exercises the no-hit path.
DEMO_BADWORDS: tuple[str, ...] = ("slow", "unsafeword")
DEMO_BLOCKED_DOMAINS: tuple[str, ...] = (
    "src3.example.com",
    "badhost.example.org",
)
# density threshold for mode="density": tokens on the list may make up
# at most this many permille of the document before it is dropped
BADWORDS_MAX_PERMILLE = 50


def badword_hits(toks: Column, words: tuple[str, ...] = DEMO_BADWORDS) -> Column:
    """Count of tokens in ``toks`` (an already-tokenized array column)
    that appear on the blocklist — token-exact, occurrence-counted.
    An empty blocklist counts nothing (mirrors the domain rule)."""
    if not words:
        return F.lit(0).cast("bigint")
    return F.size(F.filter(toks, lambda t: t.isin(*words))).cast("bigint")


def sql_badword_hits(
    toks_sql: str, words: tuple[str, ...] = DEMO_BADWORDS
) -> str:
    """DuckDB rendering of :func:`badword_hits` over a SQL expression
    producing the same token list."""
    if not words:
        return "CAST(0 AS BIGINT)"
    lit = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return (
        f"CAST(len(list_filter({toks_sql}, "
        f"t -> list_contains({lit}, t))) AS BIGINT)"
    )


def badwords_rule(
    toks: Column,
    words: tuple[str, ...] = DEMO_BADWORDS,
    mode: str = "density",
    max_permille: int = BADWORDS_MAX_PERMILLE,
) -> tuple[str, Column]:
    """``(rule_name, keep_predicate)`` for a quality cascade
    (:func:`textan.cascade_filter_stats`). Integer-exact: the density
    test is ``1000·hits ≤ max_permille·n_words`` — no float boundary,
    any engine buckets identically. Empty documents keep (0 ≤ 0)."""
    hits = badword_hits(toks, words)
    if mode == "any":
        return ("badwords", hits == 0)
    if mode != "density":
        raise ValueError(f"unknown badwords mode: {mode!r}")
    return ("badwords", 1000 * hits <= max_permille * F.size(toks))


def sql_badwords_predicate(
    toks_sql: str,
    words: tuple[str, ...] = DEMO_BADWORDS,
    mode: str = "density",
    max_permille: int = BADWORDS_MAX_PERMILLE,
) -> str:
    """The identical keep-predicate rendered for DuckDB — generated
    from the same constants as :func:`badwords_rule`."""
    hits = sql_badword_hits(toks_sql, words)
    if mode == "any":
        return f"{hits} = 0"
    if mode != "density":
        raise ValueError(f"unknown badwords mode: {mode!r}")
    return f"1000 * {hits} <= {max_permille} * len({toks_sql})"


def domain_blocklist_rule(
    canon: Column, domains: tuple[str, ...] = DEMO_BLOCKED_DOMAINS
) -> tuple[str, Column]:
    """``(rule_name, keep_predicate)`` over a CANONICAL URL column
    (run :func:`urls.canonicalize_url` first — hosts are lowercase
    there, so matching is case-clean by construction). A URL is
    blocked iff its host equals a listed domain OR is a subdomain of
    one (suffix match on ``"." + domain``)."""
    host = url_domain(canon)
    blocked = None
    for d in domains:
        hit = (host == F.lit(d)) | host.endswith("." + d)
        blocked = hit if blocked is None else (blocked | hit)
    if blocked is None:  # empty blocklist blocks nothing
        return ("blocked_domain", F.lit(True))
    return ("blocked_domain", ~blocked)


def sql_domain_blocklist_predicate(
    canon_sql: str, domains: tuple[str, ...] = DEMO_BLOCKED_DOMAINS
) -> str:
    """The identical keep-predicate rendered for DuckDB."""
    if not domains:
        return "TRUE"
    host = sql_url_domain(canon_sql)
    hits = " OR ".join(
        f"({host} = '{d}' OR suffix({host}, '.{d}'))" for d in domains
    )
    return f"NOT ({hits})"
