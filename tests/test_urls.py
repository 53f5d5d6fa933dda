"""URL canonicalization: the planted tracking-param/mirror-host cases
(VERDICT r08 #6), Spark↔DuckDB chain parity, and policy knobs."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from moisturizer_spark.operators.urls import (
    canonicalize_url,
    sql_canonicalize_url,
    sql_url_domain,
    url_domain,
)

CASES = {
    # tracking params stripped, survivors sorted, case folded, default
    # port dropped, fragment dropped, slash run collapsed
    "HTTPS://WWW.Example.COM:443/Docs/page//?utm_source=x&id=7&fbclid=z#f":
        "https://example.com/Docs/page?id=7",
    # mirror hosts fold to one canonical form
    "https://www.example.com/a": "https://example.com/a",
    "https://WWW.EXAMPLE.com/a": "https://example.com/a",
    "https://example.com/a": "https://example.com/a",
    # parameter ORDER cannot split a group
    "https://example.com/p?b=2&a=1": "https://example.com/p?a=1&b=2",
    "https://example.com/p?a=1&b=2": "https://example.com/p?a=1&b=2",
    # default ports: scheme-dependent
    "http://example.com:80/x": "http://example.com/x",
    "https://example.com:80/x": "https://example.com:80/x",
    "https://example.com:8443/x": "https://example.com:8443/x",
    # empty path becomes '/'
    "http://example.com": "http://example.com/",
    # all-tracking query disappears entirely (no dangling '?')
    "https://example.com/?ref=home&gclid=1&utm_campaign=c":
        "https://example.com/",
    # utm_ is a PREFIX rule; 'utmost' is a real parameter
    "https://example.com/p?utmost=1&utm_x=2": "https://example.com/p?utmost=1",
    # path case is PRESERVED (paths are case-sensitive; hosts are not)
    "https://EXAMPLE.com/CaseSensitive": "https://example.com/CaseSensitive",
    # schemeless input: deterministic lower+trim passthrough
    "  Not A Url  ": "not a url",
    # non-http scheme: generic rules, no default-port dropping
    "FTP://Files.Example.com:21/data/": "ftp://files.example.com:21/data",
}


def test_canonicalize_planted_cases(spark):
    urls = list(CASES)
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r["c"]
        for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    for u, g in zip(urls, got):
        assert g == CASES[u], (u, g)


def test_sql_chain_matches_spark_chain(spark):
    """The DuckDB rendering and the Spark expression must agree on
    every planted case AND on a generated hostile population."""
    gen = [
        f"https://{'www.' if i % 3 == 0 else ''}s{i % 4}.example.com"
        f"{':443' if i % 5 == 0 else ''}/d/{i % 11}"
        f"{'/' if i % 2 == 0 else ''}?"
        f"{'utm_a=1&' if i % 2 == 0 else ''}k={i % 11}"
        f"{'#z' if i % 7 == 0 else ''}"
        for i in range(200)
    ]
    urls = list(CASES) + gen
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r["c"]
        for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    con = duckdb.connect()
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT {sql_canonicalize_url('url')} "
            "FROM (SELECT unnest(?) AS url)",
            [urls],
        ).fetchall()
    ]
    assert got == duck
    # domain extraction parity too
    gd = [
        r["d"]
        for r in df.select(
            url_domain(canonicalize_url(F.col("url"))).alias("d")
        ).collect()
    ]
    dd = [
        r[0]
        for r in con.execute(
            f"SELECT {sql_url_domain(sql_canonicalize_url('url'))} "
            "FROM (SELECT unnest(?) AS url)",
            [urls],
        ).fetchall()
    ]
    assert gd == dd


def test_strip_www_policy_knob(spark):
    df = spark.createDataFrame([("https://www.example.com/a",)], "url string")
    strict = df.select(
        canonicalize_url(F.col("url"), strip_www=False).alias("c")
    ).first()["c"]
    assert strict == "https://www.example.com/a"


def test_canonicalize_is_idempotent(spark):
    """canon(canon(u)) == canon(u) — canonical forms are fixed points."""
    urls = list(CASES)
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonicalize_url(F.col("url")).alias("c"))
    twice = once.select(
        F.col("c"), canonicalize_url(F.col("c")).alias("c2")
    ).collect()
    for r in twice:
        assert r["c2"] == r["c"], r


def test_mirror_hosts_group_in_dedup(spark):
    """The end-to-end point: four spellings of one page collapse to a
    single canonical group; an actually-different page does not."""
    rows = [
        (1, "https://www.site.com/page?id=1&utm_source=a"),
        (2, "HTTPS://SITE.com:443/page/?id=1"),
        (3, "https://site.com/page?utm_campaign=x&id=1#top"),
        (4, "https://WWW.site.com/page?id=1"),
        (5, "https://site.com/page?id=2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    groups = (
        df.select("doc_id", canonicalize_url(F.col("url")).alias("c"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("keep"))
        .collect()
    )
    by_c = {r["c"]: (r["n"], r["keep"]) for r in groups}
    assert by_c["https://site.com/page?id=1"] == (4, 1)
    assert by_c["https://site.com/page?id=2"] == (1, 5)


def test_url_filter_rules_planted_cases(spark):
    """One planted URL per rule (including too_long, which the workload
    population cannot reach) + a clean keeper; Spark and DuckDB rule
    renderings agree case by case."""
    from moisturizer_spark.operators.urls import (
        default_url_filter_rules,
        sql_default_url_filter_rules,
    )

    cases = {
        "https://a.com/img/photo.jpg": "asset_extension",
        "https://a.com/" + "x" * 600: "too_long",
        "https://a.com/a/b/c/d/e/f/g/h/i": "path_too_deep",
        "https://a.com/p?a=1&b=2&c=3&d=4&e=5&f=6&g=7&h=8&i=9": "too_many_params",
        "https://a.com/cal/cal/cal/x": "repeated_segment",
        "https://a.com/docs/en/7?id=7": "kept",
        # extension matching is end-anchored: .jpg mid-path is fine
        "https://a.com/img.jpg/page": "kept",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    rules = default_url_filter_rules(F.col("url"))
    disp = F.lit("kept")
    for name, cond in reversed(rules):
        disp = F.when(~cond, F.lit(name)).otherwise(disp)
    got = {
        r["url"]: r["d"]
        for r in df.select("url", disp.alias("d")).collect()
    }
    assert got == cases

    sql_rules = sql_default_url_filter_rules("url")
    case = "CASE " + " ".join(
        f"WHEN NOT ({cond}) THEN '{name}'" for name, cond in sql_rules
    ) + " ELSE 'kept' END"
    con = duckdb.connect()
    duck = dict(
        con.execute(
            f"SELECT url, {case} FROM (SELECT unnest(?) AS url)",
            [list(cases)],
        ).fetchall()
    )
    assert duck == cases
