"""Badwords / domain-blocklist filtering (operators/blocklist.py):
planted-document cases for both semantics (any-hit, density), token
exactness, subdomain suffix matching, Spark↔DuckDB parity from the one
shared rule table, and the funnel composition (VERDICT r09 #3)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from moisturizer_spark.operators.blocklist import (
    BADWORDS_MAX_PERMILLE,
    DEMO_BADWORDS,
    DEMO_BLOCKED_DOMAINS,
    badword_hits,
    badwords_rule,
    domain_blocklist_rule,
    sql_badword_hits,
    sql_badwords_predicate,
    sql_domain_blocklist_predicate,
)
from moisturizer_spark.operators.textan import tokens_col

WORDS = ("ass", "bomb")

# text -> (expected hits, expected keep under any, expected keep under
# density at 50 permille)
TEXT_CASES = {
    # token-exact: "class"/"assign" must NOT trip on "ass" (C4 matches
    # words, not substrings)
    "the class will assign homework": (0, True, True),
    # one hit: any-mode drops, density keeps (1/21 tokens = 47 permille)
    "a b c d e f g h i j k l m n o p q r s t bomb": (1, False, True),
    # occurrence-counted, not distinct: 3 hits of 2 words
    "bomb ass bomb": (3, False, False),
    # exactly AT the density threshold keeps (<=): 1 hit / 20 tokens
    # = exactly 50 permille
    "bomb b c d e f g h i j k l m n o p q r s t": (1, False, True),
    # empty-ish text: zero tokens keep (0 <= 0)
    "!!!": (0, True, True),
}


def test_badword_hits_and_both_modes_planted(spark):
    rows = list(TEXT_CASES)
    df = spark.createDataFrame([(t,) for t in rows], "text string")
    toks = tokens_col(F.col("text"))
    any_rule = badwords_rule(toks, WORDS, mode="any")[1]
    den_rule = badwords_rule(toks, WORDS, mode="density")[1]
    got = {
        r["text"]: (r["h"], r["ka"], r["kd"])
        for r in df.select(
            "text",
            badword_hits(toks, WORDS).alias("h"),
            any_rule.alias("ka"),
            den_rule.alias("kd"),
        ).collect()
    }
    assert got == TEXT_CASES


def test_badwords_sql_parity_planted():
    """The DuckDB rendering (same constants) agrees on every planted
    case — hits, any-mode keep, and density-mode keep."""
    con = duckdb.connect()
    toks_sql = (
        "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),"
        " t -> t <> '')"
    )
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"('{t}')" for t in TEXT_CASES)
        + ") v(text)"
    )
    rows = con.execute(
        f"SELECT text, {sql_badword_hits(toks_sql, WORDS)},"
        f" {sql_badwords_predicate(toks_sql, WORDS, mode='any')},"
        f" {sql_badwords_predicate(toks_sql, WORDS, mode='density')}"
        " FROM t"
    ).fetchall()
    got = {r[0]: (r[1], r[2], r[3]) for r in rows}
    assert got == TEXT_CASES


# canonical URL -> expected keep (True = not blocked)
DOMAIN_CASES = {
    # exact host match blocks
    "https://src3.example.com/docs/en/1": False,
    # subdomain of a listed domain blocks (suffix rule includes the dot)
    "https://a.b.badhost.example.org/x": False,
    "https://www2.src3.example.com/x": False,
    # a host merely ENDING in the listed string does not block
    "https://notsrc3.example.com/x": True,
    "https://goodhost.example.org/x": True,
    # unrelated host keeps
    "https://src1.example.com/docs/en/1": True,
}


def test_domain_blocklist_planted(spark):
    df = spark.createDataFrame(
        [(u,) for u in DOMAIN_CASES], "url string"
    )
    name, keep = domain_blocklist_rule(F.col("url"), DEMO_BLOCKED_DOMAINS)
    assert name == "blocked_domain"
    got = dict(df.select("url", keep.alias("k")).collect())
    assert got == DOMAIN_CASES


def test_domain_blocklist_sql_parity_planted():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE u AS SELECT * FROM (VALUES "
        + ", ".join(f"('{u}')" for u in DOMAIN_CASES)
        + ") v(url)"
    )
    pred = sql_domain_blocklist_predicate("url", DEMO_BLOCKED_DOMAINS)
    got = dict(con.execute(f"SELECT url, {pred} FROM u").fetchall())
    assert got == DOMAIN_CASES


def test_empty_blocklists_block_nothing(spark):
    df = spark.createDataFrame([("https://x.com/a",)], "url string")
    _, keep = domain_blocklist_rule(F.col("url"), ())
    assert df.select(keep.alias("k")).collect()[0]["k"] is True
    assert sql_domain_blocklist_predicate("url", ()) == "TRUE"


def test_badwords_is_a_first_class_funnel_rule(spark):
    """Composition (VERDICT r09 #3): ``default_quality_rules`` ends
    with the badwords rule, and ``cascade_filter_stats`` attributes a
    planted document that passes every structural gate but exceeds the
    badwords density to the 'badwords' stage — while a clean document
    of the same shape lands in 'kept'."""
    from moisturizer_spark.operators.textan import (
        cascade_filter_stats,
        default_quality_rules,
    )

    rules = default_quality_rules()
    assert [n for n, _ in rules] == [
        "min_chars", "min_words", "mean_word_len", "repetition", "badwords",
    ]
    # 30 distinct words (passes min_words>=20, repetition, mean len),
    # padded past 100 chars; the dirty twin swaps 6 fillers for the
    # demo list's planted vocab word 'slow' (6/30 = 200 permille > 50)
    clean_words = [f"w{i}x" for i in range(30)]
    dirty_words = clean_words[:24] + [DEMO_BADWORDS[0]] * 6
    mk = lambda ws: " ".join(ws)  # noqa: E731
    df = spark.createDataFrame(
        [("clean", mk(clean_words)), ("dirty", mk(dirty_words))],
        "tag string, text string",
    ).withColumn("n_chars", F.length("text"))
    stats = cascade_filter_stats(df, rules, group_cols=["tag"])
    got = {
        (r["tag"], r["stage"]): r["n_docs"] for r in stats.collect()
    }
    assert got == {("clean", "kept"): 1, ("dirty", "badwords"): 1}
    # stage ordinal: badwords is index 4, kept moves to 5
    idx = {r["stage"]: r["stage_idx"] for r in stats.collect()}
    assert idx == {"kept": 5, "badwords": 4}


def test_density_threshold_constant_is_shared():
    """The funnel SQL, the report SQL, and the Spark rule all read
    BADWORDS_MAX_PERMILLE — a change shows up in every rendering."""
    assert str(BADWORDS_MAX_PERMILLE) in sql_badwords_predicate("toks")


def test_empty_badwords_list_counts_nothing(spark):
    df = spark.createDataFrame([("bomb ass",)], "text string")
    toks = tokens_col(F.col("text"))
    got = df.select(
        badword_hits(toks, ()).alias("h"),
        badwords_rule(toks, (), mode="any")[1].alias("ka"),
    ).collect()[0]
    assert (got["h"], got["ka"]) == (0, True)
    assert sql_badword_hits("toks", ()) == "CAST(0 AS BIGINT)"
