"""Data-quality expectations engine: exact violation counting."""

from __future__ import annotations

from pyspark.sql import functions as F

from moisturizer_spark.operators import expectations as X


def _report(df, rules):
    return {r["rule"]: r["violations"] for r in X.check(df, rules).collect()}


def test_all_rule_kinds_count_exactly(spark):
    df = spark.createDataFrame(
        [
            (1, 10, "A", 1),
            (2, 99, "A", 1),      # out of range
            (None, 10, "B", 2),   # null id, bad domain
            (4, None, "A", 2),    # null qty -> range violation
            (5, 10, "A", 3),      # orphan ref
            (5, 10, "A", 3),      # duplicate id 5 (x2) + orphan
        ],
        "id long, qty long, flag string, ref long",
    )
    ref = spark.createDataFrame([(1,), (2,)], "key long")
    got = _report(
        df,
        [
            X.not_null("id"),
            X.in_range("qty", 1, 50),
            X.accepted_values("flag", "A"),
            X.predicate("qty_lt_ref_times_50", F.col("qty") <= F.col("ref") * 50),
            X.unique("id"),
            X.foreign_key("ref", ref, "key"),
        ],
    )
    assert got["not_null(id)"] == 1
    assert got["in_range(qty,1,50)"] == 2  # 99 and NULL
    assert got["accepted_values(flag)"] == 1
    # NULL qty fails (unknown → violation) and 99 > 1*50 fails
    assert got["qty_lt_ref_times_50"] == 2
    assert got["unique(id)"] == 2  # both rows of the duplicated key count
    assert got["foreign_key(ref)"] == 2  # two rows with ref=3


def test_clean_table_reports_zeroes(spark):
    df = spark.createDataFrame([(1, 5), (2, 6)], "id long, v long")
    got = _report(df, [X.not_null("id"), X.in_range("v", 0, 10), X.unique("id")])
    assert set(got.values()) == {0}


def test_report_preserves_declaration_order(spark):
    df = spark.createDataFrame([(1,)], "id long")
    rules = [X.unique("id"), X.not_null("id")]
    names = [r["rule"] for r in X.check(df, rules).collect()]
    assert names == ["unique(id)", "not_null(id)"]
