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


def test_profile_numeric_stats(spark):
    from pyspark.sql import functions as F

    from moisturizer_spark.operators.expectations import profile_numeric

    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, None), (2.0, 30.0), (None, 10.0)],
        "a double, b double",
    )
    got = {r["column"]: r.asDict() for r in profile_numeric(df, ["a", "b"]).collect()}
    assert got["a"]["n_rows"] == 4 and got["a"]["n_filled"] == 3
    assert got["a"]["ndv"] == 2 and got["a"]["min_value"] == 1.0
    assert got["a"]["max_value"] == 2.0 and got["a"]["sum_value"] == 5.0
    assert got["b"]["ndv"] == 2 and got["b"]["sum_value"] == 50.0
    # one aggregation job regardless of column count: single Exchange
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        profile_numeric(df, ["a", "b"]).explain("formatted")
    import re

    n = sum(
        1
        for m in re.finditer(r"^\(\d+\) (ReusedExchange|Exchange)", buf.getvalue(), re.M)
        if m.group(1) == "Exchange"
    )
    assert n <= 3
