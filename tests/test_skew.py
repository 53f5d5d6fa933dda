"""Salted join must be result-identical to the plain join on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from moisturizer_spark.operators.skew import hot_keys, salted_join


def _skewed(spark):
    # 10k rows on one hot key, a few on others
    left = spark.range(10_000).select(
        F.when(F.col("id") < 9_000, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 7).cast("string"))
        ).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.createDataFrame(
        [("hot", 1), ("hot", 2), ("k1", 3), ("missing", 4)], "k string, rv int"
    )
    return left, right


def test_salted_inner_matches_plain(spark):
    left, right = _skewed(spark)
    plain = left.join(right, ["k"], "inner")
    salted = salted_join(left, right, ["k"], "inner", salt=4)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_matches_plain(spark):
    left, right = _skewed(spark)
    plain = left.join(right, ["k"], "left")
    salted = salted_join(left, right, ["k"], "left", salt=4)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_rejects_outer(spark):
    left, right = _skewed(spark)
    try:
        salted_join(left, right, ["k"], "full")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_hot_keys_detects(spark):
    left, _ = _skewed(spark)
    hot = hot_keys(left, ["k"], min_rows=1000).collect()
    assert [r["k"] for r in hot] == ["hot"]
    assert hot[0]["n_rows"] == 9_000


def test_key_skew_report_exact_planted(spark):
    from moisturizer_spark.operators.skew import key_skew_report

    rows = [("a",)] * 1 + [("b",)] * 3
    df = spark.createDataFrame(rows, "k string")
    r = key_skew_report(df, ["k"]).collect()[0]
    assert (r["n_keys"], r["n_rows"], r["max_key_rows"]) == (2, 4, 3)
    assert r["max_key_share"] == 0.75
    # counts sorted [1, 3]: G = (2*(1*1 + 2*3) - 3*4) / (2*4) = 0.25
    assert r["gini"] == 0.25
    assert r["p_lo"] == 2.0  # interpolated median of [1, 3]


def test_key_skew_report_uniform_vs_hot(spark):
    from moisturizer_spark.operators.skew import key_skew_report

    uniform = spark.createDataFrame(
        [(f"k{i % 20}",) for i in range(200)], "k string"
    )
    hot = spark.createDataFrame(
        [("hot",)] * 181 + [(f"k{i}",) for i in range(19)], "k string"
    )
    gu = key_skew_report(uniform, ["k"]).collect()[0]
    gh = key_skew_report(hot, ["k"]).collect()[0]
    assert gu["gini"] == 0.0 and gu["max_key_share"] == 0.05
    assert gh["gini"] > 0.8 and gh["max_key_share"] == 0.905


def test_key_skew_report_matches_numpy_percentiles(spark):
    import random

    import numpy as np

    from moisturizer_spark.operators.skew import key_skew_report

    rng = random.Random(5)
    rows = [(f"k{rng.randrange(30)}",) for _ in range(500)]
    df = spark.createDataFrame(rows, "k string")
    r = key_skew_report(df, ["k"]).collect()[0]
    from collections import Counter

    counts = sorted(Counter(k for k, in rows).values())
    assert abs(r["p_lo"] - np.percentile(counts, 50)) < 1e-9
    assert abs(r["p_hi"] - np.percentile(counts, 99)) < 1e-9
    x = counts
    n = len(x)
    g = (2 * sum((i + 1) * v for i, v in enumerate(x)) - (n + 1) * sum(x)) / (
        n * sum(x)
    )
    assert abs(r["gini"] - g) < 1e-6
