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
