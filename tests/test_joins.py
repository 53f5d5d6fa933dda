"""bloom_prefilter: result-preserving fact-side reduction."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F


def test_bloom_prefilter_preserves_join_result(spark):
    """No false negatives: prefilter + exact join == plain join, while
    non-joining rows demonstrably drop before the join."""
    from moisturizer_spark.operators.joins import bloom_prefilter

    big = spark.createDataFrame(
        [(i, f"v{i}") for i in range(2000)], "k bigint, payload string"
    )
    small = spark.createDataFrame(
        [(i,) for i in range(0, 2000, 97)], "k bigint"
    )
    pre = bloom_prefilter(big, "k", small, "k")
    joined = pre.join(small, "k")
    plain = big.join(small, "k")
    assert sorted(r["k"] for r in joined.collect()) == sorted(
        r["k"] for r in plain.collect()
    )
    # the prefilter really removed most non-members (1% fpp)
    assert pre.count() < 2000 * 0.1


def test_bloom_prefilter_string_keys(spark):
    from moisturizer_spark.operators.joins import bloom_prefilter

    big = spark.createDataFrame(
        [(f"id{i}",) for i in range(500)], "k string"
    )
    small = spark.createDataFrame([("id7",), ("id400",)], "k string")
    got = {r["k"] for r in bloom_prefilter(big, "k", small, "k")
           .join(small, "k").collect()}
    assert got == {"id7", "id400"}


def test_bloom_prefilter_empty_small_side(spark):
    from moisturizer_spark.operators.joins import bloom_prefilter

    big = spark.createDataFrame([(1,), (2,)], "k bigint")
    small = spark.createDataFrame([], "k bigint")
    assert bloom_prefilter(big, "k", small, "k").count() == 0


def test_bloom_prefilter_sits_before_the_join_exchange(spark):
    """The sketch must filter the big side at/near its scan — a Filter
    with might_contain BELOW the join, not a post-join residual."""
    from moisturizer_spark.operators.joins import bloom_prefilter

    big = spark.createDataFrame(
        [(i, i * 2) for i in range(100)], "k bigint, v bigint"
    )
    small = spark.createDataFrame([(3,), (4,)], "k bigint")
    pre = bloom_prefilter(big, "k", small, "k")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pre.join(small, "k").groupBy().agg(F.sum("v")).explain("formatted")
    plan = buf.getvalue()
    assert "xxhash64" in plan and "bit_get" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
