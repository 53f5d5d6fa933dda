"""Approximate-aggregate accuracy: HLL distinct counts vs exact.

The workload's `events_distinct_reach` keeps COUNT(DISTINCT) exact for
cross-engine hash-matching; this pins the scale path (one-pass HLL, no
expand) to within its advertised error so the swap-in is safe.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from moisturizer_spark.session import load_tables


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= max(0.05 * r["exact"], 2.0), r


def test_hll_reach_within_tolerance(spark, sf_dir):
    # HLL++ at rsd=0.023 should sit well within 5% of exact on every group
    import __spark_entry__ as em

    rows = em.queries()["events_hll_reach"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        err = abs(r["approx_users"] - r["exact_users"]) / max(r["exact_users"], 1)
        assert err <= 0.05, f"{r['event_type']}: HLL error {err:.3f}"


def test_frequent_items_equals_group_by_having(spark, sf_dir):
    from moisturizer_spark.operators.frequent import frequent_items
    from moisturizer_spark.session import load_tables

    events = load_tables(spark, sf_dir, ("events",))["events"]
    n = events.count()
    threshold = (n * 7 + 999) // 1000
    exact = {
        (r["user_id"], r["n"])
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= threshold)
        .collect()
    }
    got = {
        (r["user_id"], r["n"])
        for r in frequent_items(events, "user_id", support=(7, 1000)).collect()
    }
    assert got == exact and got  # non-trivial fixture


def test_frequent_items_tiny_support_and_validation(spark):
    import pytest
    from moisturizer_spark.operators.frequent import frequent_items

    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1, "k string"
    )
    got = {(r["k"], r["n"]) for r in frequent_items(df, "k", support=(3, 10)).collect()}
    assert got == {("a", 6), ("b", 3)}
    with pytest.raises(ValueError):
        frequent_items(df, "k", support=(0, 10))


def test_frequent_items_null_heavy_hitter_and_single_pass(spark):
    from moisturizer_spark.operators.frequent import frequent_items

    # null is the most common value: it must appear in the result with
    # its exact count (null-safe verify join), matching GROUP BY output
    df = spark.createDataFrame(
        [(None,)] * 5 + [("a",)] * 4 + [("b",)] * 1, "k string"
    )
    got = {(r["k"], r["n"]) for r in frequent_items(df, "k", support=(3, 10)).collect()}
    assert got == {(None, 5), ("a", 4)}

    # the candidate phase folds the global count into its one job — no
    # separate df.count() scan
    sc = spark.sparkContext
    sc.setJobGroup("fi_single_pass", "frequent_items candidate phase")
    try:
        frequent_items(df, "k", support=(3, 10))  # no action on the result
    finally:
        sc.setJobGroup(None, None)
    jobs = spark._jsc.sc().statusTracker().getJobIdsForGroup("fi_single_pass")
    assert len(jobs) == 1, f"candidate phase ran {len(jobs)} jobs, want 1"


def test_hll_rollup_merge_accuracy_and_losslessness(spark, sf_dir):
    from moisturizer_spark.operators.sketches import hll_merge_estimate, hll_rollup
    from moisturizer_spark.session import load_tables

    events = load_tables(spark, sf_dir, ("events",))["events"].withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    exact = {
        r["event_type"]: r["exact"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    daily = hll_rollup(events, ["day", "event_type"], "user_id")
    merged = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_merge_estimate(daily, ["event_type"]).collect()
    }
    assert set(merged) == set(exact)
    for et, ex in exact.items():
        assert abs(merged[et] - ex) / ex <= 0.05, (et, merged[et], ex)

    # lossless merge: sketching directly at the coarse grain estimates
    # the same as merging the stored fine-grained cells
    direct = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_merge_estimate(
            hll_rollup(events, ["event_type"], "user_id"), ["event_type"]
        ).collect()
    }
    assert merged == direct
