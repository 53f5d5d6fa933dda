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
