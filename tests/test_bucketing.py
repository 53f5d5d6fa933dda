"""Bucketed co-located join: zero exchanges, same results as plain join."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from moisturizer_spark.bucketing import colocated_join, write_bucketed
from moisturizer_spark.session import load_tables


def test_bucketed_join_has_no_exchange_and_matches(spark, sf_dir, tmp_path):
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    li = t["lineitem"].select("l_orderkey", "l_quantity")
    od = t["orders"].select("o_orderkey", "o_orderpriority")

    write_bucketed(li, "t_li_bucketed", ["l_orderkey"], 8)
    write_bucketed(od, "t_od_bucketed", ["o_orderkey"], 8)
    try:
        # disable broadcast so the join must pick SMJ — the exchange-free
        # property is what's under test, not join selection
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = colocated_join(
                spark,
                "t_li_bucketed",
                "t_od_bucketed",
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                j.explain("formatted")
            plan = buf.getvalue()
            assert "Exchange" not in plan, "bucketed join still shuffles"
            assert "SortMergeJoin" in plan

            expected = li.join(
                od, F.col("l_orderkey") == F.col("o_orderkey")
            ).count()
            assert j.count() == expected
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_od_bucketed")


def test_bucket_point_lookup_prunes(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("orders",))
    write_bucketed(t["orders"].select("o_orderkey", "o_totalprice"), "t_od_point", ["o_orderkey"], 8)
    try:
        # autoBucketedScan drops the bucketed layout (and with it bucket
        # pruning) when no join/agg wants the distribution — force it on
        # so the point lookup reads 1 of 8 buckets
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        key = t["orders"].select("o_orderkey").head(1)[0][0]
        df = spark.table("t_od_point").filter(F.col("o_orderkey") == key)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan[-1500:]
        assert df.count() >= 1
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
        spark.sql("DROP TABLE IF EXISTS t_od_point")
