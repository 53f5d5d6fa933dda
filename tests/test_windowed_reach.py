"""Windowed reach sketch (operators/sketches.py) — the linear scale
path for sliding-window distinct users that the round-10 sf1 probe
motivated (events_coactivity's exact pair frame is density-quadratic).

Checks: covering-span semantics on a planted timeline, accuracy
against the exact distinct over the same covering span on real sf0.001
events, and the linear-work plan shape (no probe×event join)."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import functions as F

from moisturizer_spark.operators.sketches import (
    windowed_reach_probe,
    windowed_reach_sketch,
)


def test_planted_covering_span_semantics(spark):
    """bucket 10s, window ±10s: probe at t=25 covers buckets 1..3 =
    [10, 40). Users in that span count; a user only at t=45 does not."""
    base = "2024-01-01 00:00:"
    rows = [
        (f"{base}05", 1),   # bucket 0 — OUTSIDE covering span
        (f"{base}12", 2),   # bucket 1 — in
        (f"{base}25", 3),   # bucket 2 — in
        (f"{base}39", 4),   # bucket 3 — in
        (f"{base}45", 5),   # bucket 4 — OUTSIDE
        (f"{base}13", 2),   # duplicate user, must not double-count
    ]
    ev = spark.createDataFrame(rows, "ts string, user_id long")
    cells = windowed_reach_sketch(ev, "ts", "user_id", bucket_s=10)
    probes = spark.createDataFrame(
        [(100, f"{base}25")], "probe_id long, ts string"
    )
    got = windowed_reach_probe(
        probes, cells, "ts", -10, 10, 10, ["probe_id"]
    ).collect()
    assert len(got) == 1
    # 3 distinct users in the covering span; linear-counting regime is
    # tight at tiny cardinalities — allow ±1
    assert abs(got[0]["approx_users"] - 3) <= 1


def test_accuracy_vs_exact_on_events(spark, sf_dir):
    """On real sf0.001 events: per-purchase estimates track the EXACT
    distinct-user count over the same covering bucket span (median
    relative error under 20% — the det-HLL m=64 envelope)."""
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "ts", "user_id", "event_type")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").limit(200)
    cells = windowed_reach_sketch(ev, "ts", "user_id", bucket_s=120)
    approx = windowed_reach_probe(
        purchases, cells, "ts", -120, 120, 120, ["event_id"]
    )
    # exact distinct over the same covering buckets
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    evb = ev.select(
        F.col("user_id").alias("_u"),
        F.floor(epoch / 120).cast("bigint").alias("_wb"),
    )
    lo = F.floor((epoch - 120) / 120)
    hi = F.floor((epoch + 120) / 120)
    pb = purchases.select(
        "event_id", F.explode(F.sequence(lo, hi)).alias("_wb")
    )
    exact = (
        pb.join(evb, "_wb")
        .groupBy("event_id")
        .agg(F.count_distinct("_u").alias("exact_users"))
    )
    rows = approx.join(exact, "event_id").collect()
    assert rows, "no purchases matched"
    rel = sorted(
        abs(r["approx_users"] - r["exact_users"]) / max(r["exact_users"], 1)
        for r in rows
    )
    assert rel[len(rel) // 2] < 0.2, f"median rel err {rel[len(rel)//2]}"


def test_plan_has_no_event_grain_pair_join(spark, sf_dir):
    """The probe plan joins probes×buckets to CELLS (≤ m rows per
    bucket), never probes×events: the events parquet appears exactly
    once in the composed plan (the cell build), and the pair frame the
    exact query shuffles is absent."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cells = windowed_reach_sketch(ev, "ts", "user_id", 120)
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts"
    )
    plan_df = windowed_reach_probe(
        probes, cells, "ts", -120, 120, 120, ["event_id"]
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    # the formatted plan prints each node twice (tree + detail); count
    # the numbered detail entries only
    scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
    assert scans == 2  # one for cells, one for probes — never a third
