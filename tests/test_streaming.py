"""Streaming ingestion + windowed aggregation tests (file source)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from moisturizer_spark.registry import Registry
from moisturizer_spark.session import load_tables
from moisturizer_spark.streaming import (
    file_envelope_stream,
    session_window_stats,
    start_ingest_stream,
    tumbling_counts,
)


def _write_envelopes(path: str, name: str, payloads) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as fh:
        for p in payloads:
            fh.write(json.dumps(p) + "\n")


def test_stream_ingest_end_to_end(spark, warehouse):
    src = os.path.join(warehouse, "incoming")
    _write_envelopes(
        src,
        "batch1.json",
        [
            {"type_id": "sensor", "data": json.dumps({"id": "s1", "temp": 20.5})},
            {"type_id": "sensor", "data": json.dumps({"id": "s2", "temp": 21.0})},
            {"type_id": "click", "data": json.dumps({"id": "c1", "path": "/x"})},
            {"data": json.dumps({"id": "zz"})},  # poison: no type_id
        ],
    )
    registry = Registry(spark, os.path.join(warehouse, "wh"))
    q = start_ingest_stream(
        registry, file_envelope_stream(spark, src), os.path.join(warehouse, "ckpt")
    )
    q.awaitTermination(120)
    assert registry.table("sensor").read().count() == 2
    assert registry.table("click").read().count() == 1

    # second file arrives: update + schema evolution; checkpoint resumes
    _write_envelopes(
        src,
        "batch2.json",
        [
            {"type_id": "sensor", "data": json.dumps({"id": "s1", "temp": 25.0, "hum": 40})},
        ],
    )
    q2 = start_ingest_stream(
        registry, file_envelope_stream(spark, src), os.path.join(warehouse, "ckpt")
    )
    q2.awaitTermination(120)
    rows = {r["id"]: r.asDict() for r in registry.table("sensor").read().collect()}
    assert str(rows["s1"]["temp"]) == "25.000000000000000000"
    assert rows["s1"]["hum"] == 40
    assert rows["s2"]["hum"] is None  # evolved column backfills null
    assert registry.table("sensor").read().count() == 2  # upsert, not append


def test_tumbling_counts_streaming_matches_batch(spark, sf_dir, warehouse):
    events = load_tables(spark, sf_dir, ("events",))["events"]
    batch_result = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in tumbling_counts(events, "6 hours").collect()
    }
    # stream the same rows through a file source
    src = os.path.join(warehouse, "ev")
    events.select(
        "event_id", F.col("ts").cast("string").alias("ts"), "user_id", "event_type", "value"
    ).coalesce(1).write.mode("overwrite").json(src)
    stream = (
        spark.readStream.schema("event_id long, ts string, user_id long, event_type string, value double")
        .json(src)
        .withColumn("ts", F.to_timestamp("ts"))
    )
    q = (
        tumbling_counts(stream, "6 hours")
        .writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_result = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    assert stream_result == batch_result
    assert sum(batch_result.values()) == events.count()


def test_session_window_stats_batch(spark, sf_dir):
    events = load_tables(spark, sf_dir, ("events",))["events"]
    sess = session_window_stats(events, gap="30 minutes")
    # session windows partition each user's events completely
    assert sess.agg(F.sum("n_events")).collect()[0][0] == events.count()
    row = sess.limit(1).collect()[0]
    assert row["session_end"] > row["session_start"]
