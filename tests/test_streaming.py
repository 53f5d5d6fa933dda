"""Streaming ingestion + windowed aggregation tests (file source)."""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

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


def test_kafka_contract_fake_broker_e2e(spark, warehouse):
    """Drive kafka_envelope_stream's option wiring (subscribe /
    startingOffsets / maxOffsetsPerTrigger) through a protocol-level
    fake broker: ≥2 rate-limited micro-batches, checkpointed restart,
    exactly-once results."""
    from moisturizer_spark.streaming import fake_kafka
    from moisturizer_spark.streaming.ingest_stream import kafka_envelope_stream

    fake_kafka.register(spark)
    log_dir = os.path.join(warehouse, "broker_log")
    ckpt = os.path.join(warehouse, "kckpt")
    fake_kafka.append_messages(
        log_dir,
        "events",
        [
            {"type_id": "reading", "data": json.dumps({"id": f"r{i}", "v": i})}
            for i in range(5)
        ],
    )
    registry = Registry(spark, os.path.join(warehouse, "kwh"))

    def run_stream():
        env = kafka_envelope_stream(
            spark,
            "fake-broker:9092",
            ["events"],
            starting_offsets="earliest",
            max_offsets_per_trigger=2,
            source_format="kafka_fake",
            extra_options={"log.dir": log_dir},
        )
        q = start_ingest_stream(registry, env, ckpt, available_now=False)
        q.processAllAvailable()
        q.stop()

    run_stream()
    rows = {r["id"]: int(r["v"]) for r in registry.table("reading").read().collect()}
    assert rows == {f"r{i}": i for i in range(5)}

    # rate limit honored ⇒ the 5 messages needed ≥ 3 micro-batches, and
    # no planned batch advanced more than 2 offsets
    offsets_dir = os.path.join(ckpt, "offsets")
    batch_ends = []
    for name in sorted(os.listdir(offsets_dir), key=lambda s: int(s) if s.isdigit() else -1):
        if not name.isdigit():
            continue
        with open(os.path.join(offsets_dir, name)) as fh:
            lines = [ln.strip() for ln in fh if ln.strip()]
        end = json.loads(lines[-1])
        if isinstance(end, dict) and "events" in end:
            batch_ends.append(end["events"])
    assert len(batch_ends) >= 3, batch_ends
    prev = 0
    for e in batch_ends:
        assert e - prev <= 2, batch_ends
        prev = e

    # restart from the checkpoint after new messages land: old offsets
    # are not re-read (no duplicate upserts), new ones arrive
    fake_kafka.append_messages(
        log_dir,
        "events",
        [
            {"type_id": "reading", "data": json.dumps({"id": "r5", "v": 50})},
            {"type_id": "reading", "data": json.dumps({"id": "r0", "v": 100})},
        ],
    )
    run_stream()
    rows = {r["id"]: int(r["v"]) for r in registry.table("reading").read().collect()}
    assert rows == {**{f"r{i}": i for i in range(1, 5)}, "r5": 50, "r0": 100}


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


def _event_stream(spark, src):
    return (
        spark.readStream.schema(
            "event_id long, ts string, user_id long, event_type string, value double"
        )
        .json(src)
        .withColumn("ts", F.to_timestamp("ts"))
    )


def _write_events(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def test_running_user_stats_accumulates_across_batches(spark, warehouse):
    from moisturizer_spark.streaming import running_user_stats

    src = os.path.join(warehouse, "ev")
    ckpt = os.path.join(warehouse, "ckpt")
    _write_events(src, "b1.json", [
        {"event_id": 1, "ts": "2024-01-01 10:00:00", "user_id": 7, "event_type": "click", "value": 1.5},
        {"event_id": 2, "ts": "2024-01-01 10:05:00", "user_id": 7, "event_type": "view", "value": 2.0},
        {"event_id": 3, "ts": "2024-01-01 10:06:00", "user_id": 8, "event_type": "click", "value": 4.0},
    ])

    out = os.path.join(warehouse, "out")

    def drain(qname):
        q = (
            running_user_stats(_event_stream(spark, src))
            .writeStream.foreachBatch(
                lambda bdf, bid: bdf.write.mode("append").parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # latest emission per user = current running totals
        rows = sorted(
            spark.read.parquet(out).collect(), key=lambda r: r["n_events"]
        )
        return {r["user_id"]: r for r in rows}

    got = drain("running1")
    assert got[7]["n_events"] == 2 and abs(got[7]["sum_value"] - 3.5) < 1e-9
    assert got[8]["n_events"] == 1

    # second batch: state carries over the checkpoint restart
    _write_events(src, "b2.json", [
        {"event_id": 4, "ts": "2024-01-01 10:30:00", "user_id": 7, "event_type": "click", "value": 10.0},
    ])
    got = drain("running2")
    assert got[7]["n_events"] == 3 and abs(got[7]["sum_value"] - 13.5) < 1e-9
    assert got[7]["last_ts"].minute == 30


def test_stream_dedup_by_id_emits_first_only(spark, warehouse):
    from moisturizer_spark.streaming import stream_dedup_by_id

    src = os.path.join(warehouse, "ev")
    ckpt = os.path.join(warehouse, "ckpt")
    _write_events(src, "b1.json", [
        {"event_id": 1, "ts": "2024-01-01 10:00:00", "user_id": 7, "event_type": "click", "value": 1.0},
        {"event_id": 1, "ts": "2024-01-01 10:00:00", "user_id": 7, "event_type": "click", "value": 1.0},
        {"event_id": 2, "ts": "2024-01-01 10:01:00", "user_id": 8, "event_type": "view", "value": 2.0},
    ])

    out = os.path.join(warehouse, "out")
    seen_total = []

    def drain(qname):
        q = (
            stream_dedup_by_id(_event_stream(spark, src))
            .writeStream.foreachBatch(
                lambda bdf, bid: bdf.write.mode("append").parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        ids = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
        new = [i for i in ids if i not in seen_total]
        seen_total.extend(new)
        return new

    assert sorted(drain("dedup1")) == [1, 2]
    # replayed + one new id in the next batch: only the new id emits
    _write_events(src, "b2.json", [
        {"event_id": 1, "ts": "2024-01-01 10:02:00", "user_id": 7, "event_type": "click", "value": 1.0},
        {"event_id": 9, "ts": "2024-01-01 10:03:00", "user_id": 9, "event_type": "view", "value": 3.0},
    ])
    assert sorted(drain("dedup2")) == [9]


def test_compact_warehouse_bounds_files(spark, tmp_path):
    import json as _json

    from pyspark.sql import Row

    from moisturizer_spark.ingest import IngestEngine
    from moisturizer_spark.registry import Registry

    reg = Registry(spark, str(tmp_path / "wh"))
    engine = IngestEngine(reg)
    mk = lambda i: spark.createDataFrame(
        [Row(type_id="t", data=_json.dumps({"id": str(k), "v": i})) for k in range(i * 20, i * 20 + 20)]
        + [Row(type_id=None, data="{}")]  # one dead letter per batch
    )
    for i in range(4):
        engine.ingest_batch(mk(i), batch_id=i)

    table = reg.table("t")
    after = engine.compact_warehouse(target_file_bytes=1 << 30)
    assert after["t"] <= table.n_buckets
    assert after["_dead_letters"] >= 1
    # data intact post-compaction
    assert table.read().count() == 80
    assert engine.dead_letters().count() == 4


def test_stream_dedup_within_watermark(spark, warehouse):
    """Built-in event-time dedup: duplicates within the watermark delay
    are suppressed (in-batch and across batches); once the watermark has
    evicted a key's state, a far-later duplicate re-emits — the bounded-
    state residue the docstring promises."""
    from moisturizer_spark.streaming import stream_dedup_within_watermark

    src = os.path.join(warehouse, "ev")
    ckpt = os.path.join(warehouse, "ckpt")
    out = os.path.join(warehouse, "out")

    def drain():
        q = (
            stream_dedup_within_watermark(
                _event_stream(spark, src), watermark="10 minutes"
            )
            .writeStream.foreachBatch(
                lambda bdf, bid: bdf.write.mode("append").parquet(out)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            (r["event_id"], r["ts"].strftime("%H:%M"))
            for r in spark.read.parquet(out).collect()
        )

    _write_events(src, "b1.json", [
        {"event_id": 1, "ts": "2024-01-01 10:00:00", "user_id": 7, "event_type": "c", "value": 1.0},
        {"event_id": 1, "ts": "2024-01-01 10:00:30", "user_id": 7, "event_type": "c", "value": 1.0},
        {"event_id": 2, "ts": "2024-01-01 10:01:00", "user_id": 8, "event_type": "v", "value": 2.0},
    ])
    assert drain() == [(1, "10:00"), (2, "10:01")]  # in-batch dup suppressed

    # replay id 1 inside the delay: still suppressed; id 3 an hour later
    # advances the watermark past id 1's state lifetime
    _write_events(src, "b2.json", [
        {"event_id": 1, "ts": "2024-01-01 10:02:00", "user_id": 7, "event_type": "c", "value": 1.0},
        {"event_id": 3, "ts": "2024-01-01 11:00:00", "user_id": 9, "event_type": "v", "value": 3.0},
    ])
    assert drain() == [(1, "10:00"), (2, "10:01"), (3, "11:00")]

    # watermark is now ~10:50 > 10:00 + 10min: id 1's marker is gone,
    # a late duplicate re-emits (bounded state, documented tradeoff)
    _write_events(src, "b3.json", [
        {"event_id": 1, "ts": "2024-01-01 11:05:00", "user_id": 7, "event_type": "c", "value": 1.0},
    ])
    assert drain() == [(1, "10:00"), (1, "11:05"), (2, "10:01"), (3, "11:00")]


def test_stream_dedup_within_watermark_batch_fallback(spark):
    from moisturizer_spark.streaming import stream_dedup_within_watermark

    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:00:30"), (2, "2024-01-01 10:01:00")],
        "event_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = stream_dedup_within_watermark(df)
    assert out.count() == 2  # kappa symmetry: plain dropDuplicates in batch


def test_stream_interval_join_matches_batch(spark, sf_dir, warehouse):
    from moisturizer_spark.streaming.joins import stream_interval_join

    events = load_tables(spark, sf_dir, ("events",))["events"]
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "event_id", "ts", "user_id"
    )
    batch = stream_interval_join(purchases, views, lookback="1 hour").select(
        "event_id", "event_id_right"
    )
    batch_pairs = {(r[0], r[1]) for r in batch.collect()}
    assert batch_pairs, "fixture must produce at least one in-window pair"

    # identical operator over file-backed streams
    src_p, src_v = os.path.join(warehouse, "p"), os.path.join(warehouse, "v")
    for df, src in ((purchases, src_p), (views, src_v)):
        df.select(
            "event_id", F.col("ts").cast("string").alias("ts"), "user_id"
        ).coalesce(1).write.mode("overwrite").json(src)
    schema = "event_id long, ts string, user_id long"

    def stream(src):
        return (
            spark.readStream.schema(schema)
            .json(src)
            .withColumn("ts", F.to_timestamp("ts"))
        )

    q = (
        stream_interval_join(stream(src_p), stream(src_v), lookback="1 hour")
        .select("event_id", "event_id_right")
        .writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_pairs = {
        (r[0], r[1]) for r in spark.sql("SELECT * FROM ssj_test").collect()
    }
    assert stream_pairs == batch_pairs


def _has_protobuf() -> bool:
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas drives its state-server protocol "
    "over protobuf; package absent in this container (operator is "
    "import-gated the same way msgpack/cassandra paths are)",
)
def test_running_user_topk_transform_with_state(spark, warehouse):
    """The Spark-4 arbitrary-state API (transformWithStateInPandas +
    RocksDB state store): per-user top-k survives micro-batch boundaries
    AND a checkpoint restart; state stays O(k) per key."""
    from moisturizer_spark.streaming import ROCKSDB_PROVIDER, running_user_topk

    src = os.path.join(warehouse, "ev_v2")
    ckpt = os.path.join(warehouse, "ckpt_v2")
    out = os.path.join(warehouse, "out_v2")
    _write_events(src, "b1.json", [
        {"event_id": 1, "ts": "2024-01-01 10:00:00", "user_id": 7, "event_type": "c", "value": 1.5},
        {"event_id": 2, "ts": "2024-01-01 10:05:00", "user_id": 7, "event_type": "v", "value": 9.0},
        {"event_id": 3, "ts": "2024-01-01 10:06:00", "user_id": 7, "event_type": "c", "value": 5.0},
        {"event_id": 4, "ts": "2024-01-01 10:07:00", "user_id": 8, "event_type": "c", "value": 2.0},
    ])

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        def drain():
            q = (
                running_user_topk(_event_stream(spark, src), k=2)
                .writeStream.foreachBatch(
                    lambda bdf, bid: bdf.write.mode("append").parquet(out)
                )
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            rows = sorted(spark.read.parquet(out).collect(),
                          key=lambda r: r["n_events"])
            return {r["user_id"]: r for r in rows}

        got = drain()
        assert got[7]["n_events"] == 3
        assert list(got[7]["top_values"]) == [9.0, 5.0]  # k=2 survivors only
        assert list(got[8]["top_values"]) == [2.0]

        # value 7.5 displaces 5.0 after the restart -> state carried over
        _write_events(src, "b2.json", [
            {"event_id": 5, "ts": "2024-01-01 10:30:00", "user_id": 7, "event_type": "c", "value": 7.5},
        ])
        got = drain()
        assert got[7]["n_events"] == 4
        assert list(got[7]["top_values"]) == [9.0, 7.5]
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_stream_banded_interval_join_keyless(spark, sf_dir, warehouse):
    """The banded stream-stream join must (a) match the batch banded
    operator pair-for-pair, and (b) exist for a reason: the same
    keyless join WITHOUT banding is rejected by Structured Streaming's
    no-equality-predicate rule."""
    from moisturizer_spark.operators.asof import banded_interval_join
    from moisturizer_spark.streaming.joins import stream_banded_interval_join

    events = load_tables(spark, sf_dir, ("events",))["events"]
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"), F.col("ts").alias("vts")
    )
    batch = banded_interval_join(
        purchases, views, "ts", "vts", -120, 120, right_payload=["vid"]
    )
    batch_pairs = {(r.event_id, r.vid_right) for r in batch.collect()}
    assert batch_pairs, "fixture must produce at least one in-window pair"

    src_p, src_v = os.path.join(warehouse, "bp"), os.path.join(warehouse, "bv")
    purchases.select(
        "event_id", F.col("ts").cast("string").alias("ts")
    ).coalesce(1).write.mode("overwrite").json(src_p)
    views.select(
        "vid", F.col("vts").cast("string").alias("vts")
    ).coalesce(1).write.mode("overwrite").json(src_v)

    def stream(src, schema, ts):
        return (
            spark.readStream.schema(schema)
            .json(src)
            .withColumn(ts, F.to_timestamp(ts))
        )

    sp = stream(src_p, "event_id long, ts string", "ts")
    sv = stream(src_v, "vid long, vts string", "vts")

    # (b) the unbanded keyless range join is not a legal streaming plan
    naive = sp.join(
        sv,
        (F.col("vts") >= F.col("ts") - F.expr("INTERVAL 120 SECONDS"))
        & (F.col("vts") <= F.col("ts") + F.expr("INTERVAL 120 SECONDS")),
    )
    with pytest.raises(Exception, match="(?i)equality|not supported"):
        (
            naive.writeStream.format("memory")
            .queryName("naive_keyless")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination(60)
        )

    # (a) the banded join runs and matches batch exactly
    q = (
        stream_banded_interval_join(
            sp, sv, "ts", "vts", -120, 120, right_payload=("vid",)
        )
        .select("event_id", "vid_right")
        .writeStream.format("memory")
        .queryName("banded_keyless")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_pairs = {
        (r[0], r[1])
        for r in spark.sql("SELECT * FROM banded_keyless").collect()
    }
    assert stream_pairs == batch_pairs


def test_stream_banded_interval_join_batch_mode(spark, sf_dir):
    """The docstring's one-code-path claim: the streaming operator run
    on BATCH frames (watermarks no-op) equals the batch banded operator
    exactly — so backfills can reuse the streaming definition."""
    from moisturizer_spark.operators.asof import banded_interval_join
    from moisturizer_spark.streaming.joins import stream_banded_interval_join

    events = load_tables(spark, sf_dir, ("events",))["events"]
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"), F.col("ts").alias("vts")
    )
    via_stream_op = {
        (r.event_id, r.vid_right)
        for r in stream_banded_interval_join(
            purchases, views, "ts", "vts", -120, 120, right_payload=("vid",)
        ).collect()
    }
    via_batch_op = {
        (r.event_id, r.vid_right)
        for r in banded_interval_join(
            purchases, views, "ts", "vts", -120, 120, right_payload=["vid"]
        ).collect()
    }
    assert via_stream_op == via_batch_op and via_stream_op


def test_stream_metrics_recorder_captures_batches(spark, warehouse):
    """The observability listener must record one row per micro-batch
    with real input counts, state sizes for stateful queries, and a
    populated watermark; flush() must be append-exact (no dup batches)."""
    from moisturizer_spark.streaming.observability import (
        StreamMetricsRecorder,
        lag_report,
    )

    src = os.path.join(warehouse, "obs_src")
    _write_events(
        src,
        "a.json",
        [
            {
                "event_id": i,
                "ts": f"2024-01-01 00:{i:02d}:00",
                "user_id": i % 3,
                "event_type": "view",
                "value": 1.0,
            }
            for i in range(30)
        ],
    )
    rec = StreamMetricsRecorder().attach(spark)
    try:
        stream = (
            spark.readStream.schema(
                "event_id long, ts string, user_id long, event_type string, value double"
            )
            .json(src)
            .withColumn("ts", F.to_timestamp("ts"))
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes"))
            .count()
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("obs_test")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener events are delivered asynchronously on the bus thread
        import time as _t

        for _ in range(50):
            if rec.snapshot(spark).count() > 0:
                break
            _t.sleep(0.2)
        snap = rec.snapshot(spark).filter(F.col("run_id") == str(q.runId))
        rows = snap.collect()
        assert rows, "no progress events captured"
        assert sum(r.num_input_rows for r in rows) == 30
        assert any(r.n_state_operators > 0 and r.state_rows > 0 for r in rows)
        assert any(r.watermark is not None for r in rows)

        report = lag_report(snap).collect()
        assert {r.batch_id for r in report} == {r.batch_id for r in rows}

        path = os.path.join(warehouse, "obs_metrics")
        n1 = rec.flush(spark, path)
        n2 = rec.flush(spark, path)  # buffer cleared: nothing to write
        assert n1 >= len(rows) and n2 == 0
        back = spark.read.parquet(path)
        assert back.count() == n1
    finally:
        rec.detach(spark)


def test_stream_banded_join_state_evicts_behind_watermark(spark, warehouse):
    """The O(in-flight window) claim, measured: drive the keyless banded
    join over multiple micro-batches whose event times advance far past
    the watermark + band span, and read the state-store size per batch
    off the observability recorder — final state must hold only the
    tail's rows, not the whole stream."""
    from moisturizer_spark.streaming.joins import stream_banded_interval_join
    from moisturizer_spark.streaming.observability import StreamMetricsRecorder

    src = os.path.join(warehouse, "evict_src")
    os.makedirs(src, exist_ok=True)
    # 3 files = 3 micro-batches (maxFilesPerTrigger=1), each a day apart:
    # with a 1-hour watermark and ±120s span, batch N's rows are evictable
    # as soon as batch N+1 arrives.
    for day, name in ((1, "b1.json"), (2, "b2.json"), (3, "b3.json")):
        with open(os.path.join(src, name), "w") as fh:
            for i in range(50):
                fh.write(
                    json.dumps(
                        {
                            "event_id": day * 1000 + i,
                            "ts": f"2024-01-0{day} 00:{i:02d}:00",
                        }
                    )
                    + "\n"
                )

    def stream():
        return (
            spark.readStream.schema("event_id long, ts string")
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .withColumn("ts", F.to_timestamp("ts"))
        )

    rec = StreamMetricsRecorder().attach(spark)
    try:
        joined = stream_banded_interval_join(
            stream(),
            stream().select(
                F.col("event_id").alias("rid"), F.col("ts").alias("rts")
            ),
            "ts",
            "rts",
            -120,
            120,
            watermark="1 hour",
            right_payload=("rid",),
        )
        q = (
            joined.select("event_id", "rid_right")
            .writeStream.format("memory")
            .queryName("evict_test")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        import time as _t

        for _ in range(50):
            snap = rec.snapshot(spark).filter(
                F.col("run_id") == str(q.runId)
            )
            if snap.count() >= 3:
                break
            _t.sleep(0.2)
        rows = sorted(
            snap.collect(), key=lambda r: r.batch_id
        )
        assert len(rows) >= 3
        peak = max(r.state_rows for r in rows)
        final = rows[-1].state_rows
        total = 150 * 2  # both sides buffered
        # eviction happened: the store never held the whole stream, and
        # the final batch's state is far below the peak-cumulative bound
        assert peak < total, (peak, total)
        assert final <= peak
    finally:
        rec.detach(spark)


def test_stream_pit_enrichment_uses_event_time_version(spark, tmp_path):
    """pit_join works UNCHANGED as a stream-static enrichment: each
    streaming fact row joins the dimension version valid at its EVENT
    time — a late-arriving event enriches with the historical version,
    not the current one (the leakage a naive current-dim join causes)."""
    import os

    from moisturizer_spark.operators.asof import pit_join

    src = os.path.join(str(tmp_path), "facts")
    os.makedirs(src)
    with open(os.path.join(src, "b1.json"), "w") as fh:
        for fid, ts in ((1, 5), (2, 15), (3, 25)):  # 3 event times
            fh.write(json.dumps({"key": "k", "fid": fid, "ts": ts}) + "\n")
    dim = spark.createDataFrame(
        [("k", "old", 0, 10), ("k", "mid", 10, 20), ("k", "new", 20, None)],
        "key string, tier string, valid_from int, valid_to int",
    )
    stream = (
        spark.readStream.schema("key string, fid int, ts int")
        .json(src)
    )
    enriched = pit_join(stream, dim, "key", "ts")
    q = (
        enriched.writeStream.format("memory")
        .queryName("pit_enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["fid"]: r["tier_dim"]
        for r in spark.sql("SELECT * FROM pit_enriched").collect()
    }
    # event at t=5 gets the OLD version even though 'new' is current
    assert got == {1: "old", 2: "mid", 3: "new"}
