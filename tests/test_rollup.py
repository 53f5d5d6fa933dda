"""Continuous rollup: incremental result == full batch recompute."""

from __future__ import annotations

import json

from pyspark.sql import functions as F, types as T

from moisturizer_spark.storage import ParquetTable
from moisturizer_spark.streaming.rollup import continuous_rollup, read_rollup

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_batch(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    f = path / f"part-{len(list(path.iterdir()))}.jsonl"
    f.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _drain(spark, src, table, ckpt):
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = continuous_rollup(stream, table, checkpoint_dir=str(ckpt))
    q.awaitTermination(120)


def test_incremental_rollup_matches_batch(spark, tmp_path):
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    table = ParquetTable(spark, str(tmp_path / "rollup"), key="bucket")

    batch1 = [
        {"ts": "2024-01-01T10:00:00", "event_type": "click", "value": 1.0},
        {"ts": "2024-01-01T11:00:00", "event_type": "click", "value": 3.0},
        {"ts": "2024-01-02T09:00:00", "event_type": "view", "value": 5.0},
    ]
    # batch 2 includes LATE data for Jan 1 — must merge into the old bucket
    batch2 = [
        {"ts": "2024-01-01T23:00:00", "event_type": "click", "value": 10.0},
        {"ts": "2024-01-02T10:00:00", "event_type": "view", "value": 7.0},
        {"ts": "2024-01-03T08:00:00", "event_type": "click", "value": 2.0},
    ]

    _write_batch(src, batch1)
    _drain(spark, src, table, ckpt)
    _write_batch(src, batch2)
    _drain(spark, src, table, ckpt)

    got = {
        (str(r["bucket"]), r["event_type"]): (
            r["n_events"],
            float(r["sum_value"]),
            r["min_value"],
            r["max_value"],
            r["avg_value"],
        )
        for r in read_rollup(table).collect()
    }

    all_rows = spark.createDataFrame(
        [tuple(r.values()) for r in batch1 + batch2], "ts string, event_type string, value double"
    ).select(F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
    expected = {
        (str(r["bucket"]), r["event_type"]): (
            r["n"],
            float(r["s"]),
            r["mn"],
            r["mx"],
            r["s"] / r["n"],
        )
        for r in all_rows.groupBy(
            F.date_trunc("day", "ts").alias("bucket"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert got == expected


def test_apply_batch_replay_is_idempotent(spark, tmp_path):
    # a micro-batch replayed after crash-before-checkpoint must NOT
    # double-count into the additive aggregates (exactly-once contract)
    from moisturizer_spark.streaming.rollup import TXN_APP, apply_batch

    table = ParquetTable(spark, str(tmp_path / "rollup"), key="bucket")
    batch = spark.createDataFrame(
        [("2024-01-01T10:00:00", "click", 2.0), ("2024-01-01T11:00:00", "click", 4.0)],
        "ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    assert apply_batch(table, batch, batch_id=0) is True
    first = {(r["bucket"], r["event_type"]): (r["n_events"], float(r["sum_value"]))
             for r in table.read().collect()}

    # replay of the SAME batch id: skipped, table unchanged
    assert apply_batch(table, batch, batch_id=0) is False
    replayed = {(r["bucket"], r["event_type"]): (r["n_events"], float(r["sum_value"]))
                for r in table.read().collect()}
    assert replayed == first
    assert table.txn_version(TXN_APP) == 0

    # the NEXT batch id applies normally
    assert apply_batch(table, batch, batch_id=1) is True
    assert table.txn_version(TXN_APP) == 1
    doubled = {k: v for k, v in (
        ((r["bucket"], r["event_type"]), (r["n_events"], float(r["sum_value"])))
        for r in table.read().collect())}
    (k,) = doubled.keys() & first.keys()
    assert doubled[k][0] == 2 * first[k][0]
