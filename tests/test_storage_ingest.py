"""Storage (LWW upsert) + vectorized ingestion tests — FIXTURES.md F1/F2."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import Row, functions as F, types as T

from moisturizer_spark.ingest import IngestEngine, decode_envelope_bytes, unwrap_envelope
from moisturizer_spark.registry import Registry
from moisturizer_spark.storage import ParquetTable


def ts(second):
    return dt.datetime(2024, 1, 1, 0, 0, second)


def test_upsert_last_write_wins(spark, warehouse):
    table = ParquetTable(spark, f"{warehouse}/t")
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("last_modified", T.TimestampType()),
            T.StructField("v", T.LongType()),
        ]
    )
    table.upsert(spark.createDataFrame([("a", ts(1), 1), ("b", ts(1), 2)], schema))
    # second batch: update a, insert c; within-batch dup on c → newest wins
    table.upsert(
        spark.createDataFrame(
            [("a", ts(2), 10), ("c", ts(2), 30), ("c", ts(3), 31)], schema
        )
    )
    got = {r["id"]: r["v"] for r in table.read().collect()}
    assert got == {"a": 10, "b": 2, "c": 31}


def test_upsert_schema_evolution_adds_columns(spark, warehouse):
    table = ParquetTable(spark, f"{warehouse}/t")
    s1 = T.StructType([T.StructField("id", T.StringType()), T.StructField("v", T.LongType())])
    s2 = T.StructType(list(s1.fields) + [T.StructField("w", T.StringType())])
    table.upsert(spark.createDataFrame([("a", 1)], s1))
    table.upsert(spark.createDataFrame([("b", 2, "x")], s2))
    rows = {r["id"]: r for r in table.read().collect()}
    assert rows["a"]["w"] is None and rows["b"]["w"] == "x"


def test_delete_where_returns_deleted(spark, warehouse):
    table = ParquetTable(spark, f"{warehouse}/t")
    s = T.StructType([T.StructField("id", T.StringType()), T.StructField("v", T.LongType())])
    table.upsert(spark.createDataFrame([("a", 1), ("b", 2)], s))
    deleted = table.delete_where(F.col("id") == "a").collect()
    assert [r["id"] for r in deleted] == ["a"]
    assert [r["id"] for r in table.read().collect()] == ["b"]


def test_decode_envelope_bytes_json():
    type_id, data = decode_envelope_bytes(b'{"type_id": "t", "data": {"x": 1}}')
    assert (type_id, data) == ("t", {"x": 1})
    with pytest.raises(ValueError):
        decode_envelope_bytes(b'{"data": {}}')


def test_unwrap_envelope_dead_letters(spark):
    df = spark.createDataFrame(
        [Row(type_id="t", data="{}"), Row(type_id=None, data="{}")]
    )
    good, dead = unwrap_envelope(df)
    assert good.count() == 1 and dead.count() == 1


def test_ingest_batch_end_to_end(spark, warehouse):
    reg = Registry(spark, warehouse)
    engine = IngestEngine(reg)
    rows = [
        Row(type_id="my_type", data=json.dumps({"id": "1", "foo": "bar", "number": 42})),
        Row(type_id="my_type", data=json.dumps({"id": "2", "foo": "baz", "number": 7,
                                                "nested": {"k": "v"}})),
        Row(type_id="other", data=json.dumps({"id": "9", "flag": True})),
        Row(type_id=None, data="{}"),                       # missing type_id → dead letter
        Row(type_id="my_type", data=json.dumps({"id": "3", "number": "conflict!"})),
    ]
    stats = engine.ingest_batch(spark.createDataFrame(rows))
    assert stats.types == 2
    assert stats.dead_letters == 2  # null type_id + type-conflict record

    my_type = reg.table("my_type").read()
    got = {r["id"]: r.asDict() for r in my_type.collect()}
    assert set(got) == {"1", "2"}
    assert got["2"]["nested__k"] == "v"          # flattened with __ separator
    assert got["1"]["number"] == 42
    desc = reg.get("my_type")
    assert desc.properties["number"].pair == ("integer", None)
    assert desc.properties["nested__k"].pair == ("string", None)

    other = reg.table("other").read()
    assert [r["flag"] for r in other.collect()] == [True]
    assert engine.dead_letters().count() == 2


def test_ingest_within_batch_duplicates_last_arrival_wins(spark, warehouse):
    # The reference consumes messages sequentially, so when one batch holds
    # several records for the same id, the LAST one must win — regardless of
    # which partition validates first (SURVEY §7 risk 4).
    reg = Registry(spark, warehouse)
    engine = IngestEngine(reg)
    payloads = [{"id": "a", "v": i} for i in range(1, 13)]
    engine.ingest_batch(
        # createDataFrame splits the rows over several partitions; parallel
        # validation across them must not reorder the outcome.
        spark.createDataFrame([Row(type_id="t", data=json.dumps(p)) for p in payloads])
    )
    got = {r["id"]: r["v"] for r in reg.table("t").read().collect()}
    assert got == {"a": 12}
    assert "_seq" not in reg.table("t").read().columns


def test_ingest_upsert_overwrites_by_id(spark, warehouse):
    reg = Registry(spark, warehouse)
    engine = IngestEngine(reg)
    batch = lambda payloads: spark.createDataFrame(
        [Row(type_id="t", data=json.dumps(p)) for p in payloads]
    )
    engine.ingest_batch(batch([{"id": "1", "v": 1}]))
    engine.ingest_batch(batch([{"id": "1", "v": 2}, {"id": "2", "v": 3}]))
    got = {r["id"]: r["v"] for r in reg.table("t").read().collect()}
    assert got == {"1": 2, "2": 3}


def test_replay_dead_letters_after_migration(spark, warehouse):
    from moisturizer_spark.crud import Engine

    reg = Registry(spark, warehouse)
    engine = IngestEngine(reg)
    batch = lambda payloads: spark.createDataFrame(
        [Row(type_id="t", data=json.dumps(p)) for p in payloads]
    )
    engine.ingest_batch(batch([{"id": "1", "n": 5}]))          # infers n: integer
    engine.ingest_batch(batch([{"id": "2", "n": "five"}]))     # conflict → dead letter
    assert engine.dead_letters().count() == 1
    assert {r["id"] for r in reg.table("t").read().collect()} == {"1"}

    # re-declare n as string (crud Engine shares the same warehouse),
    # then replay: the dead letter re-ingests under the fixed schema
    crud = Engine(spark, warehouse)
    crud.migrate_type("t", {"n": {"type": "string", "format": ""}})
    stats = engine.replay_dead_letters("t")
    assert stats.rows_upserted >= 1
    got = {r["id"]: r["n"] for r in reg.table("t").read().collect()}
    assert got == {"1": "5", "2": "five"}
    assert engine.dead_letters().count() == 0

    # replay with nothing to do is a no-op
    assert engine.replay_dead_letters("t").types == 0


def test_compact_reduces_files_preserves_rows(spark, warehouse):
    table = ParquetTable(spark, f"{warehouse}/cmp")
    df = spark.range(10_000).select(
        F.col("id").cast("string").alias("id"), F.col("id").alias("v")
    )
    # simulate many tiny micro-batch files
    table.overwrite(df.repartition(64))
    n_before, total = table.file_stats()
    assert n_before == 64
    n_after = table.compact(target_file_bytes=max(total, 1))
    assert n_after == 1
    assert table.read().count() == 10_000
    assert table.read().agg(F.sum("v")).first()[0] == sum(range(10_000))
    # already-compact tables are a no-op (no rewrite churn)
    assert table.compact(target_file_bytes=max(total, 1)) == 1
