"""File-source round-trips: CSV/parquet/JSONL → envelopes → ingest → table."""

from __future__ import annotations

import json

from moisturizer_spark.ingest import IngestEngine
from moisturizer_spark.registry import Registry
from moisturizer_spark.sources import (
    read_envelopes_jsonl,
    read_objects_csv,
    read_objects_parquet,
)


def test_csv_backfill_roundtrip(spark, tmp_path):
    csv = tmp_path / "in.csv"
    csv.write_text("id,name,score\na,alice,1.5\nb,bob,2.5\n")
    reg = Registry(spark, str(tmp_path / "wh"))
    eng = IngestEngine(reg)
    eng.ingest_batch(read_objects_csv(spark, str(csv), "people"))
    rows = {r["id"]: r.asDict() for r in reg.table("people").read().collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"]["name"] == "alice"
    assert float(rows["b"]["score"]) == 2.5


def test_parquet_backfill_roundtrip(spark, tmp_path):
    src = spark.createDataFrame(
        [("x", 10), ("y", 20)], "id string, qty bigint"
    )
    pq = str(tmp_path / "in.parquet")
    src.write.parquet(pq)
    reg = Registry(spark, str(tmp_path / "wh"))
    eng = IngestEngine(reg)
    eng.ingest_batch(read_objects_parquet(spark, pq, "stock"))
    rows = {r["id"]: r.asDict() for r in reg.table("stock").read().collect()}
    assert rows["x"]["qty"] == 10 and rows["y"]["qty"] == 20


def test_jsonl_envelopes_with_dead_letters(spark, tmp_path):
    lines = [
        json.dumps({"type_id": "ev", "data": {"id": "1", "v": 1}}),
        "{broken",
        json.dumps({"data": {"id": "2"}}),  # missing type_id
    ]
    f = tmp_path / "env.jsonl"
    f.write_text("\n".join(lines) + "\n")
    reg = Registry(spark, str(tmp_path / "wh"))
    eng = IngestEngine(reg)
    eng.ingest_batch(read_envelopes_jsonl(spark, str(f)))
    assert [r["id"] for r in reg.table("ev").read().collect()] == ["1"]
    assert eng.dead_letters().count() == 2
