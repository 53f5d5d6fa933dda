"""Streaming canonical-URL dedup e2e: mirror spellings collapse within
and across micro-batches against the persisted store, across restarts,
exactly-once via the shared stream-lifetime txn machinery."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from moisturizer_spark.operators.urls import canonicalize_url
from moisturizer_spark.storage import ParquetTable
from moisturizer_spark.streaming.url_dedup import (
    incremental_url_dedup,
    start_url_dedup_stream,
)

SCHEMA = "doc_id long, url string"


def _drop(src_dir, name, rows):
    with open(os.path.join(src_dir, name), "w") as fh:
        for i, url in rows:
            fh.write(json.dumps({"doc_id": i, "url": url}) + "\n")


def _run(spark, warehouse, src):
    curated = ParquetTable(spark, f"{warehouse}/ud_curated", key="doc_id")
    store = ParquetTable(spark, f"{warehouse}/ud_store", key="canonical_url")
    stats = ParquetTable(spark, f"{warehouse}/ud_stats", key="batch_id")
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = start_url_dedup_stream(
        stream, curated, store, stats, os.path.join(warehouse, "ud_ckpt")
    )
    q.awaitTermination(120)
    return curated, store, stats


def test_streaming_url_dedup_across_restarts(spark, warehouse):
    src = os.path.join(warehouse, "ud_src")
    os.makedirs(src)

    # batch 1: four spellings of ONE page (min id wins) + a distinct page
    _drop(src, "b1.json", [
        (1, "https://www.site.com/page?id=1&utm_source=a"),
        (2, "HTTPS://SITE.com:443/page/?id=1"),
        (3, "https://site.com/page?utm_campaign=x&id=1#top"),
        (4, "https://WWW.site.com/page?id=1"),
        (5, "https://site.com/other?id=2"),
    ])
    curated, store, stats = _run(spark, warehouse, src)
    assert {r["doc_id"] for r in curated.read().collect()} == {1, 5}
    s0 = stats.read().filter(F.col("batch_id") == 0).first()
    assert (s0["n_input"], s0["n_url_dups"], s0["n_kept"]) == (5, 3, 2)
    assert store.read().count() == 2

    # batch 2 after a restart: a new spelling of batch 1's survivor
    # (cross-batch dedup via the persisted store) + a fresh page
    _drop(src, "b2.json", [
        (6, "https://site.com/page/?id=1&fbclid=zz"),
        (7, "https://site.com/fresh"),
    ])
    curated, store, stats = _run(spark, warehouse, src)
    assert {r["doc_id"] for r in curated.read().collect()} == {1, 5, 7}
    s1 = stats.read().filter(F.col("batch_id") == 1).first()
    assert (s1["n_input"], s1["n_url_dups"], s1["n_kept"]) == (2, 1, 1)

    # idempotent drain: nothing new, nothing changes
    curated, store, stats = _run(spark, warehouse, src)
    assert curated.read().count() == 3
    assert stats.read().count() == 2
    assert store.read().count() == 3

    # the curated rows carry their canonical form
    got = {
        r["doc_id"]: r["canonical_url"] for r in curated.read().collect()
    }
    assert got[1] == "https://site.com/page?id=1"


def test_incremental_url_dedup_batch_composition(spark, warehouse):
    """The batch-side operator: same store serves ad-hoc batch jobs,
    and the survivors' canonical keys land in it when record=True."""
    store = ParquetTable(spark, f"{warehouse}/ud_b_store", key="canonical_url")
    b1 = spark.createDataFrame(
        [
            (10, "https://www.a.com/x?utm_source=s"),
            (11, "https://a.com/x/"),
            (12, "https://a.com/y"),
        ],
        SCHEMA,
    )
    kept = incremental_url_dedup(b1, store)
    assert {r["doc_id"] for r in kept.collect()} == {10, 12}
    b2 = spark.createDataFrame(
        [(13, "HTTPS://A.com/x"), (14, "https://a.com/z")], SCHEMA
    )
    kept2 = incremental_url_dedup(b2, store)
    assert {r["doc_id"] for r in kept2.collect()} == {14}
    assert store.read().count() == 3


def test_streaming_url_dedup_fresh_checkpoint_namespace(spark, warehouse):
    """A FRESH checkpoint restarts batch ids at 0; the stream-lifetime
    app id must change with it so the txn watermarks from the previous
    lifetime can't swallow the new batches (the _txn contract)."""
    src = os.path.join(warehouse, "udn_src")
    os.makedirs(src)
    _drop(src, "b1.json", [(1, "https://n.com/p1")])
    curated = ParquetTable(spark, f"{warehouse}/udn_curated", key="doc_id")
    store = ParquetTable(spark, f"{warehouse}/udn_store", key="canonical_url")
    stats = ParquetTable(spark, f"{warehouse}/udn_stats", key="batch_id")

    stream = spark.readStream.schema(SCHEMA).json(src)
    q = start_url_dedup_stream(
        stream, curated, store, stats, os.path.join(warehouse, "udn_ck1")
    )
    q.awaitTermination(120)
    assert curated.read().count() == 1

    # same tables, FRESH checkpoint: batch 0 again, different app id —
    # the batch must process (URL dedup still drops the seen page, but
    # the stats row for the new lifetime's batch 0 must exist)
    _drop(src, "b2.json", [(2, "https://n.com/p1?utm_source=x"),
                           (3, "https://n.com/p2")])
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = start_url_dedup_stream(
        stream, curated, store, stats, os.path.join(warehouse, "udn_ck2")
    )
    q.awaitTermination(120)
    # fresh lifetime reprocessed everything: p1 deduped against the
    # store, p2 new
    assert {r["doc_id"] for r in curated.read().collect()} == {1, 3}


def test_canonical_store_survives_and_serves_spark_side(spark, warehouse):
    """The store is an ordinary bucketed table: point-prunable reads,
    shareable with batch jobs — assert the canonical key round-trips."""
    store = ParquetTable(spark, f"{warehouse}/ud_rt_store", key="canonical_url")
    df = spark.createDataFrame(
        [(1, "https://www.rt.com/a?utm_source=x&k=1#f")], SCHEMA
    )
    incremental_url_dedup(df, store)
    canon = df.select(canonicalize_url(F.col("url")).alias("c")).first()["c"]
    assert store.lookup(canon).count() == 1


def test_urlless_documents_pass_through_unjudged(spark, warehouse):
    """Review r9 finding: NULL/empty/whitespace URLs must NOT become a
    dedup key — distinct URL-less documents all survive, nothing lands
    in the store for them, and judged rows still dedup normally."""
    store = ParquetTable(spark, f"{warehouse}/ud_null_store", key="canonical_url")
    b1 = spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (3, "   "),
            (4, "https://n.com/p"),
            (5, "https://www.n.com/p?utm_source=x"),
        ],
        SCHEMA,
    )
    kept = incremental_url_dedup(b1, store)
    got = {r["doc_id"]: r["canonical_url"] for r in kept.collect()}
    # all three URL-less docs survive with NULL canonical; 4 beats 5
    assert set(got) == {1, 2, 3, 4}
    assert got[1] is None and got[2] is None and got[3] is None
    assert got[4] == "https://n.com/p"
    # the store holds ONLY the judged canonical key
    rows = store.read().collect()
    assert len(rows) == 1 and rows[0]["canonical_url"] == "https://n.com/p"

    # streaming stage: same semantics end-to-end
    src = os.path.join(warehouse, "udnul_src")
    os.makedirs(src)
    with open(os.path.join(src, "b1.json"), "w") as fh:
        fh.write(json.dumps({"doc_id": 10, "url": None}) + "\n")
        fh.write(json.dumps({"doc_id": 11, "url": ""}) + "\n")
        fh.write(json.dumps({"doc_id": 12, "url": "https://m.com/x"}) + "\n")
    curated = ParquetTable(spark, f"{warehouse}/udnul_curated", key="doc_id")
    store2 = ParquetTable(spark, f"{warehouse}/udnul_store", key="canonical_url")
    stats = ParquetTable(spark, f"{warehouse}/udnul_stats", key="batch_id")
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = start_url_dedup_stream(
        stream, curated, store2, stats, os.path.join(warehouse, "udnul_ck")
    )
    q.awaitTermination(120)
    assert {r["doc_id"] for r in curated.read().collect()} == {10, 11, 12}
    assert store2.read().count() == 1  # no NULL keys recorded
