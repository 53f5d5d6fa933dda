"""Streaming media near-dup e2e: perceptual-hash dedup of binary image
payloads against a persisted phash index, across restarts, exactly-once
via the shared stream-lifetime txn machinery."""

from __future__ import annotations

import base64
import json
import os

import numpy as np
from pyspark.sql import functions as F

from moisturizer_spark.operators.multimodal import phash_build, phash_query
from moisturizer_spark.storage import ParquetTable
from moisturizer_spark.streaming.media_dedup import start_media_dedup_stream

SCHEMA = "doc_id long, content binary"


def _ppm(img):
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def _mk(seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)


def _near(img):
    out = img.copy()
    out[0, 0] = 255 - out[0, 0]
    return out


def _drop(src_dir, name, rows):
    with open(os.path.join(src_dir, name), "w") as fh:
        for i, payload in rows:
            fh.write(
                json.dumps(
                    {
                        "doc_id": i,
                        "content": base64.b64encode(payload).decode(),
                    }
                )
                + "\n"
            )


def _run(spark, warehouse, src, index):
    curated = ParquetTable(spark, f"{warehouse}/md_curated", key="doc_id")
    stats = ParquetTable(spark, f"{warehouse}/md_stats", key="batch_id")
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = start_media_dedup_stream(
        stream, index, curated, stats, os.path.join(warehouse, "md_ckpt")
    )
    q.awaitTermination(120)
    return curated, stats


def test_streaming_media_dedup_across_restarts(spark, warehouse):
    base, fresh, fresh2 = _mk(1), _mk(2), _mk(3)
    seed = spark.createDataFrame([(100, _ppm(base))], SCHEMA)
    index = f"{warehouse}/md_index"
    phash_build(seed, index, kernel="ppm_ahash", max_distance=6)
    src = os.path.join(warehouse, "md_src")
    os.makedirs(src)

    # batch 1: near-dup of the seeded corpus image, a fresh image, and
    # a within-batch near-dup of the fresh one
    _drop(
        src,
        "b1.json",
        [(1, _ppm(_near(base))), (2, _ppm(fresh)), (3, _ppm(_near(fresh)))],
    )
    curated, stats = _run(spark, warehouse, src, index)
    assert {r["doc_id"] for r in curated.read().collect()} == {2}
    s0 = stats.read().filter(F.col("batch_id") == 0).first()
    assert (
        s0["n_input"], s0["n_batch_dups"], s0["n_corpus_dups"], s0["n_kept"]
    ) == (3, 1, 1, 1)

    # batch 2 after a RESTART: a near-dup of batch 1's survivor (the
    # index absorbed image 2's hash, so the stream must catch it
    # WITHOUT re-decoding stored bytes) + a fresh image
    _drop(src, "b2.json", [(4, _ppm(_near(fresh))), (5, _ppm(fresh2))])
    curated, stats = _run(spark, warehouse, src, index)
    assert {r["doc_id"] for r in curated.read().collect()} == {2, 5}
    s1 = stats.read().filter(F.col("batch_id") == 1).first()
    assert (s1["n_corpus_dups"], s1["n_kept"]) == (1, 1)

    # drain with no new files: idempotent
    curated, stats = _run(spark, warehouse, src, index)
    assert {r["doc_id"] for r in curated.read().collect()} == {2, 5}
    assert stats.read().count() == 2

    # the index is queryable batch-side too (matrix: batch AND stream)
    probe = spark.createDataFrame([(9, _ppm(_near(fresh2)))], SCHEMA)
    got = phash_query(spark, index, probe)
    assert {r["corpus_id"] for r in got.collect()} == {5}
