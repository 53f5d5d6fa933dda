"""Streaming near-dup curation e2e: within-batch + vs-persisted-index
dedup over a file-drop stream, exactly-once, restart-safe.

State is the persisted MinHash index itself — batch N+1 dedups against
everything batch N kept, across restarts, with no streaming state
store. Mirrors the exact-dedup curation e2e harness."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from moisturizer_spark.operators.dedup import minhash_build
from moisturizer_spark.storage import ParquetTable
from moisturizer_spark.streaming.near_dup import start_near_dup_stream

BASE = (
    "the quick brown fox jumps over the lazy dog while many other "
    "animals watch the scene with great interest and some measure of "
    "genuine amusement under the warm afternoon sun"
)
# near (not exact) duplicate: small edit, high shingle overlap
NEAR = BASE.replace("lazy dog", "lazy old dog")
FRESH = (
    "completely unrelated prose about shipping manifests and harbor "
    "cranes moving painted steel boxes from pier to rail yard all "
    "night long under bright sodium lights with careful slow motions"
)
FRESH2 = (
    "a short treatise on the joys of baking rye bread at altitude "
    "where water boils sooner and crusts set later than the recipe "
    "claims and every loaf becomes an experiment in patient judgment"
)

SCHEMA = "doc_id long, text string"


def _drop(src_dir: str, name: str, rows: list[tuple[int, str]]) -> None:
    with open(os.path.join(src_dir, name), "w") as fh:
        for i, t in rows:
            fh.write(json.dumps({"doc_id": i, "text": t}) + "\n")


def _run(spark, warehouse, src, index):
    curated = ParquetTable(spark, f"{warehouse}/nd_curated", key="doc_id")
    stats = ParquetTable(spark, f"{warehouse}/nd_stats", key="batch_id")
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = start_near_dup_stream(
        stream, index, curated, stats, os.path.join(warehouse, "nd_ckpt")
    )
    q.awaitTermination(120)
    return curated, stats


def test_streaming_near_dup_across_restarts(spark, warehouse):
    # seed corpus: BASE is already in the index
    seed = spark.createDataFrame([(100, BASE)], SCHEMA)
    index = f"{warehouse}/nd_index"
    minhash_build(seed, index, threshold=0.6)
    src = os.path.join(warehouse, "nd_src")
    os.makedirs(src)

    # batch 1: a near-dup of the seeded corpus doc, a fresh doc, and a
    # within-batch near-dup pair (2 copies of FRESH with a small edit)
    _drop(
        src,
        "b1.json",
        [
            (1, NEAR),                                # corpus near-dup
            (2, FRESH),                               # survivor
            (3, FRESH.replace("painted", "welded")),  # within-batch dup of 2
        ],
    )
    curated, stats = _run(spark, warehouse, src, index)
    assert {r["doc_id"] for r in curated.read().collect()} == {2}
    s0 = stats.read().filter(F.col("batch_id") == 0).first()
    assert (
        s0["n_input"], s0["n_batch_dups"], s0["n_corpus_dups"], s0["n_kept"]
    ) == (3, 1, 1, 1)

    # batch 2 after a RESTART: a near-dup of batch 1's SURVIVOR (the
    # index absorbed doc 2, so the stream must catch it) + a fresh doc
    _drop(
        src,
        "b2.json",
        [(4, FRESH.replace("sodium", "argon")), (5, FRESH2)],
    )
    curated, stats = _run(spark, warehouse, src, index)
    assert {r["doc_id"] for r in curated.read().collect()} == {2, 5}
    s1 = stats.read().filter(F.col("batch_id") == 1).first()
    assert (s1["n_corpus_dups"], s1["n_kept"]) == (1, 1)

    # drain with no new files: idempotent
    curated, stats = _run(spark, warehouse, src, index)
    assert {r["doc_id"] for r in curated.read().collect()} == {2, 5}
    assert stats.read().count() == 2


def test_streaming_near_dup_replay_converges_after_partial_append(
    spark, warehouse
):
    """The one non-idempotent window: batch appended to the index but
    the sidecar bump lost (crash simulation). A replay must compute the
    identical survivor set (self-pairs filtered; survivors are not
    near-dups of each other) and re-append only harmless duplicate
    rows, which compaction then sheds."""
    from moisturizer_spark.operators.dedup import (
        minhash_compact,
        minhash_query,
    )
    def _applied_batch(path):
        # raw sidecar cursor, app-id-agnostic (the lifetime namespace is
        # exercised by test_fresh_checkpoint_reprocesses_instead_of_dropping)
        with open(os.path.join(path, "_stream_txn.json")) as fh:
            return json.load(fh)["applied_batch"]

    seed = spark.createDataFrame([(100, BASE)], SCHEMA)
    index = f"{warehouse}/nd_index2"
    minhash_build(seed, index, threshold=0.6)
    src = os.path.join(warehouse, "nd_src2")
    os.makedirs(src)
    _drop(src, "b1.json", [(1, FRESH), (2, FRESH2)])
    curated, stats = _run(spark, warehouse, src, index)
    assert {r["doc_id"] for r in curated.read().collect()} == {1, 2}
    assert _applied_batch(index) == 0

    # simulate the lost sidecar bump: rewind the watermark, delete the
    # checkpoint so the SAME files replay as a fresh batch 0
    os.remove(os.path.join(index, "_stream_txn.json"))
    import shutil

    shutil.rmtree(os.path.join(warehouse, "nd_ckpt"))
    curated, stats = _run(spark, warehouse, src, index)
    # identical survivor set; curated/stats unchanged via watermarks
    assert {r["doc_id"] for r in curated.read().collect()} == {1, 2}
    assert stats.read().count() == 1
    assert _applied_batch(index) == 0
    # the double-append left duplicate physical rows; queries still
    # behave (duplicate pairs collapse) and compaction sheds them
    probe = spark.createDataFrame(
        [(9, FRESH.replace("bright", "dim"))], SCHEMA
    )
    before = minhash_query(spark, index, probe)
    assert {r["corpus_id"] for r in before.collect()} == {1}
    meta = minhash_compact(spark, index)
    bands = spark.read.parquet(os.path.join(index, meta["bands_dir"]))
    assert bands.count() == bands.dropDuplicates().count()
    after = minhash_query(spark, index, probe)
    assert {r["corpus_id"] for r in after.collect()} == {1}


def test_fresh_checkpoint_reprocesses_instead_of_dropping(spark, warehouse):
    """The r6-ADVICE hazard: batch ids restart at 0 under a NEW
    checkpoint directory, so a bare batch-id watermark would silently
    drop every batch of the new stream (id <= the old cursor). The
    stream-lifetime app-id namespace must make a fresh checkpoint
    REPROCESS: new source files flow through, new stats rows land, and
    the index keeps absorbing survivors."""
    seed = spark.createDataFrame([(100, BASE)], SCHEMA)
    index = f"{warehouse}/nd_index"
    minhash_build(seed, index, threshold=0.6)
    src = os.path.join(warehouse, "nd_src")
    os.makedirs(src)
    _drop(src, "b1.json", [(1, FRESH)])
    curated, stats = _run(spark, warehouse, src, index)
    assert {r["doc_id"] for r in curated.read().collect()} == {1}
    # the first lifetime committed watermarks for batch id 0
    assert stats.read().count() == 1

    # NEW checkpoint + NEW source dir (same tables, same index): its
    # first batch is id 0 again — under the old bare-app-id scheme the
    # cursor at 0 suppressed it entirely
    src2 = os.path.join(warehouse, "nd_src2")
    os.makedirs(src2)
    _drop(src2, "b1.json", [(6, FRESH2)])
    curated2 = ParquetTable(spark, f"{warehouse}/nd_curated", key="doc_id")
    stats2 = ParquetTable(spark, f"{warehouse}/nd_stats2", key="batch_id")
    stream = spark.readStream.schema(SCHEMA).json(src2)
    q = start_near_dup_stream(
        stream, index, curated2, stats2,
        os.path.join(warehouse, "nd_ckpt_fresh"),
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in curated2.read().collect()}
    assert 6 in got, (
        "fresh-checkpoint batch 0 was dropped by a stale watermark"
    )
    assert stats2.read().count() == 1
    # and a near-dup of doc 6 via a THIRD lifetime still dedups against
    # the index doc 6 just joined
    src3 = os.path.join(warehouse, "nd_src3")
    os.makedirs(src3)
    _drop(src3, "b1.json", [(7, FRESH2.replace("rye", "oat"))])
    stats3 = ParquetTable(spark, f"{warehouse}/nd_stats3", key="batch_id")
    stream = spark.readStream.schema(SCHEMA).json(src3)
    q = start_near_dup_stream(
        stream, index, curated2, stats3,
        os.path.join(warehouse, "nd_ckpt_fresh3"),
    )
    q.awaitTermination(120)
    s = stats3.read().first()
    assert (s["n_corpus_dups"], s["n_kept"]) == (1, 0)


def test_stream_pairs_feed_maintains_incremental_clusters(spark, warehouse):
    """The full stream -> edge table -> incremental-CC composition: the
    near-dup stream upserts every surfaced pair into a keyed edge
    table (insert-only from the view's perspective), and the
    IncrementalCCView folds each drained batch WITHOUT recomputing star
    contraction — continuously-maintained dedup clusters."""
    from moisturizer_spark.incremental import IncrementalCCView

    seed = spark.createDataFrame([(100, BASE)], SCHEMA)
    index = f"{warehouse}/nd_index3"
    minhash_build(seed, index, threshold=0.6)
    src = os.path.join(warehouse, "nd_src3")
    os.makedirs(src)
    curated = ParquetTable(spark, f"{warehouse}/nd3_curated", key="doc_id")
    stats = ParquetTable(spark, f"{warehouse}/nd3_stats", key="batch_id")
    pairs = ParquetTable(spark, f"{warehouse}/nd3_pairs", key="pair")
    view = IncrementalCCView(
        pairs, f"{warehouse}/nd3_clusters", src_col="id_a", dst_col="id_b"
    )

    def drain():
        stream = spark.readStream.schema(SCHEMA).json(src)
        q = start_near_dup_stream(
            stream, index, curated, stats,
            os.path.join(warehouse, "nd3_ckpt"), pairs=pairs,
        )
        q.awaitTermination(120)

    # batch 1: corpus near-dup (100~1) + within-batch pair (2~3)
    _drop(
        src,
        "b1.json",
        [(1, NEAR), (2, FRESH), (3, FRESH.replace("painted", "welded"))],
    )
    drain()
    view.refresh()
    labels = {r["id"]: r["component"] for r in view.read().collect()}
    assert labels == {1: 1, 100: 1, 2: 2, 3: 2}

    # batch 2: a near-dup of batch 1's survivor chains cluster {2,3}
    _drop(src, "b2.json", [(4, FRESH.replace("sodium", "argon")), (5, FRESH2)])
    drain()
    view.refresh()
    labels = {r["id"]: r["component"] for r in view.read().collect()}
    assert labels == {1: 1, 100: 1, 2: 2, 3: 2, 4: 2}

    # idempotent: a drain with no new files leaves clusters unchanged
    drain()
    view.refresh()
    assert {
        r["id"]: r["component"] for r in view.read().collect()
    } == labels
