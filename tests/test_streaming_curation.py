"""Streaming curation e2e: quality + cross-batch dedup, exactly-once.

Drives ``streaming/curation.py`` over a file-drop document stream:
quality failures drop, exact duplicates dedup WITHIN a batch and ACROSS
restarts (state = the persisted fingerprint store, not the stream's
state store), and per-batch funnel stats land keyed by batch id.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from moisturizer_spark.storage import ParquetTable
from moisturizer_spark.streaming.curation import start_curation_stream

GOOD_A = (
    "the quick brown fox jumps over the lazy dog while many other "
    "animals watch the scene with great interest and some measure of "
    "genuine amusement under the warm afternoon sun"
)
GOOD_B = (
    "a very different second document with lots of small plain words "
    "that sail past every rule in the cascade and so it stays in the "
    "corpus for all time as a fine and honest example of clean text"
)

SCHEMA = "doc_id long, text string, n_chars long"


def _drop(src_dir: str, name: str, rows: list[tuple[int, str]]) -> None:
    with open(os.path.join(src_dir, name), "w") as fh:
        for i, t in rows:
            fh.write(json.dumps({"doc_id": i, "text": t, "n_chars": len(t)}) + "\n")


def _tables(spark, warehouse):
    return (
        ParquetTable(spark, f"{warehouse}/curated", key="doc_id"),
        ParquetTable(spark, f"{warehouse}/fp_store", key="fp"),
        ParquetTable(spark, f"{warehouse}/batch_stats", key="batch_id"),
    )


def _run(spark, warehouse, src):
    curated, store, stats = _tables(spark, warehouse)
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = start_curation_stream(
        stream, curated, store, stats, os.path.join(warehouse, "ckpt")
    )
    q.awaitTermination(120)
    return curated, store, stats


def test_streaming_curation_dedups_across_restarts(spark, warehouse):
    src = os.path.join(warehouse, "src")
    os.makedirs(src)

    # batch 1: one good doc, one quality failure, one within-batch dup
    _drop(src, "b1.json", [(1, GOOD_A), (2, "tiny"), (3, GOOD_A)])
    curated, store, stats = _run(spark, warehouse, src)
    assert {r["doc_id"] for r in curated.read().collect()} == {1}
    s1 = stats.read().filter(F.col("batch_id") == 0).first()
    assert (s1["n_input"], s1["n_quality"], s1["n_kept"]) == (3, 2, 1)

    # batch 2 after a RESTART: a cross-batch dup of GOOD_A plus a new doc —
    # dedup state came from the persisted store, not streaming state
    _drop(src, "b2.json", [(4, GOOD_A), (5, GOOD_B)])
    curated, store, stats = _run(spark, warehouse, src)
    assert {r["doc_id"] for r in curated.read().collect()} == {1, 5}
    assert store.read().count() == 2  # one fingerprint per unique content

    # drain again with no new files: nothing changes (idempotent replay)
    curated, store, stats = _run(spark, warehouse, src)
    assert {r["doc_id"] for r in curated.read().collect()} == {1, 5}
    assert stats.read().count() == 2


def test_streaming_curation_partial_apply_replays_safely(spark, warehouse):
    """Simulate a crash BETWEEN the curated write and the store write:
    replaying the batch must re-derive the same survivors and finish
    the store half without dropping or duplicating documents."""
    src = os.path.join(warehouse, "src")
    os.makedirs(src)
    _drop(src, "b1.json", [(1, GOOD_A), (5, GOOD_B)])
    curated, store, stats = _run(spark, warehouse, src)

    # manufacture the partial state: roll the STORE's watermark back and
    # remove one fingerprint, as if the crash hit before the store write
    fp_rows = store.read().collect()
    assert len(fp_rows) == 2
    keep = [r for r in fp_rows if r["first_doc_id"] == "1"]
    store.overwrite(
        spark.createDataFrame(keep, store.read().schema),
        txn=("curation_stream", -1),
    )
    assert store.txn_version("curation_stream") == -1

    # replay the source through a FRESH checkpoint: batch ids restart at
    # 0, the per-TABLE txn guards decide independently — curated (at 0)
    # skips, the store (rolled back to -1) catches up. Because the store
    # write is sequenced after the curated write, the re-derived survivor
    # set is computed against the pre-crash store state and completes the
    # missing half without dropping or duplicating anything.
    q = start_curation_stream(
        spark.readStream.schema(SCHEMA).json(src),
        curated, store, stats,
        os.path.join(warehouse, "ckpt2"),
    )
    q.awaitTermination(120)
    assert {r["doc_id"] for r in curated.read().collect()} == {1, 5}
    assert store.read().count() == 2


class _CrashBeforeUpsert(ParquetTable):
    """Raises on the first upsert — simulates a crash landing exactly
    before this table's write within a foreachBatch transaction."""

    def upsert(self, df, **kwargs):
        if not os.path.exists(self.path + ".crashed"):
            with open(self.path + ".crashed", "w"):
                pass
            raise RuntimeError("injected crash before store write")
        return super().upsert(df, **kwargs)


def test_streaming_curation_stats_written_before_store(spark, warehouse):
    """Pin the write ORDER: stats must land before the store upsert.

    n_kept is derived from the pre-batch store; if the store write were
    sequenced first and the crash hit between store and stats, replay
    would recompute survivors against a store already containing this
    batch's fingerprints and permanently record n_kept=0. Injecting a
    crash at the store write therefore must leave a fully-correct stats
    row behind — and the replay must complete the store half without
    disturbing it."""
    src = os.path.join(warehouse, "src")
    os.makedirs(src)
    _drop(src, "b1.json", [(1, GOOD_A), (5, GOOD_B)])
    curated, _, stats = _tables(spark, warehouse)
    store = _CrashBeforeUpsert(spark, f"{warehouse}/fp_store", key="fp")

    q = start_curation_stream(
        spark.readStream.schema(SCHEMA).json(src),
        curated, store, stats, os.path.join(warehouse, "ckpt"),
    )
    try:
        q.awaitTermination(120)
    except Exception:
        pass
    assert not q.isActive
    # crash hit the store write: stats already holds the REAL counts
    s = stats.read().filter(F.col("batch_id") == 0).first()
    assert (s["n_input"], s["n_quality"], s["n_kept"]) == (2, 2, 2)
    assert store.txn_version("curation_stream") is None  # store is behind

    # replay through the same checkpoint: curated + stats watermarks are
    # current (skip), the store catches up against the pre-batch state
    q = start_curation_stream(
        spark.readStream.schema(SCHEMA).json(src),
        curated, store, stats, os.path.join(warehouse, "ckpt"),
    )
    q.awaitTermination(120)
    assert store.read().count() == 2
    assert stats.read().count() == 1
    s = stats.read().first()
    assert (s["n_input"], s["n_quality"], s["n_kept"]) == (2, 2, 2)
