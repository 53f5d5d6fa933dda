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


def _wav(samples):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)
        wf.setframerate(8000)
        wf.writeframes(bytes(samples))
    return buf.getvalue()


def _wav_mk(seed):
    rng = np.random.RandomState(seed)
    return list(rng.randint(0, 256, 640))


def _wav_near(samples):
    out = list(samples)
    out[10] = 255 - out[10]
    return out


def _vid(frames):
    return b"".join(_ppm(f) for f in frames)


def _vid_near(frames):
    return [_near(frames[0])] + [f.copy() for f in frames[1:]]


def test_streaming_media_dedup_audio_and_video_kernels(spark, warehouse):
    """The audio (wav_energy) and video (frame-indexed ppm_ahash)
    kernels run the SAME streaming pipeline e2e: within-batch dedup,
    corpus-index dedup without re-decoding stored bytes, cross-restart
    index absorption, idempotent drain, and a batch-side probe."""
    for kind in ("audio", "video"):
        if kind == "audio":
            a1, a2, a3 = _wav_mk(1), _wav_mk(2), _wav_mk(3)
            p = {
                "base": _wav(a1),
                "near_base": _wav(_wav_near(a1)),
                "fresh": _wav(a2),
                "near_fresh": _wav(_wav_near(a2)),
                "fresh2": _wav(a3),
            }
            build_kw = {"kernel": "wav_energy", "max_distance": 6}
        else:
            f1 = [_mk(1), _mk(11)]
            f2 = [_mk(2), _mk(12)]
            f3 = [_mk(3), _mk(13)]
            p = {
                "base": _vid(f1),
                "near_base": _vid(_vid_near(f1)),
                "fresh": _vid(f2),
                "near_fresh": _vid(_vid_near(f2)),
                "fresh2": _vid(f3),
            }
            build_kw = {
                "kernel": "ppm_ahash",
                "max_distance": 6,
                "frame_bytes": len(_ppm(f1[0])),
            }

        wh = os.path.join(warehouse, kind)
        os.makedirs(wh)
        seed = spark.createDataFrame([(100, p["base"])], SCHEMA)
        index = f"{wh}/md_index"
        phash_build(seed, index, **build_kw)
        src = os.path.join(wh, "md_src")
        os.makedirs(src)

        # batch 1: near-dup of the corpus, a fresh item, and a
        # within-batch near-dup of the fresh one
        _drop(
            src,
            "b1.json",
            [(1, p["near_base"]), (2, p["fresh"]), (3, p["near_fresh"])],
        )
        curated, stats = _run(spark, wh, src, index)
        assert {r["doc_id"] for r in curated.read().collect()} == {2}, kind
        s0 = stats.read().filter(F.col("batch_id") == 0).first()
        assert (
            s0["n_input"],
            s0["n_batch_dups"],
            s0["n_corpus_dups"],
            s0["n_kept"],
        ) == (3, 1, 1, 1), kind

        # batch 2 after a restart: near-dup of batch 1's survivor (the
        # index absorbed its hash) + a fresh item
        _drop(src, "b2.json", [(4, p["near_fresh"]), (5, p["fresh2"])])
        curated, stats = _run(spark, wh, src, index)
        assert {r["doc_id"] for r in curated.read().collect()} == {2, 5}, kind

        # idempotent drain, then the batch-side probe
        curated, stats = _run(spark, wh, src, index)
        assert stats.read().count() == 2, kind
        probe = spark.createDataFrame([(9, p["fresh2"])], SCHEMA)
        got = phash_query(spark, index, probe)
        assert {r["corpus_id"] for r in got.collect()} == {5}, kind


def test_media_replay_converges_and_phash_compact_sheds(spark, warehouse):
    """The one non-idempotent window (index appended, sidecar bump
    lost): a replay computes the identical survivor set and re-appends
    only duplicate physical hash rows, which queries collapse and
    phash_compact physically sheds via a generation-dir swap — the
    minhash_compact contract for the media index."""
    import shutil

    from moisturizer_spark.operators.multimodal import phash_compact

    base, fresh, fresh2 = _mk(1), _mk(2), _mk(3)
    seed = spark.createDataFrame([(100, _ppm(base))], SCHEMA)
    index = f"{warehouse}/md_index2"
    phash_build(seed, index, kernel="ppm_ahash", max_distance=6)
    src = os.path.join(warehouse, "md_src2")
    os.makedirs(src)
    _drop(src, "b1.json", [(1, _ppm(fresh)), (2, _ppm(fresh2))])
    curated, stats = _run(spark, warehouse, src, index)
    assert {r["doc_id"] for r in curated.read().collect()} == {1, 2}

    def _applied_batch(path):
        with open(os.path.join(path, "_stream_txn.json")) as fh:
            return json.load(fh)["applied_batch"]

    assert _applied_batch(index) == 0

    # simulate the lost sidecar bump: drop the watermark and the
    # checkpoint so the SAME files replay as a fresh batch 0
    os.remove(os.path.join(index, "_stream_txn.json"))
    shutil.rmtree(os.path.join(warehouse, "md_ckpt"))
    curated, stats = _run(spark, warehouse, src, index)
    assert {r["doc_id"] for r in curated.read().collect()} == {1, 2}
    assert stats.read().count() == 1
    assert _applied_batch(index) == 0

    # double-append left duplicate physical rows; queries still behave
    probe = spark.createDataFrame([(9, _ppm(_near(fresh)))], SCHEMA)
    assert {r["corpus_id"] for r in phash_query(spark, index, probe).collect()} == {1}
    raw = spark.read.parquet(os.path.join(index, "data"))
    assert raw.count() > raw.dropDuplicates().count()

    # compaction sheds them and swaps the generation atomically
    meta = phash_compact(spark, index)
    assert meta["data_dir"] == "data_g1" and meta["compaction_gen"] == 1
    assert not os.path.exists(os.path.join(index, "data"))
    data = spark.read.parquet(os.path.join(index, meta["data_dir"]))
    assert data.count() == data.dropDuplicates().count() == 3  # 100, 1, 2
    assert {r["corpus_id"] for r in phash_query(spark, index, probe).collect()} == {1}


def test_video_query_correct_despite_replay_duplicate_rows(spark, warehouse):
    """A replayed append leaves exact duplicate FRAME rows in a video
    index; the all-frames-match count check must not see inflated
    matched-row counts and silently drop true duplicates."""
    from moisturizer_spark.operators.multimodal import (
        phash_append,
        phash_compact,
    )

    f1 = [_mk(1), _mk(11)]
    index = f"{warehouse}/vid_idx"
    seed = spark.createDataFrame([(1, _vid(f1))], SCHEMA)
    phash_build(
        seed, index, kernel="ppm_ahash", max_distance=6,
        frame_bytes=len(_ppm(f1[0])),
    )
    # simulate the replayed append: the same video's rows land twice
    phash_append(spark, index, seed)
    raw = spark.read.parquet(os.path.join(index, "data"))
    assert raw.count() == 4 and raw.dropDuplicates().count() == 2

    probe = spark.createDataFrame([(9, _vid(_vid_near(f1)))], SCHEMA)
    got = phash_query(spark, index, probe).collect()
    assert {r["corpus_id"] for r in got} == {1}, got

    # compaction sheds the physical duplicates; the answer is unchanged
    meta = phash_compact(spark, index)
    data = spark.read.parquet(os.path.join(index, meta["data_dir"]))
    assert data.count() == 2
    got = phash_query(spark, index, probe).collect()
    assert {r["corpus_id"] for r in got} == {1}


def test_phash_rebuild_removes_stranded_generations(spark, warehouse):
    """phash_build over a previously COMPACTED index must remove the
    old data_g{n} directory the fresh sidecar can no longer reach."""
    from moisturizer_spark.operators.multimodal import phash_compact

    base = _mk(1)
    index = f"{warehouse}/rebuild_idx"
    seed = spark.createDataFrame([(1, _ppm(base))], SCHEMA)
    phash_build(seed, index, kernel="ppm_ahash")
    meta = phash_compact(spark, index)
    assert os.path.isdir(os.path.join(index, meta["data_dir"]))

    phash_build(seed, index, kernel="ppm_ahash")
    assert os.path.isdir(os.path.join(index, "data"))
    stranded = [e for e in os.listdir(index) if e.startswith("data_g")]
    assert stranded == []
    probe = spark.createDataFrame([(9, _ppm(_near(base)))], SCHEMA)
    assert {r["corpus_id"] for r in phash_query(spark, index, probe).collect()} == {1}


def test_phash_rebuild_swap_precedes_cleanup(spark, warehouse):
    """ADVICE r08 (medium): the stranded-generation cleanup must run
    strictly AFTER the atomic sidecar swap. Simulate a crash inside the
    cleanup window (rmtree raises): the index must already be readable
    — with the old order a crash there left _phash.json pointing at a
    deleted data_g{n}, a bricked index."""
    import shutil

    import pytest

    from moisturizer_spark.operators.multimodal import phash_compact

    base = _mk(4)
    index = f"{warehouse}/rebuild_crash_idx"
    seed = spark.createDataFrame([(1, _ppm(base))], SCHEMA)
    phash_build(seed, index, kernel="ppm_ahash")
    meta = phash_compact(spark, index)
    assert meta["data_dir"].startswith("data_g")

    real_rmtree = shutil.rmtree

    def _crash(path, *a, **kw):
        if os.path.basename(path).startswith("data_g"):
            raise OSError("simulated crash mid-cleanup")
        return real_rmtree(path, *a, **kw)

    shutil.rmtree = _crash
    try:
        with pytest.raises(OSError, match="simulated crash"):
            phash_build(seed, index, kernel="ppm_ahash")
    finally:
        shutil.rmtree = real_rmtree

    # the swap already happened: the index reads fine despite the crash;
    # the stranded generation is a leak, not a brick
    with open(os.path.join(index, "_phash.json")) as fh:
        assert json.load(fh)["data_dir"] == "data"
    probe = spark.createDataFrame([(9, _ppm(_near(base)))], SCHEMA)
    assert {r["corpus_id"] for r in phash_query(spark, index, probe).collect()} == {1}
    # a later clean rebuild sheds the leaked generation
    phash_build(seed, index, kernel="ppm_ahash")
    assert [e for e in os.listdir(index) if e.startswith("data_g")] == []


def test_video_reappended_changed_content_still_matches(spark, warehouse):
    """ADVICE r08: an id re-appended with DIFFERENT content keeps both
    hash generations (compaction preserves them). Before the fix the
    all-frames count saw frame-count x generations and every true
    duplicate of that id went silently unreported. Contract now: the
    corpus frame count is DISTINCT frames, per-frame distance is the
    MIN across stored generations — probes near EITHER generation
    match, and the all-frames rule still rejects partial matches."""
    from moisturizer_spark.operators.multimodal import phash_append

    gen_a = [_mk(21), _mk(22)]
    gen_b = [_mk(31), _mk(32)]  # same id, totally different frames
    index = f"{warehouse}/vid_regen_idx"
    seed = spark.createDataFrame([(1, _vid(gen_a))], SCHEMA)
    phash_build(
        seed, index, kernel="ppm_ahash", max_distance=6,
        frame_bytes=len(_ppm(gen_a[0])),
    )
    phash_append(
        spark, index, spark.createDataFrame([(1, _vid(gen_b))], SCHEMA)
    )

    # probes near each generation both report id 1
    for probe_frames in (_vid_near(gen_a), _vid_near(gen_b)):
        probe = spark.createDataFrame([(9, _vid(probe_frames))], SCHEMA)
        got = phash_query(spark, index, probe).collect()
        assert {r["corpus_id"] for r in got} == {1}, got

    # all-frames contract intact: frame 0 from gen A + frame 1 from an
    # unrelated video must NOT match (frame 1 is far from both gens)
    chimera = spark.createDataFrame(
        [(9, _vid([gen_a[0], _mk(77)]))], SCHEMA
    )
    assert phash_query(spark, index, chimera).collect() == []


def test_video_query_dedups_probe_side_duplicates(spark, warehouse):
    """Review r9 finding: the all-frames count must also dedup the
    PROBE side — a probe batch carrying exact-duplicate rows for one
    video (at-least-once upstream) previously inflated _nq to 2x the
    frame count and its true duplicates went silently unreported."""
    f1 = [_mk(41), _mk(42)]
    index = f"{warehouse}/vid_probe_dup_idx"
    seed = spark.createDataFrame([(1, _vid(f1))], SCHEMA)
    phash_build(
        seed, index, kernel="ppm_ahash", max_distance=6,
        frame_bytes=len(_ppm(f1[0])),
    )
    probe = spark.createDataFrame(
        [(9, _vid(_vid_near(f1))), (9, _vid(_vid_near(f1)))], SCHEMA
    )
    got = phash_query(spark, index, probe).collect()
    assert {(r["batch_id"], r["corpus_id"]) for r in got} == {(9, 1)}, got
