"""Streaming semantic dedup e2e: embedding-space dedup within batches
and against a persisted IVF index, exactly-once, restart-safe —
completing the dedup x delivery matrix (exact / near-text / semantic,
each batch + streaming)."""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import functions as F

from moisturizer_spark.operators.similarity import ivf_build
from moisturizer_spark.storage import ParquetTable
from moisturizer_spark.streaming.semantic_dedup import (
    start_semantic_dedup_stream,
)

DIM = 8
SCHEMA = "vec_id long, embedding array<double>"


def _unit(seed: int) -> list[float]:
    """Deterministic well-separated unit vectors: seeds 0-7 are the
    standard basis (mutually orthogonal); higher seeds are normalized
    4-hot combinations at cosine 0.5 to each basis vector and 0 to the
    complementary combination — comfortably below the 0.98 threshold."""
    v = [0.0] * DIM
    if seed < DIM:
        v[seed] = 1.0
        return v
    if seed == 50:
        idx = (0, 1, 2, 3)
    elif seed == 60:
        idx = (4, 5, 6, 7)
    else:
        raise ValueError(f"no fixture vector for seed {seed}")
    for i in idx:
        v[i] = 0.5
    return v


def _tilt(v: list[float], eps: float) -> list[float]:
    """A vector at cosine ~ 1 - eps^2/2 to v (normalized bump on one
    axis) — near-dup for small eps."""
    out = list(v)
    out[0] += eps
    n = math.sqrt(sum(x * x for x in out))
    return [x / n for x in out]


def _drop(src_dir: str, name: str, rows: list[tuple[int, list[float]]]):
    with open(os.path.join(src_dir, name), "w") as fh:
        for i, v in rows:
            fh.write(json.dumps({"vec_id": i, "embedding": v}) + "\n")


def _run(spark, warehouse, src, index, n_probe):
    curated = ParquetTable(spark, f"{warehouse}/sd_curated", key="vec_id")
    stats = ParquetTable(spark, f"{warehouse}/sd_stats", key="batch_id")
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = start_semantic_dedup_stream(
        stream, index, curated, stats,
        os.path.join(warehouse, "sd_ckpt"),
        threshold=0.98, n_probe=n_probe,
    )
    q.awaitTermination(120)
    return curated, stats


def test_streaming_semantic_dedup_across_restarts(spark, warehouse):
    # seed corpus: 8 well-separated unit vectors already indexed;
    # n_probe = n_lists makes the corpus check exhaustive (the recall
    # caveat is the operator's documented knob, not this test's topic)
    seed = spark.createDataFrame(
        [(100 + i, _unit(i)) for i in range(8)], SCHEMA
    )
    index = f"{warehouse}/sd_index"
    n_lists = 4
    ivf_build(seed, index, n_lists=n_lists)
    src = os.path.join(warehouse, "sd_src")
    os.makedirs(src)

    fresh_a, fresh_b = _unit(50), _unit(60)
    # batch 1: a semantic dup of seeded vector 0, a fresh vector, and a
    # within-batch dup pair of the fresh vector
    _drop(
        src,
        "b1.json",
        [
            (1, _tilt(_unit(0), 0.05)),   # corpus dup (cos ~ 0.9988)
            (2, fresh_a),                  # survivor
            (3, _tilt(fresh_a, 0.04)),     # within-batch dup of 2
        ],
    )
    curated, stats = _run(spark, warehouse, src, index, n_probe=n_lists)
    assert {r["vec_id"] for r in curated.read().collect()} == {2}
    s0 = stats.read().filter(F.col("batch_id") == 0).first()
    assert (
        s0["n_input"], s0["n_batch_dups"], s0["n_corpus_dups"], s0["n_kept"]
    ) == (3, 1, 1, 1)

    # batch 2 after a RESTART: a dup of batch 1's survivor (the index
    # absorbed vector 2) + a fresh vector
    _drop(
        src,
        "b2.json",
        [(4, _tilt(fresh_a, 0.03)), (5, fresh_b)],
    )
    curated, stats = _run(spark, warehouse, src, index, n_probe=n_lists)
    assert {r["vec_id"] for r in curated.read().collect()} == {2, 5}
    s1 = stats.read().filter(F.col("batch_id") == 1).first()
    assert (s1["n_corpus_dups"], s1["n_kept"]) == (1, 1)

    # drain with no new files: idempotent
    curated, stats = _run(spark, warehouse, src, index, n_probe=n_lists)
    assert {r["vec_id"] for r in curated.read().collect()} == {2, 5}
    assert stats.read().count() == 2


def test_streaming_semantic_dedup_replay_converges(spark, warehouse):
    """Lost-sidecar crash window: replay computes the identical
    survivor set (self-matches filtered; survivors mutually non-dup),
    and ivf_compact sheds the duplicated physical rows."""
    import shutil

    from moisturizer_spark.operators.similarity import (
        ivf_compact,
        ivf_query,
    )
    def _applied_batch(path):
        # raw sidecar cursor, app-id-agnostic (the lifetime namespace is
        # exercised by test_fresh_checkpoint_reprocesses_instead_of_dropping)
        with open(os.path.join(path, "_stream_txn.json")) as fh:
            return json.load(fh)["applied_batch"]

    seed = spark.createDataFrame(
        [(100 + i, _unit(i)) for i in range(8)], SCHEMA
    )
    index = f"{warehouse}/sd_index2"
    ivf_build(seed, index, n_lists=4)
    src = os.path.join(warehouse, "sd_src2")
    os.makedirs(src)
    _drop(src, "b1.json", [(1, _unit(50)), (2, _unit(60))])
    curated, stats = _run(spark, warehouse, src, index, n_probe=4)
    assert {r["vec_id"] for r in curated.read().collect()} == {1, 2}
    assert _applied_batch(index) == 0

    os.remove(os.path.join(index, "_stream_txn.json"))
    shutil.rmtree(os.path.join(warehouse, "sd_ckpt"))
    curated, stats = _run(spark, warehouse, src, index, n_probe=4)
    assert {r["vec_id"] for r in curated.read().collect()} == {1, 2}
    assert stats.read().count() == 1
    assert _applied_batch(index) == 0

    # duplicated (id, vector) rows are inert for queries; compaction
    # sheds them
    probe = spark.createDataFrame([(9, _tilt(_unit(50), 0.03))], SCHEMA)
    got = ivf_query(spark, index, probe, k=1, n_probe=4).collect()
    assert [r["neighbor_id"] for r in got] == [1]
    meta = ivf_compact(spark, index)
    data = spark.read.parquet(os.path.join(index, meta["data_dir"]))
    assert data.count() == data.select("neighbor_id").distinct().count()
    got2 = ivf_query(spark, index, probe, k=1, n_probe=4).collect()
    assert [r["neighbor_id"] for r in got2] == [1]
