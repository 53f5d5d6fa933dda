"""Sequence packing: chunked layout arithmetic and FFD bin invariants."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from moisturizer_spark.operators.packing import pack_chunked, pack_first_fit
from moisturizer_spark.operators.textan import tokens_col
from moisturizer_spark.session import load_tables


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_pack_chunked_layout_hand_checked(spark):
    # one shard (n_shards=1): docs 10, 20, 5 tokens with ctx 16:
    # stream offsets 0..9 | 10..29 | 30..34
    df = _docs(spark, [(0, 10), (1, 20), (2, 5)])
    out = {
        r["doc_id"]: r
        for r in pack_chunked(df, ctx_len=16, n_shards=1).collect()
    }
    assert (out[0]["seq_first"], out[0]["seq_last"], out[0]["offset_in_seq"]) == (0, 0, 0)
    assert (out[1]["seq_first"], out[1]["seq_last"], out[1]["offset_in_seq"]) == (0, 1, 10)
    assert (out[2]["seq_first"], out[2]["seq_last"], out[2]["offset_in_seq"]) == (1, 2, 14)


def test_pack_chunked_zero_token_doc_occupies_no_sequence(spark):
    df = _docs(spark, [(0, 16), (1, 0), (2, 4)])
    out = {r["doc_id"]: r for r in pack_chunked(df, ctx_len=16, n_shards=1).collect()}
    # doc 1 sits exactly on the boundary: insertion point 0 of seq 1
    assert out[1]["seq_first"] == out[1]["seq_last"] == 1
    assert out[1]["offset_in_seq"] == 0
    assert out[2]["seq_first"] == 1


def test_pack_chunked_shards_are_independent(spark):
    df = _docs(spark, [(i, 10) for i in range(20)])
    out = pack_chunked(df, ctx_len=16, n_shards=4)
    # each shard packs its own stream: per-shard cumsum restarts at 0
    firsts = (
        out.groupBy("shard_id").agg(F.min("offset_in_seq").alias("o")).collect()
    )
    assert all(r["o"] == 0 for r in firsts)
    assert out.select("shard_id").distinct().count() == 4


def test_ffd_invariants_on_corpus(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"].select(
        "doc_id", F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens")
    )
    ctx = 64
    packed = pack_first_fit(docs, ctx_len=ctx, n_shards=4).cache()
    try:
        n_docs = docs.count()
        assert packed.count() == n_docs  # every doc assigned exactly once
        assert packed.select("doc_id").distinct().count() == n_docs

        # capacity: no bin of untruncated docs exceeds ctx
        fills = (
            packed.filter(~F.col("truncated"))
            .groupBy("shard_id", "bin_id")
            .agg(F.sum("n_tokens").alias("fill"))
            .collect()
        )
        assert fills and all(r["fill"] <= ctx for r in fills)

        # truncated flag exactly marks docs longer than ctx
        flagged = packed.filter(F.col("truncated")).select("n_tokens").collect()
        assert all(r["n_tokens"] > ctx for r in flagged)
        long_docs = packed.filter(F.col("n_tokens") > ctx).collect()
        assert all(r["truncated"] for r in long_docs)
        # an over-length doc gets a dedicated bin
        by_bin = {}
        for r in packed.collect():
            by_bin.setdefault((r["shard_id"], r["bin_id"]), []).append(r)
        for rows in by_bin.values():
            if any(r["truncated"] for r in rows):
                assert len(rows) == 1

        # waste bound: bins within 2x of the volume lower bound, per shard
        stats = (
            packed.groupBy("shard_id")
            .agg(
                (F.max("bin_id") + 1).alias("n_bins"),
                F.sum(F.least(F.col("n_tokens"), F.lit(ctx))).alias("vol"),
            )
            .collect()
        )
        for r in stats:
            lower = max(1, math.ceil(r["vol"] / ctx))
            assert r["n_bins"] <= 2 * lower, (r["shard_id"], r["n_bins"], lower)
    finally:
        packed.unpersist()


def test_ffd_deterministic(spark):
    rows = [(i, (i * 37) % 90 + 1) for i in range(200)]
    df = _docs(spark, rows)
    a = sorted(map(tuple, pack_first_fit(df, ctx_len=100, n_shards=3).collect()))
    b = sorted(map(tuple, pack_first_fit(df, ctx_len=100, n_shards=3).collect()))
    assert a == b
