"""Z-order layout: Morton-code correctness vs a pure-Python reference,
round-trip fidelity, and the claim that justifies the operator — a
Z-ordered table bounds the WORST column's file-skipping, where a
single-column sort leaves the other column unprunable."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from moisturizer_spark.bucketing import (
    file_range_stats,
    rank_bucket,
    rank_bucket_bounds,
    write_zordered,
    zvalue,
)


def _morton_ref(vals, bits):
    out = 0
    k = len(vals)
    for b in range(bits):
        for j, v in enumerate(vals):
            out |= ((v >> b) & 1) << (b * k + j)
    return out


def test_zvalue_matches_pure_python_morton(spark):
    rng = random.Random(3)
    rows = [(rng.randrange(256), rng.randrange(256)) for _ in range(500)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", zvalue([F.col("x"), F.col("y")], 8).alias("z")).collect()
    for r in got:
        assert r.z == _morton_ref((r.x, r.y), 8)


def test_rank_bucket_is_monotone_and_bounded(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "x long")
    bounds = rank_bucket_bounds(df, "x", bits=4)
    assert len(bounds) == 15
    got = df.select("x", rank_bucket(F.col("x"), bounds).alias("b")).orderBy("x").collect()
    bs = [r.b for r in got]
    assert bs == sorted(bs) and 0 <= min(bs) and max(bs) <= 15


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    rng = random.Random(11)
    rows = [(i, rng.randrange(1024), rng.randrange(1024)) for i in range(40_000)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    base = str(tmp_path_factory.mktemp("zorder"))
    zpath, xpath = os.path.join(base, "z"), os.path.join(base, "xsort")
    write_zordered(df, zpath, ["x", "y"], bits=8, n_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )
    return df, zpath, xpath


def _touched(stats, col, lo, hi):
    """Files whose [min,max] range of `col` intersects [lo, hi)."""
    return sum(
        1
        for r in stats
        if not (r[f"max_{col}"] < lo or r[f"min_{col}"] >= hi)
    )


def test_zorder_round_trip_preserves_rows(spark, layouts):
    df, zpath, _ = layouts
    back = spark.read.parquet(zpath)
    assert back.count() == df.count()
    assert back.select(F.sum("id"), F.sum("x"), F.sum("y")).collect() == \
        df.select(F.sum("id"), F.sum("x"), F.sum("y")).collect()


def test_zorder_bounds_worst_column_skipping(spark, layouts):
    _, zpath, xpath = layouts
    zstats = file_range_stats(spark, zpath, ["x", "y"]).collect()
    xstats = file_range_stats(spark, xpath, ["x", "y"]).collect()
    assert len(zstats) == 16 and len(xstats) == 16

    # ~10%-wide box on each dimension
    zx, zy = _touched(zstats, "x", 100, 200), _touched(zstats, "y", 100, 200)
    xx, xy = _touched(xstats, "x", 100, 200), _touched(xstats, "y", 100, 200)

    # x-sorted: near-perfect on x, hopeless on y (every file spans y)
    assert xx <= 3
    assert xy == 16
    # z-order: BOTH dimensions prune; the worst dimension is far
    # better than the x-layout's worst (16), and at least 2x better
    worst_z, worst_x = max(zx, zy), max(xx, xy)
    assert worst_z * 2 <= worst_x, (zx, zy, xx, xy)


def test_rank_bucket_equalizes_skewed_data(spark):
    """The reason boundaries come from quantiles and not fixed-width
    ranges: on a heavily skewed column (x^4 over [0,1)·1e6 — half the
    mass below ~6% of the range) the rank buckets must still be
    near-equal-population, else the Z-curve degenerates to a 1-D sort
    along the skewed dimension."""
    rng = random.Random(5)
    rows = [(int((rng.random() ** 4) * 1_000_000),) for _ in range(20_000)]
    df = spark.createDataFrame(rows, "x long")
    bounds = rank_bucket_bounds(df, "x", bits=4)
    got = (
        df.select(rank_bucket(F.col("x"), bounds).alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    counts = {r.b: r["count"] for r in got}
    # 16 buckets over 20k rows: expect ~1250 each; allow generous
    # sketch-error slack but forbid degenerate buckets
    assert len(counts) >= 14
    assert max(counts.values()) <= 3 * (20_000 / 16), counts
