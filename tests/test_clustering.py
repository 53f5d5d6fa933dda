"""K-means operator: determinism, convergence, planted-cluster recovery."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from moisturizer_spark.operators.clustering import (
    assign_clusters,
    cluster_sizes,
    kmeans_fit,
    kmeans_inertia,
    math_isclose_matrix,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_kmeans_deterministic(spark, emb):
    a = kmeans_fit(emb, k=4, max_iter=3)
    b = kmeans_fit(emb, k=4, max_iter=3)
    assert math_isclose_matrix(a, b, tol=0.0)  # bit-identical, same plan


def test_kmeans_inertia_monotone(spark, emb):
    """More Lloyd iterations never increase inertia."""
    prev = None
    for iters in (1, 2, 4, 8):
        c = kmeans_fit(emb, k=6, max_iter=iters)
        inertia = kmeans_inertia(emb, c)
        if prev is not None:
            assert inertia <= prev + 1e-9, (iters, inertia, prev)
        prev = inertia


def test_kmeans_recovers_separable_blobs(spark):
    """Three well-separated blobs: k=3 recovers them exactly. (The
    corpus's planted labels are NOT separable — supervised nearest-
    label-centroid classification only reaches 37% there, so recovery is
    asserted on data where recovery is information-theoretically
    possible.)"""
    import random

    rng = random.Random(7)
    rows = []
    for b, center in enumerate([(0.0, 0.0), (50.0, 0.0), (0.0, 50.0)]):
        for i in range(40):
            rows.append(
                (b * 100 + i, [center[0] + rng.gauss(0, 1), center[1] + rng.gauss(0, 1)], b)
            )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    centroids = kmeans_fit(df, k=3, max_iter=10)
    assigned = assign_clusters(df, centroids)
    per = assigned.groupBy("label", "cluster").agg(F.count(F.lit(1)).alias("n")).collect()
    from collections import defaultdict

    counts: dict[int, dict[int, int]] = defaultdict(dict)
    for r in per:
        counts[r["label"]][r["cluster"]] = r["n"]
    majority = sum(max(d.values()) for d in counts.values())
    assert majority / len(rows) == 1.0  # perfect recovery on separable data


def test_kmeans_matches_numpy_reference(spark, emb):
    """One Lloyd iteration from the same deterministic init must produce
    the same centroids as a plain numpy implementation (the distributed
    plan computes the same math)."""
    import numpy as np

    from moisturizer_spark.operators.clustering import _initial_centroids

    rows = emb.select("vec_id", "embedding").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    init = np.array(_initial_centroids(emb, 4, "vec_id", "embedding"))
    a = ((X[:, None, :] - init[None, :, :]) ** 2).sum(-1).argmin(1)
    expected = np.stack(
        [X[a == k].mean(0) if (a == k).any() else init[k] for k in range(4)]
    )
    got = np.array(kmeans_fit(emb, k=4, max_iter=1))
    assert np.allclose(got, expected, atol=1e-9), np.abs(got - expected).max()


def test_cluster_sizes_covers_corpus(spark, emb):
    centroids = kmeans_fit(emb, k=5, max_iter=3)
    sizes = cluster_sizes(emb, centroids)
    rows = sizes.collect()
    assert sum(r["n_vecs"] for r in rows) == emb.count()
    assert all(r["mean_sq_dist"] >= 0 for r in rows)
    assert [r["cluster"] for r in rows] == sorted(r["cluster"] for r in rows)


def test_kmeans_k_exceeds_corpus_raises(spark, emb):
    with pytest.raises(ValueError, match="exceeds corpus"):
        kmeans_fit(emb.limit(3), k=5)


def test_empty_cluster_keeps_centroid(spark):
    """Two far groups + a centroid seeded in between: no crash, empty
    clusters retain their previous centroid."""
    df = spark.createDataFrame(
        [(i, [float(i % 2 * 100), 0.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    cents = kmeans_fit(df, k=3, max_iter=4)
    assert len(cents) == 3 and all(len(c) == 2 for c in cents)


def test_local_and_distributed_paths_agree(spark, sf_dir):
    """The size-gated driver solve and the Arrow partial-sum loop must
    produce the same assignments and ≈-equal centroids (floats may
    differ in the last ulp from partial-sum association)."""
    import numpy as np

    from moisturizer_spark.operators.clustering import assign_clusters, kmeans_fit

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    local = kmeans_fit(emb, k=5, max_iter=3)                      # gated path
    dist = kmeans_fit(emb, k=5, max_iter=3, local_threshold=0)    # forced distributed
    assert np.allclose(np.asarray(local), np.asarray(dist), atol=1e-8)
    a = assign_clusters(emb, local).select("vec_id", "cluster")
    b = assign_clusters(emb, dist).select("vec_id", "cluster")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_diversity_sample_quota_and_determinism(spark, sf_dir):
    import pyspark.sql.functions as F

    from moisturizer_spark.operators.clustering import diversity_sample

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    kept = diversity_sample(emb, k=5, per_cluster=7)
    counts = {
        r["cluster"]: r["n"]
        for r in kept.groupBy("cluster").agg(F.count("*").alias("n")).collect()
    }
    assert all(n <= 7 for n in counts.values())
    # under-quota clusters keep everything; total is bounded by corpus
    assert sum(counts.values()) <= emb.count()
    # deterministic end to end
    a = sorted(r["vec_id"] for r in kept.select("vec_id").collect())
    b = sorted(
        r["vec_id"]
        for r in diversity_sample(emb, k=5, per_cluster=7).select("vec_id").collect()
    )
    assert a == b


def test_det_kmeans_agrees_with_float_kmeans(spark, sf_dir):
    """The 1e-6 quantization only moves genuinely ambiguous boundary
    points: assignments agree with the float Lloyd fit on >=95% of
    vectors (same init ranking, same iteration count, no tol stop)."""
    from moisturizer_spark.operators.clustering import (
        assign_clusters,
        det_kmeans,
        kmeans_fit,
    )
    from moisturizer_spark.session import load_tables

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    cents_f = kmeans_fit(emb, k=8, max_iter=3, tol=0.0)
    float_assign = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(emb, cents_f).select(
            "vec_id", "cluster"
        ).collect()
    }
    _, assigned = det_kmeans(emb, k=8, iters=3)
    det_assign = {
        r["vec_id"]: r["cluster"]
        for r in assigned.select("vec_id", "cluster").collect()
    }
    agree = sum(
        1 for v, c in det_assign.items() if float_assign[v] == c
    )
    assert agree / len(det_assign) >= 0.95, agree / len(det_assign)


def test_det_kmeans_deterministic_and_integer(spark, sf_dir):
    from moisturizer_spark.operators.clustering import det_kmeans
    from moisturizer_spark.session import load_tables

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    c1, a1 = det_kmeans(emb, k=8, iters=3)
    c2, a2 = det_kmeans(emb, k=8, iters=3)
    assert c1 == c2
    assert all(isinstance(v, int) for row in c1 for v in row)
    r1 = sorted((r["vec_id"], r["cluster"], r["dist"]) for r in a1.collect())
    r2 = sorted((r["vec_id"], r["cluster"], r["dist"]) for r in a2.collect())
    assert r1 == r2


def test_det_kmeans_k_exceeds_corpus_raises(spark):
    from moisturizer_spark.operators.clustering import det_kmeans

    tiny = spark.createDataFrame(
        [(0, [0.1] * 64), (1, [0.2] * 64)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="exceeds corpus size"):
        det_kmeans(tiny, k=5)


def test_det_div_half_away():
    from moisturizer_spark.operators.clustering import _div_half_away

    assert _div_half_away(7, 2) == 4       # 3.5 -> 4
    assert _div_half_away(-7, 2) == -4     # -3.5 -> -4 (away)
    assert _div_half_away(6, 4) == 2       # 1.5 -> 2
    assert _div_half_away(5, 4) == 1       # 1.25 -> 1
    assert _div_half_away(0, 3) == 0


def test_det_diversity_sample_quota(spark, sf_dir):
    from moisturizer_spark.operators.clustering import det_diversity_sample
    from moisturizer_spark.session import load_tables

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    kept = det_diversity_sample(emb, k=8, iters=3, per_cluster=5)
    sizes = {
        r["cluster"]: r["n"]
        for r in kept.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert all(n <= 5 for n in sizes.values())
    # kept ids are a subset of the corpus
    corpus_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    assert {r["vec_id"] for r in kept.collect()} <= corpus_ids


def test_det_kmeans_partitioning_independent(spark, sf_dir):
    """The core det-kmeans claim: int64 partial sums are exact in ANY
    fold order, so the result cannot depend on how the corpus is
    partitioned. Same centroids and assignments at 1, 3, and 13
    partitions."""
    from moisturizer_spark.operators.clustering import det_kmeans
    from moisturizer_spark.session import load_tables

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    results = []
    for n_parts in (1, 3, 13):
        cents, assigned = det_kmeans(emb.repartition(n_parts), k=8, iters=3)
        rows = sorted(
            (r["vec_id"], r["cluster"], r["dist"]) for r in assigned.collect()
        )
        results.append((cents, rows))
    assert results[0] == results[1] == results[2]
