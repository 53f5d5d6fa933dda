"""Distributed k-means over embedding columns (Lloyd iterations).

The clustering primitive behind corpus curation at scale: IVF coarse
quantizers (``similarity.ivf_top_k`` uses a one-shot variant), diversity
/ coverage sampling (cap documents per semantic cluster, the embedding
analog of ``sampling.quota_sample``), and near-dup blocking.

Plan economics per Lloyd iteration, designed for a 100 TB corpus:

- **Assignment is a pure map-side projection.** The k centroids (k × dim
  doubles — kilobytes) are inlined as literal arrays into an argmin
  expression over JVM higher-order functions; no join, no shuffle, no
  Python. (On a real cluster the literals ride the task binary exactly
  like a broadcast variable.)
- **Re-centering shuffles k × dim partial sums per partition**, not the
  corpus: posexplode(vector) → partial-sum on (cluster, dim) map-side →
  final agg of k·dim·partitions tiny rows → k×dim means collected to the
  driver (the only driver-side data is the centroid matrix itself).
- Convergence is judged on centroid movement (driver-side, tiny).

Initialization is deterministic: the k vectors with the smallest
md5(vec_id) — uniform over the corpus, stable across runs/engines/
partitionings (same contract as ``sampling.quota_sample``), so cluster
ids are reproducible, which is what makes the rows-only driver check
meaningful. No fixpoint randomness anywhere.

Not in the reference (no analytics operators at all — SURVEY §2c); part
of the mandated LLM-pipeline extension (SURVEY §2d).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F


def _sq_dist_to_literal(vec: Column, centroid: list[float]) -> Column:
    """Squared L2 distance from an array column to a Python-side centroid,
    as a single JVM expression (zip_with + aggregate)."""
    lit = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(vec, lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Add an argmin-distance cluster id column — map-side only.

    Ties break to the lowest cluster index (``array_position`` finds the
    first minimum), deterministically.
    """
    vec = F.col(vec_col).cast("array<double>")
    dists = F.array(*[_sq_dist_to_literal(vec, c) for c in centroids])
    cluster = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    return df.withColumn(out_col, cluster)


def _initial_centroids(
    df: DataFrame, k: int, id_col: str, vec_col: str
) -> list[list[float]]:
    rows = (
        df.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc())
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(rows)}")
    return [[float(v) for v in r[vec_col]] for r in rows]


def kmeans_fit(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 10,
    tol: float = 1e-6,
) -> list[list[float]]:
    """Lloyd k-means; returns the final k×dim centroid matrix.

    Iterations: assignment (map-side argmin against literal centroids) →
    per-(cluster, dimension) partial sums (the only shuffle, k·dim rows
    per partition after map-side combine) → new means on the driver →
    stop when max centroid movement² ≤ ``tol`` or ``max_iter``. Empty
    clusters keep their previous centroid (standard Lloyd fallback).
    """
    centroids = _initial_centroids(df, k, id_col, vec_col)
    vecs = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    for _ in range(max_iter):
        assigned = assign_clusters(vecs, centroids, vec_col="_v")
        sums = (
            assigned.select("cluster", F.posexplode(F.col("_v").cast("array<double>")))
            .groupBy("cluster", "pos")
            .agg(F.sum("col").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cluster: dict[int, dict[int, tuple[float, int]]] = {}
        for r in sums:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = (r["s"], r["n"])
        moved = 0.0
        new_centroids = []
        for ci, old in enumerate(centroids):
            dims = by_cluster.get(ci)
            if not dims:
                new_centroids.append(old)  # empty cluster: keep centroid
                continue
            new = [dims[p][0] / dims[p][1] for p in range(len(old))]
            moved = max(moved, sum((a - b) ** 2 for a, b in zip(old, new)))
            new_centroids.append(new)
        centroids = new_centroids
        if moved <= tol:
            break
    return centroids


def kmeans_inertia(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> float:
    """Sum of squared distances to the nearest centroid (fit quality)."""
    vec = F.col(vec_col).cast("array<double>")
    dists = F.array(*[_sq_dist_to_literal(vec, c) for c in centroids])
    return df.select(F.sum(F.array_min(dists)).alias("i")).first()["i"]


def cluster_sizes(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """(cluster, n_vecs, mean_sq_dist) per cluster — the inspection
    output of a clustering run (balance + tightness)."""
    vec = F.col(vec_col).cast("array<double>")
    dists = F.array(*[_sq_dist_to_literal(vec, c) for c in centroids])
    assigned = df.withColumn(
        "cluster", (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    ).withColumn("_d", F.array_min(dists))
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("_d"), 6).alias("mean_sq_dist"),
        )
        .orderBy("cluster")
    )


def math_isclose_matrix(a: list[list[float]], b: list[list[float]], tol: float = 1e-9) -> bool:
    """Test helper: centroid matrices equal within tolerance."""
    return all(
        math.isclose(x, y, rel_tol=0, abs_tol=tol)
        for ra, rb in zip(a, b)
        for x, y in zip(ra, rb)
    )
