"""Distributed k-means over embedding columns (Lloyd iterations).

The clustering primitive behind corpus curation at scale: IVF coarse
quantizers (``similarity.ivf_top_k`` uses a one-shot variant), diversity
/ coverage sampling (cap documents per semantic cluster, the embedding
analog of ``sampling.quota_sample``), and near-dup blocking.

Plan economics per Lloyd iteration, designed for a 100 TB corpus:

- **One Arrow-batched map stage, zero shuffle.** Assignment + partial
  re-centering run fused in a vectorized numpy kernel (``mapInPandas``):
  each partition emits at most k rows of (cluster, count, dim-length
  sum vector). Iterative dense-vector math is the documented exception
  to the built-ins-first rule — a JVM higher-order argmin over k literal
  centroid arrays costs more in per-iteration plan analysis + codegen
  (measured ~2s/iter at k=10, dim=64) than the whole numpy job (~0.2s),
  and the kernel's plan is iteration-invariant so codegen caches.
- **Driver folds k·dim·n_partitions partial sums** into new means —
  ~k × dim × 8 bytes per partition (at 10k partitions, k=10, dim=64:
  ~50 MB transient, bounded; the corpus itself never moves).
- Convergence is judged on centroid movement (driver-side, tiny).
- The one-shot operators (:func:`assign_clusters`,
  :func:`kmeans_inertia`, :func:`cluster_sizes`) stay pure JVM column
  expressions — literal centroids, no Python in those plans.

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

from pyspark.sql import Column, DataFrame, Window, functions as F

from moisturizer_spark.operators.common import cache_scope, materialize


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
    local_threshold: int = 200_000,
) -> list[list[float]]:
    """Lloyd k-means; returns the final k×dim centroid matrix.

    Size-gated execution (the connected-components / BPE pattern): a
    corpus of ≤ ``local_threshold`` vectors is collected ONCE (bounded:
    200k × dim-64 doubles ≈ 100 MB) and all Lloyd iterations run as one
    driver-side numpy loop — ``max_iter`` Spark jobs become one collect.
    Above the gate, each iteration is one Arrow-batched map stage (numpy
    argmin assignment fused with per-partition partial sums, ≤ k output
    rows per partition, no shuffle) → driver folds partials into new
    means. Both paths: deterministic md5-ranked init, empty clusters
    keep their previous centroid, stop when max centroid movement² ≤
    ``tol`` or ``max_iter``. Assignments are identical across paths;
    centroid floats can differ in the last ulp (partial-sum association)
    — pinned ≈-equal in ``tests/test_clustering.py``.

    The projected (id, vector-as-double) frame is persisted once for the
    whole fit (released on return via :func:`cache_scope`) so each
    distributed iteration reads the cached columnar batch instead of
    re-scanning and re-casting the source table ``max_iter`` times.
    """
    with cache_scope():
        vecs = materialize(
            df.select(
                F.col(id_col).alias("_id"),
                F.col(vec_col).cast("array<double>").alias("_v"),
            )
        )
        if vecs.count() <= local_threshold:
            return _fit_local(vecs.collect(), k, max_iter, tol)
        return _fit_iterations(vecs, k, max_iter, tol)


def _fit_local(rows, k: int, max_iter: int, tol: float) -> list[list[float]]:
    """Driver-side Lloyd mirroring :func:`_fit_iterations` semantics
    exactly (same init ranking as :func:`_initial_centroids`: md5 of the
    stringified id, id tiebreak)."""
    import hashlib

    import numpy as np

    ranked = sorted(
        rows,
        key=lambda r: (
            hashlib.md5(str(r["_id"]).encode("utf-8")).hexdigest(),
            r["_id"],
        ),
    )
    if len(ranked) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(ranked)}")
    centroids = np.asarray(
        [[float(v) for v in r["_v"]] for r in ranked[:k]], dtype=np.float64
    )
    X = np.stack([np.asarray(r["_v"], dtype=np.float64) for r in rows])

    def assign(C):
        # blocked argmin: caps the n×k×dim broadcast temp at ~40 MB
        # (8192 × k × dim doubles), same bound the Arrow kernel gets
        # from its batch size
        out = np.empty(len(X), dtype=np.int64)
        for s in range(0, len(X), 8192):
            blk = X[s : s + 8192]
            out[s : s + 8192] = (
                ((blk[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
            )
        return out

    for _ in range(max_iter):
        a = assign(centroids)
        new = centroids.copy()  # empty clusters keep their centroid
        for ki in np.unique(a):
            new[ki] = X[a == ki].mean(0)
        moved = float(((new - centroids) ** 2).sum(axis=1).max())
        centroids = new
        if moved <= tol:
            break
    return [[float(v) for v in row] for row in centroids]


def _recenter_partials(vecs: DataFrame, centroids) -> list:
    """One fused assignment+partial-sum pass; returns ≤ k rows per
    partition of (cluster, n, sum-vector). The centroid matrix rides the
    task closure (kilobytes — a broadcast variable in effect)."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)

    def part(pdfs):
        for pdf in pdfs:
            if not len(pdf):
                continue
            X = np.stack(pdf["_v"].to_numpy())
            # batch×k×dim temp: bounded by the Arrow batch size (10k
            # rows default), not the partition
            a = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
            ks = np.unique(a)
            yield pd.DataFrame(
                {
                    "cluster": ks.astype("int32"),
                    "n": [int((a == ki).sum()) for ki in ks],
                    "s": [X[a == ki].sum(0).tolist() for ki in ks],
                }
            )

    return vecs.mapInPandas(part, "cluster int, n long, s array<double>").collect()


def _fit_iterations(
    vecs: DataFrame, k: int, max_iter: int, tol: float
) -> list[list[float]]:
    import numpy as np

    centroids = np.asarray(_initial_centroids(vecs, k, "_id", "_v"))
    dim = centroids.shape[1]
    for _ in range(max_iter):
        sums = np.zeros((k, dim))
        ns = np.zeros(k)
        for r in _recenter_partials(vecs, centroids):
            sums[r["cluster"]] += np.asarray(r["s"])
            ns[r["cluster"]] += r["n"]
        nonempty = ns > 0
        new = centroids.copy()  # empty clusters keep their centroid
        new[nonempty] = sums[nonempty] / ns[nonempty, None]
        moved = float(((new - centroids) ** 2).sum(axis=1).max())
        centroids = new
        if moved <= tol:
            break
    return [[float(v) for v in row] for row in centroids]


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


def diversity_sample(
    df: DataFrame,
    k: int,
    per_cluster: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 5,
    salt: str = "div:",
) -> DataFrame:
    """Semantic diversity / coverage sampling: cap the corpus at
    ``per_cluster`` documents per k-means cluster — the embedding-space
    analog of per-domain quota sampling (`sampling.quota_sample`), used
    to keep a training mix from being dominated by one dense semantic
    region (the SemDeDup/D4 curation family's coverage step).

    Fully deterministic: k-means init is md5-ranked, assignment is
    argmin over literal centroids, and within-cluster selection is
    hash-ranked — the same sample on every run and partitioning.

    Scale: the fit is the size-gated :func:`kmeans_fit`; assignment is a
    map-side JVM expression; the only shuffle is the per-cluster quota
    window keyed on the cluster id (k groups — AQE splits the skewed
    dense clusters, which are exactly the ones being truncated).
    """
    from moisturizer_spark.operators.sampling import quota_sample

    centroids = kmeans_fit(
        df, k, id_col=id_col, vec_col=vec_col, max_iter=max_iter
    )
    assigned = assign_clusters(df, centroids, vec_col=vec_col)
    return quota_sample(assigned, "cluster", id_col, per_cluster, salt=salt)


# -- deterministic integer k-means (oracle-replayable Lloyd) ------------------


def _div_half_away(s: int, n: int) -> int:
    """Signed integer division rounded half-away-from-zero — pure
    integer arithmetic, so the DuckDB mirror (truncating ``//`` on the
    sign-split branches) lands on the identical value."""
    q = (2 * abs(s) + n) // (2 * n)
    return q if s >= 0 else -q


def _micro_bound(dim: int) -> int:
    """Largest |micro coordinate| whose worst-case squared distance
    (``dim · (2m)²``) still fits int64. numpy would WRAP silently past
    it (wrong argmin, garbage inertia) while the DuckDB oracle raises —
    the one way the 'nothing to disagree on' claim could break — so the
    kernels check and fail loudly instead. dim=64 → |coord| ≤ ~190."""
    return int((2**63 / dim) ** 0.5 / 2)


def _check_micro(M, bound: int, what: str) -> None:
    import numpy as np

    worst = int(np.abs(M).max()) if M.size else 0
    if worst > bound:
        raise ValueError(
            f"det_kmeans: {what} micro-coordinate |{worst}| exceeds the "
            f"int64-safe bound {bound} (~|coord| <= {bound / 1e6:.0f}); "
            "rescale the embeddings before clustering"
        )


def det_kmeans(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[int]], DataFrame]:
    """ALL-INTEGER Lloyd k-means with a fixed iteration count — the
    oracle-provable sibling of :func:`kmeans_fit`. Floats appear
    exactly once, in the initial quantization; every Lloyd step after
    that is exact integer arithmetic, so no partial-sum association or
    mean-rounding ulp can diverge between engines:

    - coords quantize ONCE to the 1e-6 grid
      (``round(v·1e6) → BIGINT`` — half-away in both engines, pinned
      by ``tests/test_duckdb_semantics.py``);
    - init = the k corpus vectors with the smallest
      (md5(id), id) — the :func:`kmeans_fit` ranking, cluster id =
      rank;
    - assignment = argmin of exact BIGINT squared distances, ties to
      the lowest cluster id (numpy first-occurrence argmin == the
      oracle's per-vector (dist, j) ROW_NUMBER);
    - recentering = per-dim integer mean on the micro grid
      (:func:`_div_half_away`); empty clusters keep their centroid;
    - NO convergence test — ``iters`` is part of the algorithm's
      identity (a movement-based stop would need float comparisons),
      which is also what lets the oracle unroll it.

    Quantizing to 1e-6 perturbs each coordinate by ≤5e-7 — measured
    against :func:`kmeans_fit` the assignments agree except at
    genuinely ambiguous boundary points (test-pinned ≥95% agreement);
    the trade is a clustering an independent engine can replay
    bit-for-bit.

    Returns ``(centroids_micro, assigned)`` where ``assigned`` carries
    (id_col, _m micro-vector, cluster, dist). Scale shape = the
    :func:`kmeans_fit` distributed path: per iteration one fused
    Arrow assign+partial-sum map stage (≤ k·dim rows per partition,
    int64 partials — exact in ANY fold order, which is why the driver
    fold can't break parity), one bounded k·dim-row collect; the
    corpus never shuffles.
    """
    import numpy as np
    import pandas as pd

    micro = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * F.lit(1e6)).cast("bigint"),
    )
    slim = df.select(F.col(id_col).alias("_vid"), micro.alias("_m"))

    def partials_kernel(C_list):
        C = np.asarray(C_list, dtype=np.int64)

        def fn(pdfs):
            for pdf in pdfs:
                if not len(pdf):
                    continue
                M = np.asarray(list(pdf["_m"]), dtype=np.int64)
                _check_micro(M, bound, "corpus")
                d = ((M[:, None, :] - C[None, :, :]) ** 2).sum(-1)
                a = d.argmin(1)
                ks = np.unique(a)
                yield pd.DataFrame(
                    {
                        "c": ks.astype("int32"),
                        "n": [int((a == ki).sum()) for ki in ks],
                        "s": [M[a == ki].sum(0).tolist() for ki in ks],
                    }
                )

        return fn

    # The persist lives only as long as the FIT (init collect +
    # iters−1 partial passes read the cached quantized frame); the
    # scope releases it before return — kmeans_fit's lifetime
    # discipline. The returned `assigned` plan reads the un-persisted
    # projection instead: one extra scan when consumed, zero leaked
    # cache entries in a long-lived session (callers wanting reuse
    # wrap their own cache_scope).
    with cache_scope():
        e = materialize(slim)
        init = (
            e.orderBy(
                F.md5(F.col("_vid").cast("string")).asc(),
                F.col("_vid").asc(),
            )
            .limit(k)
            .collect()  # bounded: k rows
        )
        if len(init) < k:
            raise ValueError(f"k={k} exceeds corpus size {len(init)}")
        cents = [[int(v) for v in r["_m"]] for r in init]
        dim = len(cents[0])
        bound = _micro_bound(dim)
        _check_micro(np.asarray(cents, dtype=np.int64), bound, "init")

        for _ in range(iters - 1):
            parts = e.mapInPandas(
                partials_kernel(cents), "c int, n long, s array<long>"
            ).collect()  # bounded: <= k rows per partition
            sums = [[0] * dim for _ in range(k)]
            ns = [0] * k
            for r in parts:
                ns[r["c"]] += r["n"]
                srow = sums[r["c"]]
                for d_i, v in enumerate(r["s"]):
                    srow[d_i] += v
            cents = [
                [_div_half_away(sums[j][d_i], ns[j]) for d_i in range(dim)]
                if ns[j]
                else cents[j]
                for j in range(k)
            ]

    C_final = cents

    def assign_kernel(pdfs):
        C = np.asarray(C_final, dtype=np.int64)
        for pdf in pdfs:
            if not len(pdf):
                continue
            M = np.asarray(list(pdf["_m"]), dtype=np.int64)
            _check_micro(M, bound, "corpus")
            d = ((M[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            a = d.argmin(1)
            yield pdf.assign(
                cluster=a.astype("int32"),
                dist=d[np.arange(len(a)), a],
            )

    id_sql = slim.schema["_vid"].dataType.simpleString()
    assigned = slim.mapInPandas(
        assign_kernel,
        schema=f"_vid {id_sql}, _m array<bigint>, cluster int, dist long",
    ).withColumnRenamed("_vid", id_col)
    return cents, assigned


def det_diversity_sample(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    per_cluster: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Oracle-replayable diversity sampling: cap the corpus at
    ``per_cluster`` vectors per :func:`det_kmeans` cluster, quota
    ranked by (md5(id), id) — the :func:`diversity_sample` coverage
    semantics with every step (clustering included) bit-reproducible
    by an independent engine. Returns the kept rows with their cluster
    ids. One cluster-keyed quota window over (id, cluster) pairs —
    the corpus vectors themselves never shuffle."""
    _, assigned = det_kmeans(
        df, k=k, iters=iters, id_col=id_col, vec_col=vec_col
    )
    w = Window.partitionBy("cluster").orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        assigned.withColumn("_rq", F.row_number().over(w))
        .filter(F.col("_rq") <= per_cluster)
        .drop("_rq", "_m")
    )
