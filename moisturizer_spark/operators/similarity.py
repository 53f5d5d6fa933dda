"""Similarity search over embedding columns (``array<float>``).

Two paths, per the standard ANN playbook:

- :func:`brute_force_top_k` — exact cosine top-k. The baseline and the
  ground truth for recall measurement. Cross-join of queries × corpus:
  correct strategy when the query side is small (it broadcasts); at 100 TB
  corpus scale the scan is embarrassingly parallel and the top-k is a
  per-partition heap then a tiny final merge (Spark's window-over-rank
  compiles to exactly that via partial TopK in AQE).
- :func:`lsh_top_k` — approximate path via random-hyperplane bucketing
  (``BucketedRandomProjectionLSH``); shuffles only bucket-colliding pairs.

All vector math is JVM-side (``zip_with`` + ``aggregate`` higher-order
functions over ``array<double>``) — no Python on the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_similarity_col(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns, computed JVM-side.

    Sequential left-to-right aggregation — deterministic, and matches the
    DuckDB oracle when both sides compute in double precision.
    """
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, sim, rank); self-matches excluded.
    Ranking uses the *rounded* similarity with the neighbor id as
    tiebreaker so results are stable across engines and runs.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    sim = cosine_similarity_col(F.col("_qv"), F.col("_cv"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def embedding_cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, sim) with
    id_a < id_b and rounded cosine ≥ threshold.

    Exact all-pairs — the ground-truth/verification path, bounded-subset
    only. At corpus scale, generate candidates first (:func:`lsh_top_k`
    buckets or an IVF coarse quantizer) and use this math per candidate
    pair; the scoring expression is identical either way.
    """
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).cast("array<double>").alias("_va")
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).cast("array<double>").alias("_vb")
    )
    sim = F.round(cosine_similarity_col(F.col("_va"), F.col("_vb")), round_digits)
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def lsh_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_tables: int = 3,
) -> DataFrame:
    """Approximate top-k neighbors via random-hyperplane LSH buckets.

    Euclidean-LSH over L2-normalized vectors ⇒ bucket collisions correlate
    with cosine similarity (||a-b||² = 2 - 2·cos on the unit sphere).
    Returns (query_id, neighbor_id, dist, rank). Approximate → rows-only
    driver check; recall vs :func:`brute_force_top_k` asserted in tests.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    def prep(df: DataFrame, out_id: str) -> DataFrame:
        vec = df.select(
            F.col(id_col).alias(out_id),
            array_to_vector(F.col(vec_col).cast("array<double>")).alias("_raw"),
        )
        return Normalizer(inputCol="_raw", outputCol="features", p=2.0).transform(vec)

    c = prep(corpus, "neighbor_id")
    q = prep(queries, "query_id")
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_tables,
        seed=42,
    )
    model = lsh.fit(c)
    joined = model.approxSimilarityJoin(c, q, 2.0, distCol="dist")
    scored = joined.filter(
        F.col("datasetA.neighbor_id") != F.col("datasetB.query_id")
    ).select(
        F.col("datasetB.query_id").alias("query_id"),
        F.col("datasetA.neighbor_id").alias("neighbor_id"),
        F.round(F.col("dist"), 6).alias("dist"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
