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


def ivf_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer.

    The standard billion-scale ANN layout, DataFrame-first:

    1. **Train**: pick ``n_lists`` centroids deterministically — the
       lowest-xxhash64 corpus vectors (a uniform pseudo-random sample
       that is stable across runs/engines; no RNG, so resume-safe).
       Centroids are schema-sized → driver + broadcast.
    2. **Assign**: one scan tags each corpus vector with its nearest
       centroid (broadcast loop join over n_lists, JVM higher-order
       math). At rest this would be the partition/cluster key — scans
       of one list touch 1/n_lists of the data.
    3. **Probe**: each query expands to its ``n_probe`` nearest
       centroids, then an equi-join on list id meets only the probed
       lists' vectors — the pruned search; cosine + per-query top-k
       window on ~n_probe/n_lists of the corpus.

    Recall degrades only at list boundaries (tunable via n_probe);
    asserted against :func:`brute_force_top_k` in tests. Returns
    (query_id, neighbor_id, sim, rank).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    unit = _ivf_train(c, n_lists)
    id_type = corpus.schema[id_col].dataType.simpleString()
    # Repartition on the list id after assignment. At scale this is the
    # IVF clustering step itself (vectors of one list co-located, so a
    # probe touches n_probe partitions).
    assigned = _ivf_assign(c, unit, id_type).repartition(F.col("_c_list"))
    q = _ivf_probe_df(queries, unit, n_probe, id_col, vec_col)
    return _ivf_score(assigned, q, k, round_digits)


def _ivf_train(c: DataFrame, n_lists: int) -> list[list[float]]:
    """Deterministic centroid pick: the ``n_lists`` lowest-xxhash64
    corpus vectors (stable pseudo-random sample, no RNG), L2-normalized
    driver-side — ranking by dot(v, ĉ) then equals ranking by cosine."""
    raw = (
        c.orderBy(F.xxhash64(F.col("neighbor_id").cast("string")))
        .limit(n_lists)
        .collect()
    )
    unit = []
    for row in raw:
        v = row["_cv"]
        norm = sum(x * x for x in v) ** 0.5 or 1.0
        unit.append([x / norm for x in v])
    return unit


def _ivf_assign(c: DataFrame, unit: list[list[float]], id_type: str) -> DataFrame:
    """Corpus→list assignment as a fused Arrow numpy kernel (one
    n×dim @ dim×n_lists matmul per batch) instead of a JVM
    higher-order-function expression: HOFs are interpreted (outside
    whole-stage codegen), so the n_lists×dim literal-matrix dot was
    both the hottest expression AND the trigger surface for 4.1's
    alias-expansion miscompile under self-joins (see the eqNullSafe
    note in :func:`_ivf_score`). Ties argmax to the lowest list id."""
    import numpy as np
    import pandas as pd

    U = np.array(unit, dtype=np.float64)  # n_lists × dim, L2-normalized

    def _assign(batches):
        for pdf in batches:
            if len(pdf):
                V = np.array(pdf["_cv"].tolist(), dtype=np.float64)
                codes = (V @ U.T).argmax(1).astype("int32")
            else:
                codes = pd.Series([], dtype="int32")
            yield pdf.assign(_c_list=codes)

    return c.mapInPandas(
        _assign, schema=f"neighbor_id {id_type}, _cv array<double>, _c_list int"
    )


def _ivf_probe_df(
    queries: DataFrame, unit: list[list[float]], n_probe: int,
    id_col: str, vec_col: str,
) -> DataFrame:
    """Probe assignment for the QUERY side, driver-side in plain Python:
    the query set is small by contract (it becomes the broadcast build
    input), and expressing this tiny computation as a second Catalyst
    plan over the same scan trips Spark's self-join deduplication (probe
    explode + large HOF expression ⇒ dangling corpus attribute,
    INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND at runtime). n_queries × n_lists
    dot products cost microseconds on the driver."""
    q_rows = []
    for row in queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    ).collect():
        dots = sorted(
            (
                (-sum(x * y for x, y in zip(row["_qv"], cv)), i)
                for i, cv in enumerate(unit)
            )
        )
        for _, list_id in dots[:n_probe]:
            q_rows.append((row["query_id"], row["_qv"], list_id))
    from pyspark.sql import types as T

    return queries.sparkSession.createDataFrame(
        q_rows,
        T.StructType(
            [
                T.StructField("query_id", queries.schema[id_col].dataType),
                T.StructField("_qv", T.ArrayType(T.DoubleType())),
                T.StructField("_q_list", T.IntegerType()),
            ]
        ),
    )


def _ivf_score(assigned: DataFrame, q: DataFrame, k: int, round_digits: int) -> DataFrame:
    """Probed-list equi-join + cosine + per-query top-k window.

    Null-safe equality on purpose: a plain `=` join key makes Catalyst
    infer an isnotnull() constraint, expand the key's alias into its
    full HOF definition (which references the corpus column), and push
    that filter into the OTHER side — a dangling-attribute internal
    error at runtime in Spark 4.1. `<=>` still hash-joins but
    generates no not-null constraints; list ids are never null anyway."""
    joined = assigned.join(
        F.broadcast(q), assigned["_c_list"].eqNullSafe(q["_q_list"])
    )
    sim = F.round(
        cosine_similarity_col(joined["_qv"], joined["_cv"]), round_digits
    )
    scored = joined.filter(F.col("query_id") != F.col("neighbor_id")).select(
        "query_id", "neighbor_id", sim.alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    max_iter: int = 5,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup:
    Data-efficient learning at web-scale through semantic
    deduplication", 2023): k-means-partition the embedding space, then
    prune near-identical pairs WITHIN each cluster only.

    Returns the SURVIVORS — one representative (min id) per
    semantic-duplicate group: rows whose cosine-nearest kept neighbor
    within the cluster is below ``threshold``. Cross-cluster duplicate
    pairs are sacrificed by construction (the SemDeDup trade: recall for
    a k-fold smaller pair space); raise ``k`` with corpus size to hold
    cluster sizes roughly constant.

    Plan: one Arrow k-means fit (:func:`kmeans_fit`, no shuffle per
    iteration) → map-side cluster assignment → ONE shuffle on the
    cluster id for the within-cluster self-join → pairwise cosine on
    co-clustered pairs only → greedy min-id representative via
    connected components over above-threshold pairs (duplicate groups
    are cliques-ish and tiny, so CC settles in ~2 rounds).
    """
    from moisturizer_spark.operators.clustering import assign_clusters, kmeans_fit
    from moisturizer_spark.operators.dedup import connected_components

    base = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    centroids = kmeans_fit(base, k, id_col="_id", vec_col="_v", max_iter=max_iter)
    assigned = assign_clusters(base, centroids, vec_col="_v", out_col="_cl")
    a = assigned.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("_va"), "_cl"
    )
    b = assigned.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), "_cl"
    )
    sim = F.round(cosine_similarity_col(F.col("_va"), F.col("_vb")), round_digits)
    pairs = (
        a.join(b, on="_cl")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )
    labels = connected_components(
        pairs, df.select(F.col(id_col).alias("id")), id_col="id"
    )
    return (
        labels.filter(F.col("id") == F.col("component"))
        .select(F.col("id").alias(id_col))
        .join(df, on=id_col, how="inner")
    )


def ivf_build(
    corpus: DataFrame,
    path: str,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Build and PERSIST an IVF index: assign once, store the corpus
    partitioned by list id, keep centroids in a sidecar.

    :func:`ivf_top_k` re-trains and re-assigns on every call — fine for
    one-shot queries, wasteful for repeated query batches. At 100 TB the
    assignment scan is the dominant cost, so the index layout IS the
    point: ``ivf_build`` writes the corpus hive-partitioned on
    ``_c_list`` (one directory per inverted list) and
    :func:`ivf_query` prunes to the probed lists at the SCAN — no
    assignment stage, no full-corpus read, just ``n_probe/n_lists`` of
    the files.

    Layout: ``<path>/data/_c_list=<i>/*.parquet`` + ``<path>/_ivf.json``
    (unit centroids, id/vec column names and types — KBs).
    Returns the sidecar metadata dict.
    """
    import json
    import os

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    unit = _ivf_train(c, n_lists)
    id_type = corpus.schema[id_col].dataType.simpleString()
    assigned = _ivf_assign(c, unit, id_type).repartition(F.col("_c_list"))
    assigned.write.partitionBy("_c_list").mode("overwrite").parquet(
        os.path.join(path, "data")
    )
    meta = {
        "n_lists": len(unit),
        "centroids": unit,
        "id_col": id_col,
        "id_type": id_type,
        "vec_col": vec_col,
    }
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_ivf.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def ivf_query(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    round_digits: int = 6,
) -> DataFrame:
    """Query a persisted IVF index (:func:`ivf_build`) — NO assignment
    stage: centroids load from the sidecar (driver, KBs), probe lists
    are computed driver-side, and the corpus scan carries an
    ``isin(probed lists)`` filter on the PARTITION column, so Spark
    prunes to the probed lists' directories before reading a byte
    (``PartitionFilters`` in the scan; pinned by a plan test).

    Returns (query_id, neighbor_id, sim, rank), identical semantics to
    :func:`ivf_top_k` with the same centroids.
    """
    import json
    import os

    with open(os.path.join(path, "_ivf.json")) as fh:
        meta = json.load(fh)
    unit = meta["centroids"]
    q = _ivf_probe_df(queries, unit, n_probe, meta["id_col"], meta["vec_col"])
    probed = sorted({r["_q_list"] for r in q.select("_q_list").collect()})
    assigned = (
        spark.read.parquet(os.path.join(path, meta.get("data_dir", "data")))
        .filter(F.col("_c_list").isin(probed))
    )
    return _ivf_score(assigned, q, k, round_digits)


def ivf_append(spark, path: str, batch: DataFrame) -> None:
    """Append new embeddings to a persisted IVF index
    (:func:`ivf_build`) — the :func:`~moisturizer_spark.operators.dedup.
    minhash_append` analog for vectors: assign the batch to the
    EXISTING centroids from the sidecar and append its rows to the
    per-list partition directories. One batch-sized Arrow assignment
    pass and an append of ~``n_lists`` small files — no corpus rewrite,
    no retrain, which is what makes a growing embedding corpus viable
    without rebuilding the index per batch.

    Centroids are frozen (standard IVF practice — faiss ``add`` vs
    ``train``): recall on appended data equals build-time recall while
    the batch distribution matches the training corpus, and a periodic
    :func:`ivf_build` refresh re-trains if it drifts. With
    ``n_probe = n_lists`` a query is exhaustive regardless of centroid
    placement (pinned by the cross-batch append test).
    """
    import json
    import os

    with open(os.path.join(path, "_ivf.json")) as fh:
        meta = json.load(fh)
    cols = set(batch.columns)
    for key in ("id_col", "vec_col"):
        if meta[key] not in cols:
            raise ValueError(
                f"batch is missing the index's {key} column "
                f"{meta[key]!r} (batch columns: {sorted(cols)})"
            )
    got = batch.schema[meta["id_col"]].dataType.simpleString()
    if got != meta["id_type"]:
        raise ValueError(
            f"batch id column {meta['id_col']!r} has type {got}, but the "
            f"index was built with {meta['id_type']} — cast explicitly"
        )
    c = batch.select(
        F.col(meta["id_col"]).alias("neighbor_id"),
        F.col(meta["vec_col"]).cast("array<double>").alias("_cv"),
    )
    _ivf_assign(c, meta["centroids"], meta["id_type"]).repartition(
        F.col("_c_list")
    ).write.partitionBy("_c_list").mode("append").parquet(
        os.path.join(path, meta.get("data_dir", "data"))
    )


def ivf_compact(spark, path: str) -> dict:
    """Compact a persisted IVF index after many appends — the
    :func:`~moisturizer_spark.operators.dedup.minhash_compact` analog:
    each :func:`ivf_append` adds one file per touched list directory,
    so a long-lived index accumulates file-count overhead (listing,
    footers, task scheduling) without growing in bytes.

    Rewrites the data into a fresh generation directory (one shuffle
    keyed on the list id, restoring one-ish file per list), atomically
    swaps the sidecar pointer, and removes the old generation. Same
    single-writer discipline as append. Returns the updated metadata.
    """
    import json
    import os
    import shutil

    with open(os.path.join(path, "_ivf.json")) as fh:
        meta = json.load(fh)
    gen = meta.get("compaction_gen", 0) + 1
    old_dir = meta.get("data_dir", "data")
    new_dir = f"data_g{gen}"
    # dropDuplicates also heals the at-least-once physical rows a
    # replayed streaming append can leave behind (streaming/
    # semantic_dedup.py): duplicate (id, vector) rows are semantically
    # inert for queries; compaction is the natural place to shed them
    spark.read.parquet(os.path.join(path, old_dir)).dropDuplicates(
        ["neighbor_id", "_cv", "_c_list"]  # exact replay dups ONLY: a
        # re-appended id with a DIFFERENT vector is caller data, not a
        # replay artifact — compaction must not pick one arbitrarily
    ).repartition(
        F.col("_c_list")
    ).write.partitionBy("_c_list").mode("overwrite").parquet(
        os.path.join(path, new_dir)
    )
    meta.update({"data_dir": new_dir, "compaction_gen": gen})
    tmp = os.path.join(path, "_ivf.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, "_ivf.json"))
    shutil.rmtree(os.path.join(path, old_dir), ignore_errors=True)
    return meta


def pq_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 16,
    n_codes: int = 16,
    n_train: int = 256,
    refine: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k via product quantization (PQ) with exact
    re-ranking — the memory-bound billion-scale ANN layout (IVF-PQ's
    second stage, after Jégou et al., "Product Quantization for Nearest
    Neighbor Search", TPAMI 2011).

    1. **Train** (driver): a deterministic hash-ordered sample of
       ``n_train`` corpus vectors, L2-normalized, split into ``m``
       subspaces; tiny numpy k-means learns ``n_codes`` centroids per
       subspace. Codebooks are m×n_codes×(dim/m) — KBs, broadcast.
    2. **Encode** (Arrow ``mapInPandas``): each corpus vector →
       ``m`` uint8-sized code ids (argmin subspace centroid). The code
       table is the compressed index: m bytes/vector instead of 4·dim —
       at 100 TB of float32 embeddings with dim=1024, m=64 PQ codes are
       a 64× memory cut, which is the entire point of PQ.
    3. **ADC scan** (JVM): each query precomputes a lookup table of
       subspace dot products (m·n_codes doubles, driver-side — queries
       are small by the same contract as :func:`ivf_top_k`); the scan
       scores every code row with ``Σ_j LUT[j, code_j]`` via higher-order
       functions over the broadcast LUT — no Python, no vector reads.
    4. **Refine**: the top ``k·refine`` ADC candidates per query fetch
       their exact vectors by id (equi-join, AQE-planned) and re-rank by
       exact cosine — output sims are exact, only the candidate set is
       approximate.

    Returns (query_id, neighbor_id, sim, rank); rows-only driver check,
    recall vs :func:`brute_force_top_k` pinned in tests. Defaults (m=16,
    n_codes=16, refine=8) are tuned for the test corpus's 64-dim
    embeddings — at production dims, scale ``m`` with dim (PQ rule of
    thumb: 4–8 dims per subspace) and let ``refine`` trade scan cost for
    recall.
    """
    import numpy as np
    import pandas as pd

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    train_rows = (
        c.orderBy(F.xxhash64(F.col("neighbor_id").cast("string")))
        .limit(n_train)
        .collect()
    )
    X = np.array([r["_cv"] for r in train_rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    subs = np.array_split(np.arange(X.shape[1]), m)

    def _kmeans(pts: np.ndarray, k_: int, iters: int = 10) -> np.ndarray:
        cb = pts[:k_].copy()  # hash-ordered sample ⇒ pseudo-random, stable init
        for _ in range(iters):
            d = ((pts[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
            assign = d.argmin(1)
            for j in range(k_):
                sel = pts[assign == j]
                if len(sel):
                    cb[j] = sel.mean(0)
        return cb

    codebooks = [_kmeans(X[:, s], n_codes) for s in subs]

    def encode(batches):
        for pdf in batches:
            V = np.array(pdf["_cv"].tolist(), dtype=np.float64)
            V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            codes = np.empty((len(V), m), dtype=np.int32)
            for j, s in enumerate(subs):
                d = ((V[:, None, s] - codebooks[j][None, :, :]) ** 2).sum(-1)
                codes[:, j] = d.argmin(1)
            yield pd.DataFrame(
                {"neighbor_id": pdf["neighbor_id"], "codes": list(codes)}
            )

    # id type comes from the corpus schema (mirrors ivf_top_k's _assign):
    # string / int / any orderable corpus id round-trips unchanged
    _id_type = corpus.schema[id_col].dataType.simpleString()
    encoded = c.mapInPandas(encode, schema=f"neighbor_id {_id_type}, codes array<int>")

    # Per-query ADC lookup tables, flattened to one array<double> each.
    q_rows = []
    for row in queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    ).collect():
        qv = np.asarray(row["_qv"], dtype=np.float64)
        qv /= max(float(np.linalg.norm(qv)), 1e-12)
        lut = np.concatenate([codebooks[j] @ qv[s] for j, s in enumerate(subs)])
        q_rows.append((row["query_id"], [float(x) for x in lut]))
    spark = corpus.sparkSession
    from pyspark.sql import types as T

    q_lut = spark.createDataFrame(
        q_rows,
        T.StructType(
            [
                T.StructField("query_id", queries.schema[id_col].dataType),
                T.StructField("_lut", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    score = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            F.col("_lut"),
            (j * n_codes + F.element_at(F.col("codes"), (j + 1).cast("int")) + 1).cast(
                "int"
            ),
        ),
    )
    cand = (
        encoded.crossJoin(F.broadcast(q_lut))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", score.alias("_adc"))
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("_adc").desc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        cand.withColumn("_r", F.row_number().over(w_adc))
        .filter(F.col("_r") <= k * refine)
        .select("query_id", "neighbor_id")
    )
    # Exact re-rank of the shortlist only.
    q_exact = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    refined = (
        shortlist.join(c, "neighbor_id")
        .join(F.broadcast(q_exact), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_similarity_col(F.col("_qv"), F.col("_cv")), round_digits
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        refined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def semantic_decontamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Semantic (embedding-space) benchmark decontamination: flag every
    corpus vector whose cosine to ANY benchmark vector clears the
    threshold, attributing the nearest benchmark item — the embedding
    analog of the n-gram decontamination pair
    (``docs_decontaminated`` removes, ``docs_benchmark_containment``
    attributes); paraphrased or translated leakage that shares no
    n-grams still lands close in embedding space.

    Returns (corpus_id, nearest_eval_id, sim), one row per flagged
    corpus vector; ties on similarity break to the smallest eval id.

    Scale: the benchmark side is small by nature (eval suites are
    thousands of items) and BROADCASTS; the corpus scan is
    embarrassingly parallel; the threshold filter runs BEFORE the
    ranking window, so only already-flagged (corpus, eval) rows — the
    contaminated sliver, not the full cross product — reach the
    shuffle (the survivor of rank-then-filter is identical: the
    max-sim row clears the threshold iff any row does). At extreme
    benchmark sizes the same scoring expression rides IVF/LSH
    candidates instead of the broadcast product. NOT a
    :func:`brute_force_top_k` wrapper despite the similar shape: that
    operator broadcasts its query batch and ranks per query; this one
    broadcasts the benchmark and ranks per CORPUS row — the opposite
    side must stay distributed.

    Zero-norm vectors are undefined under cosine and must be excluded
    by the caller: Spark yields NULL for 0/0 (row drops) while engines
    with IEEE float division yield NaN (which SQL comparisons order
    ABOVE the threshold) — the one input class where an oracle replay
    diverges.
    """
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    b = benchmark.select(
        F.col(id_col).alias("nearest_eval_id"),
        F.col(vec_col).cast("array<double>").alias("_bv"),
    )
    sim = F.round(
        cosine_similarity_col(F.col("_cv"), F.col("_bv")), round_digits
    )
    scored = (
        c.crossJoin(F.broadcast(b))
        .select("corpus_id", "nearest_eval_id", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )
    w = Window.partitionBy("corpus_id").orderBy(
        F.col("sim").desc(), F.col("nearest_eval_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("corpus_id", "nearest_eval_id", "sim")
    )


def _det_uniform(key: str) -> float:
    """md5-derived uniform in [0, 1): ``md5(key)[:12 hex]/16^12``.

    THE frozen-constant recipe every det family's literals derive from
    (LSH hyperplanes, IVF centroids, PQ codebooks) — one definition, so
    a future tweak (e.g. widening the hex prefix) cannot desynchronize
    the families."""
    import hashlib

    return int(hashlib.md5(key.encode()).hexdigest()[:12], 16) / float(
        16**12
    )


def det_lsh_planes(
    n_planes: int, dim: int, salt: str = "lshdet"
) -> list[list[float]]:
    """Deterministic random-hyperplane coefficients from md5: plane j,
    dim d gets ``round(2·u − 1, 6)`` for ``u = md5(salt:j:d)/16^12``
    (:func:`_det_uniform`) — plain Python floats whose repr
    round-trips, so they inline as LITERALS into both the Spark plan
    and the oracle's SQL text and the two engines hash with
    bit-identical hyperplanes. The ML-lib LSH (seeded JVM RNG) cannot
    offer that."""
    return [
        [
            round(2.0 * _det_uniform(f"{salt}:{j}:{d}") - 1.0, 6)
            for d in range(dim)
        ]
        for j in range(n_planes)
    ]


def det_lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id of ``vec`` (array<double>) under the
    given hyperplanes, as a Catalyst expression. The dot products are
    LEFT-FOLDS in index order (``F.aggregate`` over ``zip_with``), so
    any engine folding the same doubles in the same order — e.g.
    DuckDB ``list_reduce`` over the products, whose ``((p1+p2)+p3)…``
    equals the 0.0-seeded chain exactly — lands in the same bucket,
    even for near-zero dots where an ulp would flip the sign.

    This form is the SPECIFICATION (and what the SQL oracle renders);
    for bulk assignment use the Arrow kernel inside
    :func:`det_lsh_top_k`, which computes the same left folds
    vectorized across rows — Spark interprets higher-order lambdas per
    element with boxing, ~10x slower (a flat 24x64-node multiply-add
    tree is even worse: it chokes plan processing)."""
    bits = []
    for j, row in enumerate(planes):
        coefs = F.array(*[F.lit(c) for c in row])
        dot = F.aggregate(
            F.zip_with(vec, coefs, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def det_lsh_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 6,
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Deterministic (oracle-replayable) LSH top-k: ``n_tables``
    independent md5-derived hyperplane sets → sign-pattern buckets →
    UNION of bucket-mates across tables → exact cosine re-rank. Same
    economics as :func:`lsh_top_k` (buckets are a map-side projection;
    the candidate join keys on (table, bucket) — an equi-join, never
    an OR-of-equalities nested loop; only candidates see the re-rank
    math) but every step is bit-reproducible by the DuckDB oracle —
    candidate recall is the tables×planes trade (6x4 measures 0.70
    top-5 recall on the test embeddings), PARITY is not. Returns
    (query_id, neighbor_id, sim, rank); an under-filled union returns
    fewer than k rows (deterministically so)."""
    import pandas as pd  # noqa: F401 — mapInPandas contract

    tables = [
        det_lsh_planes(n_planes, dim, salt=f"lshdet{t}")
        for t in range(n_tables)
    ]

    def assign(frames):
        """Arrow kernel: all tables' buckets in one pass. The per-plane
        dot is accumulated DIM BY DIM (``acc += V[:,d]·c[d]``) — the
        exact left-fold association of :func:`det_lsh_bucket` and the
        oracle's ``list_reduce``, vectorized across rows (a numpy
        ``V @ C`` would pairwise-sum and break bucket parity for
        near-zero dots)."""
        import numpy as np

        mats = [np.asarray(p, dtype=np.float64) for p in tables]
        for pdf in frames:
            if len(pdf) == 0:
                continue
            arrs = list(pdf["_v"])
            # validate BEFORE np.asarray: a ragged/NULL batch would
            # otherwise die with numpy's opaque inhomogeneous-shape
            # error instead of the operator's documented message
            bad = next(
                (a for a in arrs if a is None or len(a) != dim), None
            )
            if bad is not None or any(a is None for a in arrs):
                got = "NULL" if bad is None else str(len(bad))
                raise ValueError(
                    f"det_lsh_top_k: expected {dim}-dim vectors, got {got}"
                )
            V = np.asarray(arrs, dtype=np.float64)
            out_rows = {"_vid": pdf["_vid"], "_v": pdf["_v"]}
            for t, C in enumerate(mats):  # C: (n_planes, dim)
                acc = np.zeros((len(pdf), C.shape[0]))
                for d in range(dim):
                    acc += V[:, d : d + 1] * C[:, d]
                # NaN dots: SQL comparison semantics order NaN above
                # everything, so `dot >= 0` is TRUE in both Spark and
                # DuckDB — numpy says False; match the engines
                bits = ((acc >= 0) | np.isnan(acc)).astype(np.int64)
                out_rows[f"_b{t}"] = bits @ (1 << np.arange(C.shape[0]))
            yield pd.DataFrame(out_rows)

    def with_buckets(df: DataFrame, out_id: str, vcol: str) -> DataFrame:
        base = df.select(
            F.col(id_col).alias("_vid"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        id_sql = base.schema["_vid"].dataType.simpleString()
        bucket_schema = ", ".join(
            [f"_vid {id_sql}", "_v array<double>"]
            + [f"_b{t} bigint" for t in range(n_tables)]
        )
        withb = base.mapInPandas(assign, bucket_schema)
        buckets = F.array(*[
            F.struct(F.lit(t).alias("tbl"), F.col(f"_b{t}").alias("bkt"))
            for t in range(n_tables)
        ])
        return (
            withb.select(
                F.col("_vid").alias(out_id),
                F.col("_v").alias(vcol),
                F.explode(buckets).alias("_tb"),
            )
            .select(out_id, vcol, "_tb.tbl", "_tb.bkt")
        )

    c = with_buckets(corpus, "neighbor_id", "_cv")
    q = with_buckets(queries, "query_id", "_qv")
    cand = (
        c.join(F.broadcast(q), ["tbl", "bkt"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        # a pair can meet in several tables; candidates are a set
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sim = F.round(cosine_similarity_col(F.col("_qv"), F.col("_cv")), 6)
    scored = cand.select("query_id", "neighbor_id", sim.alias("sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def sql_det_lsh_bucket(v_sql: str, planes: list[list[float]]) -> str:
    """DuckDB rendering of :func:`det_lsh_bucket` — the identical
    inlined plane literals and an index-ordered ``list_reduce`` fold
    (0.0-seeded left fold == reduce from the first element, exactly)."""
    bits = []
    for j, row in enumerate(planes):
        lit = "[" + ", ".join(repr(c) for c in row) + "]::DOUBLE[]"
        dot = (
            f"list_reduce(list_transform(range(1, {len(row) + 1}), "
            f"i -> {v_sql}[i] * ({lit})[i]), (a, b) -> a + b)"
        )
        bits.append(f"CASE WHEN {dot} >= 0 THEN {1 << j} ELSE 0 END")
    return "(" + " + ".join(bits) + ")"


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


# -- deterministic IVF (oracle-replayable coarse quantizer) -------------------


def _det_unit_rows(n: int, dim: int, salt: str) -> list[list[float]]:
    """``n`` md5-derived pseudo-random L2-normalized rows, each coord
    rounded to 6 decimals AFTER normalization so the final values are
    plain repr-round-tripping Python floats — they inline as LITERALS
    into both the Spark plan and the oracle SQL, and the two engines
    compute with bit-identical constants (the ``det_lsh_planes``
    recipe, plus the normalization both IVF assignment and cosine-free
    dot ranking want). The norm is accumulated in index order so this
    derivation is itself engine-reproducible, though only the rounded
    OUTPUT ever reaches an engine."""
    rows = []
    for j in range(n):
        raw = [
            2.0 * _det_uniform(f"{salt}:{j}:{d}") - 1.0 for d in range(dim)
        ]
        acc = 0.0
        for x in raw:
            acc += x * x
        nrm = acc**0.5 or 1.0
        rows.append([round(x / nrm, 6) for x in raw])
    return rows


def det_ivf_centroids(
    n_lists: int, dim: int, salt: str = "ivfdet"
) -> list[list[float]]:
    """Frozen md5-derived IVF centroids (unit-normalized literals).

    No training, no RNG, no data dependence: list assignment becomes
    pure replayable arithmetic, which is what makes
    :func:`det_ivf_top_k` oracle-provable. Against trained centroids
    this costs recall (lists don't hug the data distribution — recall
    is measured, not promised); the trained sibling :func:`ivf_top_k`
    stays the quality default."""
    return _det_unit_rows(n_lists, dim, salt)


def det_ivf_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 8,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Deterministic (oracle-replayable) IVF top-k: frozen md5
    centroids → nearest-centroid list assignment (argmax of
    index-ordered dot folds, lowest list id on ties) → each query
    probes its ``n_probe`` nearest lists → exact cosine re-rank of the
    probed lists only. Same economics as :func:`ivf_top_k` (one corpus
    scan assigns; at rest the list id is the partition key so a probe
    touches n_probe/n_lists of the data; the probe frame broadcasts)
    but every step is bit-reproducible by the DuckDB oracle: dots are
    dim-by-dim left folds (the ``det_lsh_top_k`` Arrow-kernel
    association), and argmax-with-lowest-index ties equals the SQL
    GREATEST + first-match CASE chain. Embeddings are finite by
    contract (NaN coords would diverge between numpy argmax and SQL
    comparison semantics — the kernel validates dimensions, upstream
    decode validates values). Returns (query_id, neighbor_id, sim,
    rank)."""
    import pandas as pd

    cents = det_ivf_centroids(n_lists, dim)

    def assign(frames):
        import numpy as np

        C = np.asarray(cents, dtype=np.float64)  # n_lists × dim
        for pdf in frames:
            if len(pdf) == 0:
                continue
            arrs = list(pdf["_v"])
            bad = next((a for a in arrs if a is None or len(a) != dim), None)
            if bad is not None:
                got = "NULL" if bad is None else str(len(bad))
                raise ValueError(
                    f"det_ivf_top_k: expected {dim}-dim vectors, got {got}"
                )
            V = np.asarray(arrs, dtype=np.float64)
            acc = np.zeros((len(pdf), C.shape[0]))
            for d in range(dim):  # dim-by-dim: the oracle's left fold
                acc += V[:, d : d + 1] * C[:, d]
            yield pd.DataFrame(
                {
                    "_vid": pdf["_vid"],
                    "_v": pdf["_v"],
                    # first-occurrence argmax == lowest-list-id ties
                    "_lst": acc.argmax(1).astype("int32"),
                }
            )

    c = corpus.select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    id_sql = c.schema["_vid"].dataType.simpleString()
    assigned = c.mapInPandas(
        assign, schema=f"_vid {id_sql}, _v array<double>, _lst int"
    ).withColumnsRenamed({"_vid": "neighbor_id", "_v": "_cv"})

    # Query-side probe, driver-side (queries are broadcast-sized by the
    # ivf_top_k contract): Python's 0.0-seeded += chain IS the left
    # fold, so probe dots are bit-identical to the oracle's list_reduce
    q_rows = []
    for row in queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    ).collect():
        qv = row["_qv"]
        # same contract as the corpus kernel: a wrong-dimension query
        # must not silently zip-truncate against the centroids
        if qv is None or len(qv) != dim:
            got = "NULL" if qv is None else str(len(qv))
            raise ValueError(
                f"det_ivf_top_k: expected {dim}-dim query vectors, got {got}"
            )
        dots = []
        for cv in cents:
            acc = 0.0
            for x, y in zip(qv, cv):
                acc += x * y
            dots.append(acc)
        for lst in sorted(range(n_lists), key=lambda j: (-dots[j], j))[
            :n_probe
        ]:
            q_rows.append((row["query_id"], row["_qv"], lst))
    from pyspark.sql import types as T

    probe = corpus.sparkSession.createDataFrame(
        q_rows,
        T.StructType(
            [
                T.StructField("query_id", queries.schema[id_col].dataType),
                T.StructField("_qv", T.ArrayType(T.DoubleType())),
                T.StructField("_lst", T.IntegerType()),
            ]
        ),
    )
    # a corpus vector lives in exactly ONE list and probed lists are
    # distinct, so a (query, neighbor) pair meets at most once — no
    # dropDuplicates needed (unlike the multi-table det-LSH union)
    sim = F.round(cosine_similarity_col(F.col("_qv"), F.col("_cv")), 6)
    cand = (
        assigned.join(F.broadcast(probe), "_lst")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def sql_det_fold_dot(v_sql: str, coefs: list[float], offset: int = 0) -> str:
    """DuckDB rendering of an index-ordered dot-product fold of
    ``v_sql[offset+1 .. offset+len]`` against literal ``coefs`` —
    seedless ``list_reduce`` (reduce-from-first == the 0.0-seeded
    chain, pinned by ``tests/test_duckdb_semantics.py``)."""
    lit = "[" + ", ".join(repr(c) for c in coefs) + "]::DOUBLE[]"
    return (
        f"list_reduce(list_transform(range(1, {len(coefs) + 1}), "
        f"i -> {v_sql}[{offset} + CAST(i AS INT)] * ({lit})[i]), "
        "(a, b) -> a + b)"
    )


def sql_det_fold_sqdist(
    v_sql: str, coefs: list[float], offset: int = 0
) -> str:
    """DuckDB rendering of the index-ordered squared-distance fold of a
    subvector against literal ``coefs`` — mirrors the det-PQ encode
    kernel's ``acc += (V[:,d] - c[d])²`` association exactly."""
    lit = "[" + ", ".join(repr(c) for c in coefs) + "]::DOUBLE[]"
    return (
        f"list_reduce(list_transform(range(1, {len(coefs) + 1}), "
        f"i -> ({v_sql}[{offset} + CAST(i AS INT)] - ({lit})[i]) * "
        f"({v_sql}[{offset} + CAST(i AS INT)] - ({lit})[i])), "
        "(a, b) -> a + b)"
    )


# -- deterministic PQ (oracle-replayable product quantization) ----------------


def det_pq_codebooks(
    m: int, n_codes: int, d_sub: int, salt: str = "pqdet", scale: float = 0.25
) -> list[list[list[float]]]:
    """Frozen md5-derived PQ codebooks: ``m`` subspaces × ``n_codes``
    centroids × ``d_sub`` dims, uniform in [-scale, scale] and rounded
    to 6 decimals (repr-exact literals — the ``det_lsh_planes``
    recipe). The default scale matches unit-norm embeddings, whose
    subvector coords sit around ±1/√dim: k-means-trained codebooks
    (:func:`pq_top_k`) quantize tighter, but need RNG-free replay to
    be provable — frozen books trade recall for a driver-checkable
    answer (recall is measured in tests, parity is proven by the
    oracle)."""
    return [
        [
            [
                round(
                    scale
                    * (2.0 * _det_uniform(f"{salt}:{j}:{i}:{d}") - 1.0),
                    6,
                )
                for d in range(d_sub)
            ]
            for i in range(n_codes)
        ]
        for j in range(m)
    ]


def det_pq_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    n_codes: int = 8,
    refine: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Deterministic (oracle-replayable) PQ top-k with exact re-rank:
    frozen md5 codebooks → per-subspace nearest-centroid codes (argmin
    of index-ordered squared-distance folds, lowest code on ties) →
    ADC scan against per-query lookup tables → top ``k·refine``
    shortlist → exact cosine re-rank. The same memory economics as
    :func:`pq_top_k` (m 1-byte-scale codes per vector instead of the
    vector; the ADC scan reads only codes; the LUT crossJoin is a
    broadcast of |queries|·m·n_codes doubles) with every step DuckDB
    can replay bit-for-bit: encode distances and LUT dots are left
    folds of literal constants, the ADC sum folds in subspace order,
    and both rankings tie-break on neighbor_id. Returns (query_id,
    neighbor_id, sim, rank) — sims exact, candidate set approximate
    (recall vs brute force measured in tests)."""
    import pandas as pd

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d_sub = dim // m
    books = det_pq_codebooks(m, n_codes, d_sub)

    def encode(frames):
        import numpy as np

        B = np.asarray(books, dtype=np.float64)  # m × n_codes × d_sub
        for pdf in frames:
            if len(pdf) == 0:
                continue
            arrs = list(pdf["_v"])
            bad = next((a for a in arrs if a is None or len(a) != dim), None)
            if bad is not None:
                got = "NULL" if bad is None else str(len(bad))
                raise ValueError(
                    f"det_pq_top_k: expected {dim}-dim vectors, got {got}"
                )
            V = np.asarray(arrs, dtype=np.float64)
            codes = np.empty((len(V), m), dtype=np.int32)
            for j in range(m):
                acc = np.zeros((len(V), n_codes))
                for d in range(d_sub):  # dim-by-dim: the oracle's fold
                    diff = V[:, j * d_sub + d : j * d_sub + d + 1] - B[j, :, d]
                    acc += diff * diff
                # first-occurrence argmin == lowest-code ties
                codes[:, j] = acc.argmin(1)
            yield pd.DataFrame(
                {"_vid": pdf["_vid"], "_v": pdf["_v"], "codes": list(codes)}
            )

    c = corpus.select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    id_sql = c.schema["_vid"].dataType.simpleString()
    encoded = c.mapInPandas(
        encode, schema=f"_vid {id_sql}, _v array<double>, codes array<int>"
    ).withColumnsRenamed({"_vid": "neighbor_id", "_v": "_cv"})

    # Per-query ADC LUTs, driver-side in ordered pure-Python sums (==
    # the oracle's list_reduce folds; queries broadcast-sized by the
    # pq_top_k contract)
    q_rows = []
    for row in queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    ).collect():
        # mirror the encode kernel's contract: an over-long query would
        # otherwise silently use its first `dim` coords
        if row["_qv"] is None or len(row["_qv"]) != dim:
            got = "NULL" if row["_qv"] is None else str(len(row["_qv"]))
            raise ValueError(
                f"det_pq_top_k: expected {dim}-dim query vectors, got {got}"
            )
        lut = []
        for j in range(m):
            for i in range(n_codes):
                acc = 0.0
                for d in range(d_sub):
                    acc += row["_qv"][j * d_sub + d] * books[j][i][d]
                lut.append(acc)
        q_rows.append((row["query_id"], row["_qv"], lut))
    from pyspark.sql import types as T

    q_lut = corpus.sparkSession.createDataFrame(
        q_rows,
        T.StructType(
            [
                T.StructField("query_id", queries.schema[id_col].dataType),
                T.StructField("_qv", T.ArrayType(T.DoubleType())),
                T.StructField("_lut", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    # ADC: fold over subspaces in order, seeded 0.0 — the oracle's
    # range(1, m+1) reduce lands on the identical double
    score = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            F.col("_lut"),
            (
                j * n_codes
                + F.element_at(F.col("codes"), (j + 1).cast("int"))
                + 1
            ).cast("int"),
        ),
    )
    # the ADC scan reads CODES only (the PQ memory story: the full
    # vector column never flows through the scan — only the k·refine
    # shortlist fetches vectors back by id)
    cand = (
        encoded.drop("_cv")
        .crossJoin(F.broadcast(q_lut.drop("_qv")))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", score.alias("_adc"))
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("_adc").desc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        cand.withColumn("_r", F.row_number().over(w_adc))
        .filter(F.col("_r") <= k * refine)
        .select("query_id", "neighbor_id")
    )
    sim = F.round(cosine_similarity_col(F.col("_qv"), F.col("_cv")), 6)
    scored = (
        shortlist.join(
            c.withColumnsRenamed({"_vid": "neighbor_id", "_v": "_cv"}),
            "neighbor_id",
        )
        .join(F.broadcast(q_lut.select("query_id", "_qv")), "query_id")
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


def ivf_drift_report(spark, path: str) -> dict:
    """Index-health report for a persisted IVF index — the ops
    affordance behind the frozen-centroid append policy: appends
    assign to build-time centroids, so a drifting embedding
    distribution shows up as LIST-SIZE SKEW long before recall
    visibly degrades. Reports, from one aggregation over the (tiny)
    per-list counts:

    - ``n_vectors`` / ``n_lists`` / ``mean_list_size``
    - ``max_list_size`` and ``skew`` (max/mean — 1.0 is perfectly
      balanced; heavy appends from a shifted distribution push it up)
    - ``empty_lists`` (lists no vector maps to any more)
    - ``rebuild_recommended`` — skew > 4 or >25% empty lists, the
      conventional re-train triggers (faiss guidance: retrain when the
      add-time distribution departs from the train-time one; the
      thresholds are heuristics, stated in the output so dashboards
      can apply their own)

    Cost: one count per list directory — the data itself is not read
    beyond footers (count pushdown), so this is safe to run on a
    cadence against any size index."""
    import json
    import os

    with open(os.path.join(path, "_ivf.json")) as fh:
        meta = json.load(fh)
    counts = {
        int(r["_c_list"]): r["n"]
        for r in spark.read.parquet(
            os.path.join(path, meta.get("data_dir", "data"))
        )
        .groupBy("_c_list")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()  # bounded: n_lists rows
    }
    n_lists = meta["n_lists"]
    total = sum(counts.values())
    mean = total / n_lists if n_lists else 0.0
    max_sz = max(counts.values(), default=0)
    empty = n_lists - len(counts)
    skew = (max_sz / mean) if mean else 0.0
    return {
        "n_vectors": total,
        "n_lists": n_lists,
        "mean_list_size": round(mean, 2),
        "max_list_size": max_sz,
        "empty_lists": empty,
        "skew": round(skew, 2),
        "rebuild_recommended": skew > 4.0 or empty > n_lists * 0.25,
        "thresholds": {"skew": 4.0, "empty_fraction": 0.25},
    }


def retrain_if_drifted(spark, path: str, report: dict | None = None) -> dict:
    """The operational response :func:`ivf_drift_report` recommends,
    wired to action: when the report's triggers fire (list-size skew
    or empty lists past threshold), RE-TRAIN centroids on the full
    current corpus, re-assign every vector, and atomically swap in the
    new layout — the faiss "retrain when the add distribution departs
    from the train distribution" guidance as a one-call helper that a
    scheduler can run on a cadence.

    Mechanics reuse the :func:`ivf_compact` generation machinery: the
    re-assigned corpus writes to a fresh ``data_g<n>`` directory, the
    sidecar (NEW centroids + data pointer) swaps via write-temp +
    ``os.replace``, and the old generation is removed — readers that
    loaded the old sidecar keep a consistent old view mid-swap; the
    same single-writer discipline as append/compact applies. A retrain
    also inherits compaction's effects (file-count healing, replay-dup
    shedding via the train/assign pipeline reading the union).

    Returns ``{"retrained": bool, "report": <the triggering report>,
    "meta": <sidecar after>}`` — callers can log the report either way.

    Scale: the decision reads only per-list counts (footers); a
    triggered retrain costs one corpus scan for k-means sampling +
    one assign-and-write pass — the same cost profile as the original
    :func:`ivf_build`, which is the honest floor for a retrain."""
    import json
    import os
    import shutil

    report = report or ivf_drift_report(spark, path)
    with open(os.path.join(path, "_ivf.json")) as fh:
        meta = json.load(fh)
    if not report["rebuild_recommended"]:
        return {"retrained": False, "report": report, "meta": meta}
    old_dir = meta.get("data_dir", "data")
    c = (
        spark.read.parquet(os.path.join(path, old_dir))
        .select("neighbor_id", "_cv")
    )
    unit = _ivf_train(c, meta["n_lists"])
    gen = meta.get("compaction_gen", 0) + 1
    new_dir = f"data_g{gen}"
    _ivf_assign(c, unit, meta["id_type"]).repartition(
        F.col("_c_list")
    ).write.partitionBy("_c_list").mode("overwrite").parquet(
        os.path.join(path, new_dir)
    )
    meta.update(
        {"centroids": unit, "data_dir": new_dir, "compaction_gen": gen}
    )
    tmp = os.path.join(path, "_ivf.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, "_ivf.json"))
    shutil.rmtree(os.path.join(path, old_dir), ignore_errors=True)
    return {"retrained": True, "report": report, "meta": meta}
