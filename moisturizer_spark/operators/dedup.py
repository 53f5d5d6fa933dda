"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Scale notes (100 TB):

- *Exact*: one shuffle on the 128-bit content fingerprint; map-side
  partial aggregation applies. Never shuffles the document text — only
  (fingerprint, id) pairs after the projection, so shuffle bytes are tiny
  relative to input.
- *MinHash-LSH*: banding turns all-pairs O(n²) into a shuffle on band
  signatures; candidate pairs then verify locally. Only signatures travel.
- *n-gram Jaccard*: exact all-pairs via an inverted shingle index
  (explode → self-join on shingle). Quadratic in the worst case — at
  scale use it to VERIFY candidates from LSH, not stand-alone; kept exact
  here because it is the DuckDB-checkable ground truth.
- *SimHash*: linear; 64-bit signature per doc, near-dup = small Hamming
  distance within buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F, types as T

from moisturizer_spark.operators.common import materialize


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fp") -> DataFrame:
    """Content fingerprint: md5 of the normalized text.

    md5 (not xxhash/murmur) because it is bit-identical across engines —
    the DuckDB oracle can reproduce it. Normalization: lowercase +
    whitespace-collapse, the usual first step of near-dup pipelines.
    """
    normalized = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return df.withColumn(out_col, F.md5(F.trim(normalized)))


def exact_dedup(
    df: DataFrame, key_cols: list[str] | None = None, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup: keep one representative row per content group.

    Representative = min(id) per fingerprint — deterministic, unlike
    ``dropDuplicates`` which keeps an arbitrary row. Single hash-shuffle
    on the fingerprint.
    """
    if key_cols is None:
        df = fingerprint(df, text_col)
        key_cols = ["fp"]
    w = Window.partitionBy(*key_cols).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def incremental_exact_dedup(
    new_docs: DataFrame,
    store,
    text_col: str = "text",
    id_col: str = "doc_id",
    record: bool = True,
) -> DataFrame:
    """Exact dedup of a NEW batch against a persisted fingerprint store
    — the streaming-corpus pattern: dedup state is a keyed table
    (:class:`~moisturizer_spark.storage.ParquetTable` keyed on the
    fingerprint), so it survives restarts, is shared across pipelines,
    and grows by one tiny upsert per batch instead of re-scanning the
    historical corpus.

    Semantics: returns the batch rows that are (a) first of their
    content group WITHIN the batch (min id wins, deterministic) and
    (b) unseen in the store; then records the survivors' fingerprints.
    Calling it from ``foreachBatch`` gives exactly-once streaming dedup
    when the caller threads the batch id through ``txn`` upserts.

    Scale: the anti-join runs on (fingerprint, id) projections only —
    document text never shuffles. The store is bucketed on the
    fingerprint, so at 100 TB the join co-partitions store-side reads
    by bucket; the store row is 2 small strings per unique document.

    ``record=False`` skips the store upsert and only computes the
    survivors — for callers that must sequence the two table writes
    themselves under per-table txn watermarks (the replay-safe streaming
    pattern in :func:`moisturizer_spark.streaming.curation.
    start_curation_stream`, which appends survivors to the curated table
    BEFORE recording their fingerprints so a crash between the writes
    re-derives the identical survivor set on replay).
    """
    batch = exact_dedup(new_docs, text_col=text_col, id_col=id_col)
    if store.exists():
        seen = store.read().select(F.col(store.key).alias("fp"))
        batch = batch.join(seen, on="fp", how="left_anti")
    # cut the plan: the upsert below reads the survivors, and the caller
    # reads them again — one computation, two consumers
    batch = materialize(batch)
    if record:
        fps = batch.select(
            F.col("fp").alias(store.key),
            F.col(id_col).cast("string").alias("first_doc_id"),
        )
        store.upsert(fps)
    return batch


def shingles(df: DataFrame, text_col: str = "text", n: int = 3, out_col: str = "shingle") -> DataFrame:
    """Explode a text column into its distinct character n-grams.

    JVM-side: sequence → transform → explode; no Python per row.
    """
    # bind the normalized text as a lambda variable so the regexp runs
    # once per row, not once per gram (expressions inside a transform
    # lambda are re-evaluated per element — O(n^2) without the binding)
    grams = F.expr(
        f"transform(array(regexp_replace(lower({text_col}), '\\\\s+', ' ')), t -> "
        f"array_distinct(transform(sequence(1, greatest(length(t) - {n - 1}, 1)), "
        f"i -> substring(t, i, {n}))))[0]"
    )
    # explode_outer: keeps InferFiltersFromGenerate from duplicating the
    # gram expression into a size()>0 pre-filter (inner generates only);
    # the array is never empty, so behavior is unchanged.
    return df.withColumn(out_col, F.explode_outer(grams))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard similarity via an inverted index.

    plan: explode shingles → distinct(id, shingle) → self-join on shingle
    (the inverted index; one shuffle) → count common shingles per pair →
    join per-doc shingle counts (broadcast-able) → jaccard filter.
    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    sh = materialize(
        shingles(df.select(id_col, text_col), text_col, n)
        .select(F.col(id_col).alias("_id"), "shingle")
        .distinct()
    )
    sizes = sh.groupBy("_id").agg(F.count("*").alias("_sz"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), on="shingle")
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    return (
        pairs.join(F.broadcast(sizes).withColumnRenamed("_id", "id_a").withColumnRenamed("_sz", "sz_a"), "id_a")
        .join(F.broadcast(sizes).withColumnRenamed("_id", "id_b").withColumnRenamed("_sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    n: int = 3,
) -> DataFrame:
    """Per-document MinHash signature as ``sig: array<bigint>``.

    One hash family per signature position via ``xxhash64(shingle, k)`` —
    the k-th permutation's minimum is a plain ``min()`` aggregate, so the
    whole signature is ONE hash-shuffle with map-side partial aggregation
    and full whole-stage codegen. Shuffle payload is (id, 32×8 bytes), not
    the text.
    """
    sh = shingles(df.select(id_col, text_col), text_col, n).select(
        F.col(id_col).alias("_id"), "shingle"
    )
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(k))).alias(f"_mh{k}")
        for k in range(num_hashes)
    ]
    sigs = sh.groupBy("_id").agg(*aggs)
    return sigs.select(
        "_id", F.array(*[f"_mh{k}" for k in range(num_hashes)]).alias("sig")
    )


def _band_shape(
    num_hashes: int, threshold: float, min_recall: float = 0.9
) -> tuple[int, int]:
    """(bands, rows_per_band): the most selective banding (largest rows)
    whose candidate probability for a pair AT the threshold,
    ``1 - (1 - t^r)^b``, still clears ``min_recall``. Candidates are
    verified exactly afterwards, so extra false positives only cost
    verification work — missed candidates are gone for good."""
    best = (num_hashes, 1)
    for rows in range(1, num_hashes + 1):
        if num_hashes % rows:
            continue
        bands = num_hashes // rows
        recall_at_t = 1.0 - (1.0 - threshold**rows) ** bands
        if recall_at_t >= min_recall:
            best = (bands, rows)
    return best


def _det_hash60(col, k: int | None = None):
    """60-bit md5-derived hash — the oracle-provable stand-in for the
    seeded ``xxhash64`` family: bit-identical in any md5-capable engine,
    so a DuckDB oracle can replay signatures, band buckets, AND verify
    sets. Even a hash collision is replayed identically (both engines
    compute the same hash), so parity cannot break — unlike an
    engine-private hash, where the oracle must trust the claim. ``k``
    selects the permutation; ``None`` is the verify-set hash."""
    prefix = F.lit("v:" if k is None else f"{k}:")
    return F.conv(
        F.substring(F.md5(F.concat(prefix, col)), 1, 15), 16, 10
    ).cast("bigint")


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    threshold: float = 0.6,
    det: bool = False,
    n: int = 3,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs, pure DataFrame ops.

    plan: signature pass (one shuffle, see :func:`minhash_signatures`) →
    band the signature into (bands × rows) and explode one row per band →
    self-join on (band, band_hash) — the LSH bucket shuffle; only pairs
    agreeing on ≥1 band meet — → verify candidates EXACTLY: join each
    side's distinct-shingle-HASH set and compute true Jaccard via
    array_intersect, filter ≥ threshold. Banding prunes the O(n²) pair
    space; exact verification removes estimator noise, so the only
    approximation left is candidate recall (banding chosen ≥0.9 at the
    threshold, see :func:`_band_shape`) plus a negligible 64-bit
    hash-collision term on the verify sets.

    The verify state per document is ``collect_set(xxhash64(shingle))``
    — 8 bytes per distinct shingle instead of the raw shingle string
    (~5-10× smaller at corpus scale): set identity is all exact Jaccard
    needs, so hashing shrinks the cached per-doc state AND the two
    verify-join payloads without changing the result. Everything stays
    JVM-side in whole-stage codegen (no ML Vector boxing, no per-row
    Python); the bucket join shuffles 16-byte band keys, and only
    *candidate* pairs ever see the hashed sets. Returns
    (id_a, id_b, jaccard_distance) with id_a < id_b, deterministic
    (seeded xxhash64).

    ``det=True`` swaps the hash family to md5-derived 60-bit values
    (:func:`_det_hash60`) — ~3x slower to hash but bit-replayable by a
    DuckDB oracle end to end (signatures, buckets, verify sets); the
    plan shape is identical. xxhash64 remains the scale default.
    """
    bands, rows = _band_shape(num_hashes, threshold)
    # ONE shingle scan + ONE shuffle yields both the signature (32 min
    # aggregates) and the exact-verify shingle set per document.
    # ``n`` is the shingle size — exposed so callers matching a
    # persisted index's sidecar (streaming/near_dup.py) apply the SAME
    # Jaccard semantics within-batch as the index applies cross-batch.
    per_doc = materialize(
        _minhash_per_doc(df, id_col, text_col, num_hashes, n=n, det=det)
    )
    banded = _minhash_banded(per_doc.select("_id", "sig"), bands, rows, det=det)
    candidates = (
        banded.alias("a")
        .join(banded.alias("b"), on=["band", "bsig"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    grams = per_doc.select(F.col("_id").alias("_gid"), "_grams")
    return (
        candidates.join(grams.select(F.col("_gid").alias("id_a"), F.col("_grams").alias("_ga")), "id_a")
        .join(grams.select(F.col("_gid").alias("id_b"), F.col("_grams").alias("_gb")), "id_b")
        .withColumn(
            "jaccard_distance",
            1.0
            - F.size(F.array_intersect("_ga", "_gb")).cast("double")
            / F.size(F.array_union("_ga", "_gb")).cast("double"),
        )
        .filter(F.col("jaccard_distance") <= 1.0 - threshold)
        .select("id_a", "id_b", "jaccard_distance")
    )


def _minhash_per_doc(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int, n: int,
    det: bool = False,
) -> DataFrame:
    """One shingle scan + one shuffle → (_id, sig array, _grams verify set).

    Shared by the transient pair finder and the persisted index: the
    signature is 32 min-aggregates and the exact-verify state is the
    8-byte-hashed shingle set (see :func:`minhash_near_duplicates`).
    ``det=True`` uses the md5 family (:func:`_det_hash60`).

    The aggregate list is built as PARSED SQL STRINGS, not nested
    Column calls: the Column form cost ~32×(4-6) py4j round trips —
    ~0.4-0.6 s of driver time per query at B=32 (measured r11), pure
    plan-build overhead repeated by every minhash-family query. One
    ``F.expr`` per aggregate is a single JVM parse each; the analyzed
    expressions are identical (guide §4's "control what crosses the
    Python boundary" applied to plan construction, the
    ``poisson_bootstrap_ci`` weight-ladder precedent; plans verified
    byte-identical modulo expr ids)."""
    if det:
        def perm_sql(k: int | None) -> str:
            prefix = "v:" if k is None else f"{k}:"
            return (
                f"CAST(conv(substring(md5(concat('{prefix}', shingle)), "
                "1, 15), 16, 10) AS BIGINT)"
            )
    else:
        def perm_sql(k: int | None) -> str:
            return (
                "xxhash64(shingle)" if k is None
                else f"xxhash64(shingle, {k})"
            )
    sh = shingles(df.select(id_col, text_col), text_col, n).select(
        F.col(id_col).alias("_id"), "shingle"
    )
    per = sh.groupBy("_id").agg(
        *[
            F.expr(f"min({perm_sql(k)}) AS _mh{k}")
            for k in range(num_hashes)
        ],
        F.expr(f"collect_set({perm_sql(None)}) AS _grams"),
    )
    return per.select(
        "_id",
        F.array(*[f"_mh{k}" for k in range(num_hashes)]).alias("sig"),
        "_grams",
    )


def _minhash_banded(
    sigs: DataFrame, bands: int, rows: int, det: bool = False
) -> DataFrame:
    """(_id, sig) → one (_id, band, bsig) row per band.

    The default compresses each band's row values to one 8-byte
    ``xxhash64`` bucket key (smaller exchange). ``det=True`` keys on
    the RAW value slice instead: band membership is then exactly slice
    equality — no engine-private hash anywhere — which is what makes
    the deterministic variant's "the oracle replays the banding
    bit-for-bit, collisions included" claim literally true (an
    xxhash64 band collision would create a Spark-only candidate the
    oracle never sees)."""
    bsig = (
        f"slice(sig, i * {rows} + 1, {rows})"
        if det
        else f"xxhash64(slice(sig, i * {rows} + 1, {rows}))"
    )
    return sigs.select(
        "_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), i -> "
                f"struct(i AS band, {bsig} AS bsig))"
            )
        ).alias("_b"),
    ).select("_id", "_b.band", "_b.bsig")


def minhash_build(
    corpus: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    threshold: float = 0.6,
    n: int = 3,
) -> dict:
    """Build and PERSIST a MinHash-LSH near-dup index — the streaming-
    corpus complement of :func:`minhash_near_duplicates`, analogous to
    ``similarity.ivf_build``: shingle + sign the corpus ONCE and store
    what queries actually join against, so deduping each incoming batch
    against a 100 TB corpus never re-reads or re-hashes corpus text.

    Layout under ``path``:

    - ``bands/``  — (_id, band, bsig) rows, repartitioned on the join
      key ``bsig`` (16-byte LSH bucket keys; at scale this is the only
      corpus-side table the candidate join touches)
    - ``grams/``  — (_id, _grams array<bigint>) 8-byte hashed shingle
      sets, read only for candidate ids (the exact-Jaccard verify state)
    - ``_minhash.json`` — banding shape + column metadata (KBs)

    Returns the sidecar metadata dict. Grow the index with
    :func:`minhash_append` after clearing each batch.
    """
    import json
    import os

    bands, rows = _band_shape(num_hashes, threshold)
    per = materialize(_minhash_per_doc(corpus, id_col, text_col, num_hashes, n))
    _minhash_banded(per.select("_id", "sig"), bands, rows).repartition(
        "bsig"
    ).write.mode("overwrite").parquet(os.path.join(path, "bands"))
    per.select("_id", "_grams").write.mode("overwrite").parquet(
        os.path.join(path, "grams")
    )
    # build-time verify-set baseline: the health report measures drift
    # of the CURRENT index population against the distribution the band
    # shape was chosen for (one 1-row aggregate over the materialized
    # per-doc frame — bounded)
    base = per.agg(
        F.count(F.lit(1)).alias("_n"), F.sum(F.size("_grams")).alias("_g")
    ).first()
    meta = {
        "num_hashes": num_hashes,
        "bands": bands,
        "rows": rows,
        "shingle_n": n,
        "threshold": threshold,
        "id_col": id_col,
        "id_type": corpus.schema[id_col].dataType.simpleString(),
        "text_col": text_col,
        "built_n_docs": int(base["_n"]),
        "built_sum_grams": int(base["_g"] or 0),
    }
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_minhash.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def _check_minhash_batch(batch: DataFrame, meta: dict) -> None:
    """Validate a batch against the index sidecar BEFORE any plan is
    built: a missing column otherwise fails deep inside the signature
    pipeline with an opaque analysis error, and a differently-typed id
    column silently implicit-casts in the self-pair exclusion and the
    output (e.g. string '7' vs bigint 7 never excluding itself)."""
    cols = set(batch.columns)
    for key in ("id_col", "text_col"):
        if meta[key] not in cols:
            raise ValueError(
                f"batch is missing the index's {key} column "
                f"{meta[key]!r} (batch columns: {sorted(cols)})"
            )
    got = batch.schema[meta["id_col"]].dataType.simpleString()
    if got != meta["id_type"]:
        raise ValueError(
            f"batch id column {meta['id_col']!r} has type {got}, but the "
            f"index was built with {meta['id_type']} — cast the batch id "
            "explicitly; implicit casts would corrupt self-pair exclusion"
        )


def minhash_query(spark, path: str, batch: DataFrame) -> DataFrame:
    """Near-duplicate pairs between a NEW batch and a persisted index
    (:func:`minhash_build`) — the incremental-dedup hot path: one scan
    of the batch (signatures + verify sets), a bucket join against the
    stored band table, and exact-Jaccard verification joining stored
    verify sets for CANDIDATE ids only.

    Returns (corpus_id, batch_id, jaccard_distance), both sides in the
    index's id type. Batch-internal duplicates are not this function's
    job (run the transient pair finder on the batch, it's tiny); corpus
    text is never touched.
    """
    import json
    import os

    with open(os.path.join(path, "_minhash.json")) as fh:
        meta = json.load(fh)
    _check_minhash_batch(batch, meta)
    per = materialize(
        _minhash_per_doc(
            batch, meta["id_col"], meta["text_col"], meta["num_hashes"],
            meta["shingle_n"],
        )
    )
    q_banded = _minhash_banded(
        per.select("_id", "sig"), meta["bands"], meta["rows"]
    )
    stored = spark.read.parquet(os.path.join(path, meta.get("bands_dir", "bands")))
    candidates = (
        stored.alias("c")
        .join(q_banded.alias("q"), on=["band", "bsig"])
        # a batch doc already appended to the index must not pair with
        # itself. When a near-dup PAIR exists on both sides (both docs
        # appended, then re-queried) BOTH directions appear —
        # (corpus=X, batch=Y) and (corpus=Y, batch=X) — because the
        # sides carry different roles; callers deduping a batch keep
        # the batch_id column and don't care, callers wanting one
        # undirected pair per duplicate apply least/greatest outside
        .filter(F.col("c._id") != F.col("q._id"))
        .select(
            F.col("c._id").alias("corpus_id"), F.col("q._id").alias("batch_id")
        )
        .dropDuplicates(["corpus_id", "batch_id"])
    )
    corpus_grams = spark.read.parquet(
        os.path.join(path, meta.get("grams_dir", "grams"))
    )
    return (
        candidates.join(
            corpus_grams.select(
                F.col("_id").alias("corpus_id"), F.col("_grams").alias("_ga")
            ),
            "corpus_id",
        )
        .join(
            per.select(F.col("_id").alias("batch_id"), F.col("_grams").alias("_gb")),
            "batch_id",
        )
        .withColumn(
            "jaccard_distance",
            1.0
            - F.size(F.array_intersect("_ga", "_gb")).cast("double")
            / F.size(F.array_union("_ga", "_gb")).cast("double"),
        )
        .filter(F.col("jaccard_distance") <= 1.0 - meta["threshold"])
        .select("corpus_id", "batch_id", "jaccard_distance")
    )


def minhash_append(spark, path: str, batch: DataFrame) -> None:
    """Add a cleared batch's documents to a persisted MinHash index:
    append their band rows and verify sets (one batch scan, two small
    appended files) — no corpus rewrite, which is what makes
    build-once/append-forever viable on an ever-growing corpus.
    """
    import json
    import os

    with open(os.path.join(path, "_minhash.json")) as fh:
        meta = json.load(fh)
    _check_minhash_batch(batch, meta)
    per = materialize(
        _minhash_per_doc(
            batch, meta["id_col"], meta["text_col"], meta["num_hashes"],
            meta["shingle_n"],
        )
    )
    _minhash_banded(
        per.select("_id", "sig"), meta["bands"], meta["rows"]
    ).repartition("bsig").write.mode("append").parquet(
        os.path.join(path, meta.get("bands_dir", "bands"))
    )
    per.select("_id", "_grams").write.mode("append").parquet(
        os.path.join(path, meta.get("grams_dir", "grams"))
    )


def minhash_compact(spark, path: str) -> dict:
    """Compact a persisted MinHash index after many appends — the
    small-file healing step every append-forever layout eventually
    needs: each :func:`minhash_append` adds ~shuffle-partitions files to
    ``bands/`` and ``grams/``, and after thousands of batches the file
    COUNT (driver listing, parquet footers, task scheduling) dominates
    query cost even though total bytes are unchanged.

    Rewrites both tables into fresh generation directories —
    ``bands`` re-clustered on the join key ``bsig`` exactly like the
    original build — then atomically swaps the sidecar to point at them
    (JSON written to a temp file + ``os.replace``) and removes the old
    generation. Readers resolve directories through the sidecar, so a
    reader holding the OLD sidecar finishes against the old files; the
    swap assumes the index's single-writer discipline (same as append).
    Returns the updated metadata dict.
    """
    import json
    import os
    import shutil

    with open(os.path.join(path, "_minhash.json")) as fh:
        meta = json.load(fh)
    gen = meta.get("compaction_gen", 0) + 1
    old_bands = meta.get("bands_dir", "bands")
    old_grams = meta.get("grams_dir", "grams")
    new_bands, new_grams = f"bands_g{gen}", f"grams_g{gen}"
    # dropDuplicates also heals the at-least-once physical rows a
    # replayed streaming append can leave behind (streaming/near_dup.py:
    # exact duplicate band/gram rows are semantically inert for queries,
    # but compaction is the natural place to shed them)
    spark.read.parquet(os.path.join(path, old_bands)).dropDuplicates(
        ["_id", "band", "bsig"]
    ).repartition("bsig").write.mode("overwrite").parquet(
        os.path.join(path, new_bands)
    )
    spark.read.parquet(os.path.join(path, old_grams)).dropDuplicates(
        ["_id", "_grams"]  # exact replay dups ONLY: an id re-appended
        # with different text keeps both gram rows (mirroring its band
        # rows) rather than arbitrarily dropping one side of the pair
    ).repartition("_id").write.mode("overwrite").parquet(
        os.path.join(path, new_grams)
    )
    meta.update(
        {"bands_dir": new_bands, "grams_dir": new_grams, "compaction_gen": gen}
    )
    tmp = os.path.join(path, "_minhash.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, "_minhash.json"))
    shutil.rmtree(os.path.join(path, old_bands), ignore_errors=True)
    shutil.rmtree(os.path.join(path, old_grams), ignore_errors=True)
    return meta


def minhash_band_stats(bands: DataFrame, grams: DataFrame) -> DataFrame:
    """Exact-integer health statistics over a MinHash band/gram pair —
    the shared kernel of :func:`minhash_health_report` (persisted
    index) and the oracle-checked ``minhash_index_health`` workload
    query (transient det frames): one bucket-sized aggregation over
    (band, bsig) group counts plus one 1-row gram aggregate, every
    output a BIGINT (ratios on the permille grid via integer DIV), so
    the report is engine-reproducible bit for bit.

    Columns: ``n_docs, n_band_rows, n_buckets, max_bucket,
    candidate_pairs_bound`` (Σ n·(n−1)/2 over buckets — the
    self-join candidate-pair ceiling, the quantity that actually
    bounds query cost), ``skew_permille`` (1000·max/mean bucket),
    ``mean_grams_permille`` (verify-set size)."""
    buckets = bands.groupBy("band", "bsig").agg(
        F.count(F.lit(1)).cast("bigint").alias("_nb")
    )
    b = buckets.agg(
        F.sum("_nb").cast("bigint").alias("n_band_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.max("_nb").cast("bigint").alias("max_bucket"),
        F.sum(F.expr("_nb * (_nb - 1) DIV 2"))
        .cast("bigint")
        .alias("candidate_pairs_bound"),
    )
    g = grams.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size("_grams")).cast("bigint").alias("_sum_grams"),
    )
    return b.crossJoin(g).select(
        "n_docs",
        "n_band_rows",
        "n_buckets",
        "max_bucket",
        "candidate_pairs_bound",
        F.expr("1000 * max_bucket * n_buckets DIV n_band_rows")
        .cast("bigint")
        .alias("skew_permille"),
        F.expr("1000 * _sum_grams DIV n_docs")
        .cast("bigint")
        .alias("mean_grams_permille"),
    )


def minhash_health_report(spark, path: str) -> dict:
    """Index-health report for a persisted MinHash index — the text-
    index sibling of ``similarity.ivf_drift_report`` (VERDICT r08 #5):
    band-bucket skew is the quantity that degrades QUERY cost (a hot
    bucket makes the candidate join quadratic in its size), and
    verify-set size drift signals that appended content no longer
    matches the distribution the band shape was tuned for.

    Reports the :func:`minhash_band_stats` integers, plus:

    - ``n_band_files`` — physical file count (the compact trigger)
    - ``gram_drift_permille`` — |current − build-time| mean verify-set
      size as a permille of the build-time mean (None for pre-baseline
      indexes)
    - ``compact_recommended`` (files > 256) and
      ``rebucket_recommended`` (skew > 20x mean or drift > 50%) with
      the thresholds stated so dashboards can apply their own

    Cost: one bucket-sized aggregation + one gram count — safe on a
    cadence at any index size."""
    import json
    import os

    with open(os.path.join(path, "_minhash.json")) as fh:
        meta = json.load(fh)
    bands = spark.read.parquet(
        os.path.join(path, meta.get("bands_dir", "bands"))
    )
    grams = spark.read.parquet(
        os.path.join(path, meta.get("grams_dir", "grams"))
    )
    row = minhash_band_stats(bands, grams).first()  # 1-row stats frame
    n_files = sum(
        1
        for f in os.listdir(
            os.path.join(path, meta.get("bands_dir", "bands"))
        )
        if f.endswith(".parquet")
    )
    # an EMPTY index (zero docs) aggregates to NULLs — report zeros
    # instead of crashing the monitoring hook on the degenerate index
    # it should flag (review r9 finding)
    out = {k: int(row[k]) if row[k] is not None else 0 for k in row.asDict()}
    drift = None
    if meta.get("built_n_docs"):
        built_mean = 1000 * meta["built_sum_grams"] // meta["built_n_docs"]
        if built_mean:
            drift = abs(out["mean_grams_permille"] - built_mean) * 1000 // built_mean
    out.update(
        {
            "n_band_files": n_files,
            "gram_drift_permille": drift,
            "compact_recommended": n_files > 256,
            "rebucket_recommended": out["skew_permille"] > 20_000
            or (drift is not None and drift > 500),
            "thresholds": {
                "skew_permille": 20_000,
                "gram_drift_permille": 500,
                "n_band_files": 256,
            },
        }
    )
    return out


def minhash_rebucket(
    spark,
    path: str,
    corpus: DataFrame,
    num_hashes: int | None = None,
    threshold: float | None = None,
    shingle_n: int | None = None,
) -> dict:
    """Re-shingle/re-band REBUILD of a persisted MinHash index under
    the same atomic generation-swap discipline as
    :func:`minhash_compact` — the operational response when
    :func:`minhash_health_report` flags bucket skew or verify-set
    drift: recompute signatures from the CURRENT corpus text (band
    rows are hashes of signature slices, so a band-shape change cannot
    be derived from stored state — re-banding is honestly a corpus
    scan, the same cost floor as ``similarity.retrain_if_drifted``),
    write fresh ``bands_g<n>``/``grams_g<n>`` generations, swap the
    sidecar via write-temp + ``os.replace``, and remove the old
    generation. Readers holding the old sidecar finish against the old
    files; single-writer discipline as append/compact. The build-time
    gram baseline resets to the new corpus (drift is measured against
    the shape now chosen for it)."""
    import json
    import os
    import shutil

    with open(os.path.join(path, "_minhash.json")) as fh:
        meta = json.load(fh)
    # same guard as query/append: a corpus with a differently-typed id
    # (or missing columns) must fail HERE, not by silently rebuilding an
    # index whose sidecar id_type no longer matches its rows
    _check_minhash_batch(corpus, meta)
    nh = num_hashes or meta["num_hashes"]
    th = threshold if threshold is not None else meta["threshold"]
    n = shingle_n or meta["shingle_n"]
    bands_shape, rows = _band_shape(nh, th)
    per = materialize(
        _minhash_per_doc(corpus, meta["id_col"], meta["text_col"], nh, n)
    )
    gen = meta.get("compaction_gen", 0) + 1
    new_bands, new_grams = f"bands_g{gen}", f"grams_g{gen}"
    _minhash_banded(per.select("_id", "sig"), bands_shape, rows).repartition(
        "bsig"
    ).write.mode("overwrite").parquet(os.path.join(path, new_bands))
    per.select("_id", "_grams").write.mode("overwrite").parquet(
        os.path.join(path, new_grams)
    )
    base = per.agg(
        F.count(F.lit(1)).alias("_n"), F.sum(F.size("_grams")).alias("_g")
    ).first()  # 1-row baseline scalar
    old_bands = meta.get("bands_dir", "bands")
    old_grams = meta.get("grams_dir", "grams")
    meta.update(
        {
            "num_hashes": nh,
            "bands": bands_shape,
            "rows": rows,
            "shingle_n": n,
            "threshold": th,
            "bands_dir": new_bands,
            "grams_dir": new_grams,
            "compaction_gen": gen,
            "built_n_docs": int(base["_n"]),
            "built_sum_grams": int(base["_g"] or 0),
        }
    )
    tmp = os.path.join(path, "_minhash.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, "_minhash.json"))
    shutil.rmtree(os.path.join(path, old_bands), ignore_errors=True)
    shutil.rmtree(os.path.join(path, old_grams), ignore_errors=True)
    return meta


def minhash_rebucket_if_unhealthy(
    spark, path: str, corpus: DataFrame, report: dict | None = None
) -> dict:
    """:func:`minhash_health_report` wired to action, mirroring
    ``similarity.retrain_if_drifted``: when the report recommends a
    rebucket, rebuild from ``corpus`` under the sidecar's current
    parameters; when it only recommends compaction, run
    :func:`minhash_compact` (no corpus scan). Returns
    ``{"rebucketed": bool, "compacted": bool, "report": ...,
    "meta": ...}``."""
    report = report or minhash_health_report(spark, path)
    if report["rebucket_recommended"]:
        meta = minhash_rebucket(spark, path, corpus)
        return {
            "rebucketed": True,
            "compacted": False,
            "report": report,
            "meta": meta,
        }
    if report["compact_recommended"]:
        meta = minhash_compact(spark, path)
        return {
            "rebucketed": False,
            "compacted": True,
            "report": report,
            "meta": meta,
        }
    import json
    import os

    with open(os.path.join(path, "_minhash.json")) as fh:
        meta = json.load(fh)
    return {
        "rebucketed": False,
        "compacted": False,
        "report": report,
        "meta": meta,
    }


def fs_match_scores(
    records: DataFrame,
    pairs: DataFrame,
    id_col: str,
    fields: dict,
) -> DataFrame:
    """Fellegi–Sunter record-linkage scoring (Fellegi & Sunter 1969) —
    the probabilistic step between candidate generation
    (:func:`levenshtein_pairs` + blocking) and survivorship
    (:func:`golden_records`): each candidate pair gets a log-likelihood-
    ratio match score from per-field agreement patterns.

    ``fields`` maps field name → ``(m_num, m_den)``, the m-probability
    P(field agrees | records match) as an exact rational prior (e.g.
    ``(9, 10)``). The u-probabilities P(agree | non-match) are
    ESTIMATED FROM THE DATA exactly: the probability two uniformly
    random records agree on the field, ``u = Σ_v c_v(c_v−1) / N(N−1)``
    over the field's value counts (NULL never agrees), add-1-smoothed
    (``(Σ+1)/(N(N−1)+2)``) so a never-agreeing field cannot produce an
    infinite weight. Per field the pair contributes
    ``w_agree = round(1e9·log2(m/u))`` nano-bits when the values agree
    and ``w_disagree = round(1e9·log2((1−m)/(1−u)))`` when they don't
    — the classic agreement/disagreement weights on the repo's integer
    log grid, summed exactly (BIGINT) into ``score_nano``.

    Returns ``pairs`` + one ``gamma_<field>`` 0/1 column per field +
    ``score_nano``. Determinism: counts are exact integers, each weight
    is ONE log2 rounded once, and the sum is integer — engine- and
    partitioning-independent; an oracle replays value counts, weights,
    and the same sum.

    Scale: one value-count aggregate per field (combinable, value-
    cardinality-sized) collapsing to a ONE-row weight header that
    cross-joins (broadcast) onto the pair frame; record attributes join
    in via two plain equi-joins keyed on ``id_col`` (no broadcast hint —
    records can be arbitrarily large; AQE broadcasts when small). Pair
    volume
    is whatever the caller's blocking produced — this operator adds no
    quadratic work of its own."""
    spark = records.sparkSession
    n_row = records.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    hdr = None
    for f, (mn, md) in fields.items():
        if not (0 < mn < md):
            raise ValueError(f"m for {f!r} must satisfy 0 < m < 1 (got {mn}/{md})")
        agree = (
            records.filter(F.col(f).isNotNull())
            .groupBy(f)
            .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
            .agg(F.sum(F.expr("_c * (_c - 1)")).cast("bigint").alias(f"_un_{f}"))
        )
        hdr = agree if hdr is None else hdr.crossJoin(F.broadcast(agree))
    hdr = hdr.crossJoin(F.broadcast(n_row))
    # one-row weight header: per field the agree/disagree nano weights
    weight_cols = []
    for f, (mn, md) in fields.items():
        un = f"(coalesce(_un_{f}, CAST(0 AS BIGINT)) + 1)"
        ud = "(_n * (_n - 1) + 2)"
        m = f"(CAST({mn} AS DOUBLE) / CAST({md} AS DOUBLE))"
        u = f"(CAST({un} AS DOUBLE) / CAST({ud} AS DOUBLE))"
        weight_cols.append(
            F.expr(
                f"CAST(round(1e9 * log2({m} / {u})) AS BIGINT)"
            ).alias(f"_wa_{f}")
        )
        weight_cols.append(
            F.expr(
                f"CAST(round(1e9 * log2((1.0 - {m}) / (1.0 - {u}))) AS BIGINT)"
            ).alias(f"_wd_{f}")
        )
    hdr = hdr.select(*weight_cols)

    a_proj = records.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f).alias(f"_a_{f}") for f in fields],
    )
    b_proj = records.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f).alias(f"_b_{f}") for f in fields],
    )
    # record projections join WITHOUT a broadcast hint: records can be
    # arbitrarily large (the same unguarded-broadcast hazard gated in
    # IncrementalCCView) — AQE picks broadcast when the side is small;
    # only the ONE-row weight header is hinted
    scored = (
        pairs.join(a_proj, "id_a")
        .join(b_proj, "id_b")
        .crossJoin(F.broadcast(hdr))
    )
    gammas = []
    contribs = []
    for f in fields:
        g = (
            F.col(f"_a_{f}").isNotNull()
            & F.col(f"_b_{f}").isNotNull()
            & (F.col(f"_a_{f}") == F.col(f"_b_{f}"))
        )
        gammas.append(g.cast("int").alias(f"gamma_{f}"))
        contribs.append(
            F.when(g, F.col(f"_wa_{f}")).otherwise(F.col(f"_wd_{f}"))
        )
    total = contribs[0]
    for c in contribs[1:]:
        total = total + c
    return scored.select(
        *pairs.columns, *gammas, total.cast("bigint").alias("score_nano")
    )



def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64,
    det: bool = False,
) -> DataFrame:
    """64-bit SimHash signature per document, JVM-side.

    token hash = xxhash64(token); signature bit b = sign of the sum over
    tokens of (+1 if bit set else -1). Expressed with higher-order array
    functions — linear scan, no shuffle, whole-stage codegen applies.

    ``det=True`` swaps the token hash for the md5-derived 60-bit family
    (:func:`_det_hash60`) and the caller should pass ``bits=60`` —
    every vote, signature bit, band, and Hamming distance is then plain
    integer arithmetic an oracle replays exactly.
    """
    tokens = F.filter(
        F.split(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", " "), r"\s+"),
        lambda t: t != "",
    )
    # hash each token once, then vote per bit over the hash array; all in
    # one SQL higher-order expression (shiftleft's Python API wants a
    # literal shift, but the SQL function accepts a column)
    thash = (lambda t: _det_hash60(t)) if det else (lambda t: F.xxhash64(t))
    hashed = df.withColumn("_th", F.transform(tokens, thash))
    sig_expr = f"""
      aggregate(
        transform(sequence(0, {bits - 1}), b ->
          CASE WHEN aggregate(_th, 0, (acc, h) ->
                 acc + (CASE WHEN (h & shiftleft(CAST(1 AS BIGINT), b)) != 0
                        THEN 1 ELSE -1 END)) > 0
               THEN shiftleft(CAST(1 AS BIGINT), b)
               ELSE CAST(0 AS BIGINT) END),
        CAST(0 AS BIGINT), (acc, x) -> acc | x)
    """
    return hashed.withColumn("simhash", F.expr(sig_expr)).drop("_th")


def simhash_band_layout(n_bands: int, bits: int = 64) -> list[tuple[int, int]]:
    """(offset, width) per band: a ``bits``-wide signature split into
    ``n_bands`` contiguous bands, widths differing by at most 1. The
    SINGLE source of the parity-critical layout — rendered per engine
    by :func:`_simhash_band_exprs` (Spark) and the det-simhash oracle
    builder (DuckDB), so the two cannot drift."""
    base, extra = divmod(bits, n_bands)
    layout, off = [], 0
    for i in range(n_bands):
        width = base + (1 if i < extra else 0)
        layout.append((off, width))
        off += width
    return layout


def _simhash_band_exprs(n_bands: int, bits: int = 64) -> list[str]:
    """Spark SQL rendering of :func:`simhash_band_layout`."""
    exprs = []
    for i, (off, width) in enumerate(simhash_band_layout(n_bands, bits)):
        if width >= 64:  # full-width band: mask literal would overflow BIGINT
            value = "simhash"
        else:
            value = f"shiftright(simhash, {off}) & CAST({(1 << width) - 1} AS BIGINT)"
        exprs.append(f"struct({i} AS band, {value} AS value)")
    return exprs


def sql_det_hash60(prefix_sql: str, expr_sql: str) -> str:
    """DuckDB rendering of :func:`_det_hash60` — THE oracle-side
    60-bit hash, shared by every det-family oracle builder so the hash
    family can only change in lockstep."""
    return (
        f"CAST(('0x' || substr(md5({prefix_sql} || {expr_sql}), 1, 15)) "
        "AS BIGINT)"
    )


def simhash_candidate_pairs(
    sigs: DataFrame, id_col: str, max_hamming: int, bits: int = 64
) -> DataFrame:
    """Exact-recall candidate pairs over (id, simhash) signatures.

    Band count is DERIVED from the requested distance: with
    ``max_hamming + 1`` bands, a pair differing in ≤ max_hamming bits
    cannot touch every band (pigeonhole), so it collides on at least one
    (band, value) key and survives the equi-join. The follow-up exact
    ``bit_count`` filter removes false positives, so recall is 1.0 at any
    ``max_hamming < bits``.

    Scale trade-off: larger ``max_hamming`` → narrower bands → fewer
    distinct band values → bigger join buckets. At corpus scale keep
    ``max_hamming`` small (≤ 8 for 64-bit signatures) or pre-shard the
    join by a content prefix; the recall guarantee holds regardless.
    """
    if not 0 <= max_hamming < bits:
        raise ValueError(f"max_hamming must be in [0, {bits}); got {max_hamming}")
    n_bands = max_hamming + 1
    band_array = "array(" + ", ".join(_simhash_band_exprs(n_bands, bits)) + ")"
    banded = materialize(sigs.select(
        F.col(id_col).alias("_id"),
        "simhash",
        F.explode(F.expr(band_array)).alias("band"),
    ).select("_id", "simhash", "band.band", "band.value"))
    return (
        banded.alias("a")
        .join(banded.alias("b"), on=["band", "value"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.expr("sig_a ^ sig_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_near_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    max_hamming: int = 3, det: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, banded to avoid all-pairs.

    The signature splits into ``max_hamming + 1`` bands so the pigeonhole
    recall guarantee covers exactly the requested distance (see
    :func:`simhash_candidate_pairs`); the band equi-join bounds the
    shuffle, and the exact Hamming filter keeps precision at 1.0.
    ``det=True`` uses 60-bit md5 token hashes — the whole pipeline is
    then integer arithmetic an oracle replays exactly.
    """
    bits = 60 if det else 64
    sigs = simhash(
        df.select(id_col, text_col), id_col, text_col, bits=bits, det=det
    ).select(id_col, "simhash")
    return simhash_candidate_pairs(sigs, id_col, max_hamming, bits=bits)


def levenshtein_pairs(
    df: DataFrame,
    id_col: str = "id",
    str_col: str = "name",
    max_dist: int = 1,
) -> DataFrame:
    """Edit-distance similarity join: (id_a, id_b, dist) for all pairs
    with ``levenshtein ≤ max_dist`` — typo/variant detection over keys,
    names, and titles.

    Blocking: two strings within distance d differ in length by ≤ d, so
    rows bucket by ``len div (d+1)`` and each probes its own and the
    next bucket (pairs ordered a<b by length then id, so one-sided
    probing suffices). That is *complete* — no qualifying pair is
    missed — and turns the all-pairs scan into per-bucket joins. The
    verify uses Spark's thresholded ``levenshtein(l, r, d)``, which
    early-exits DP rows once the band exceeds d (O(d·len) per pair,
    not O(len²)).

    Scale: within-bucket pairing is still quadratic in bucket size —
    fine for key/name domains (bounded length ⇒ bounded buckets). For
    long-text corpora use the q-gram count-filter family
    (:func:`ngram_jaccard_pairs`) for candidates and this verifier on
    the survivors.
    """
    d1 = max_dist + 1
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(str_col).alias("s_a"),
        F.length(str_col).alias("len_a"),
        F.expr(f"length({str_col}) div {d1}").alias("_b"),
    )
    # probe own bucket and the one above: for any qualifying pair, the
    # shorter string's bucket is either equal to or one below the
    # longer's (lengths differ ≤ d < d+1)
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(str_col).alias("s_b"),
        F.length(str_col).alias("len_b"),
        F.explode(
            F.array(
                F.expr(f"length({str_col}) div {d1}"),
                F.expr(f"length({str_col}) div {d1} - 1"),
            )
        ).alias("_b"),
    )
    dist = F.levenshtein(F.col("s_a"), F.col("s_b"), max_dist)
    return (
        a.join(b, on="_b")
        .filter(
            (F.col("len_a") < F.col("len_b"))
            | ((F.col("len_a") == F.col("len_b")) & (F.col("id_a") < F.col("id_b")))
        )
        .filter(F.abs(F.col("len_a") - F.col("len_b")) <= max_dist)
        .withColumn("dist", dist)
        .filter(F.col("dist") >= 0)
        # the dedup ordering above is (length, id); normalize the OUTPUT
        # to the family's id_a < id_b contract
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            F.col("dist").cast("bigint").alias("dist"),
        )
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round: every node connects its STRICTLY LARGER
    neighbors to the minimum of its closed neighborhood.

    Emits {(v, m(u)) : v ∈ Γ(u), v > u} with m(u) = min(Γ(u) ∪ {u}),
    over the symmetrized edge set. One groupBy shuffle on the node id
    plus one co-partitioned join back.
    """
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = sym.groupBy("src").agg(F.min("dst").alias("_mn"))
    return (
        sym.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(
            F.col("dst").alias("src"),
            F.least(F.col("src"), F.col("_mn")).alias("dst"),
        )
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: every node connects its SMALLER-OR-EQUAL
    neighbors (and itself) to the minimum of that set.

    Orients each edge high→low first, so the per-node neighbor set is
    exactly the smaller side; emits {(v, m) : v ∈ N(u) ∪ {u}, v ≠ m}
    with m = min(N(u) ∪ {u}). Same shuffle shape as large-star.
    """
    oriented = edges.filter(F.col("src") != F.col("dst")).select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    mins = oriented.groupBy("src").agg(F.min("dst").alias("_mn"))
    joined = oriented.join(mins, "src")
    # smaller neighbors point at the min...
    nbr_edges = joined.filter(F.col("dst") != F.col("_mn")).select(
        F.col("dst").alias("src"), F.col("_mn").alias("dst")
    )
    # ...and the center itself points at the min (center > all its
    # oriented neighbors, so it is never the min here)
    center_edges = mins.select("src", F.col("_mn").alias("dst"))
    return nbr_edges.unionByName(center_edges).distinct()


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
    local_threshold: int = 100_000,
) -> DataFrame:
    """Undirected connected components by alternating large-star /
    small-star contraction (Kiveris et al., "Connected Components in
    MapReduce and Beyond"): the dedup-clustering primitive (near-dup
    PAIRS → duplicate GROUPS with canonical representative = the
    component's minimum id).

    Each round applies one large-star then one small-star step — both a
    single groupBy-min shuffle plus a co-partitioned join — and the edge
    set provably contracts to a forest of stars rooted at component
    minima in **O(log n) rounds regardless of component diameter** (a
    10k-node path settles in ~14 rounds; min-label propagation, the
    previous implementation here, needed ~10k). ``localCheckpoint``
    cuts lineage each round so the plan stays flat across iterations.

    Convergence is detected from a count + order-independent checksum
    (sum of xxhash64(src, dst)) of the star edge set — one tiny
    aggregate per round over the already-checkpointed frame, no
    edge-set anti-join. The input edge list's lineage (at the call
    sites here, a shingle→inverted-index→verify join over the corpus)
    executes once at the first checkpoint, never per round.

    Returns (id, component) — component is the minimum node id
    reachable; isolated nodes map to themselves.

    **Size-gated local solve** (the GraphFrames pattern): after the
    dedup/verify pipeline, the surviving EDGE set is usually tiny even
    when the corpus is not — duplicate pairs, not documents. When it
    fits under ``local_threshold`` edges (known from the checkpoint,
    no extra scan), a driver-side union-find answers in one bounded
    collect instead of log-n distributed rounds whose per-round job
    overhead would dominate. Above the threshold, star contraction
    runs fully distributed. Node mapping stays in Spark either way —
    only (src, dst) id pairs are ever collected.
    """
    cur = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if cur.count() <= local_threshold:
        member = _local_components(cur)
    else:
        member = _star_components(cur, max_iter)
    return (
        nodes.select(F.col(id_col).alias("id"))
        .join(member, "id", "left")
        .select("id", F.coalesce(F.col("_comp"), F.col("id")).alias("component"))
    )


def _local_components(cur: DataFrame) -> DataFrame:
    """Union-find over a BOUNDED collected edge list → (id, _comp) rows
    for non-isolated nodes. Path-halving find, union by min root so the
    representative is the component minimum."""
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    rows = cur.collect()
    for r in rows:
        a, b = r["src"], r["dst"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    out = [(node, find(node)) for node in parent]
    id_field = cur.schema["src"]
    schema = T.StructType(
        [
            T.StructField("id", id_field.dataType),
            T.StructField("_comp", id_field.dataType),
        ]
    )
    return cur.sparkSession.createDataFrame(out, schema)


def _star_components(cur: DataFrame, max_iter: int) -> DataFrame:
    """Distributed star contraction → (id, _comp) rows for non-isolated
    nodes. See :func:`connected_components` for the algorithm notes."""

    def _sig(df: DataFrame) -> tuple[int, int]:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal sum: immune to ANSI bigint overflow on large edge sets
            F.coalesce(
                F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")), F.lit(0)
            ).alias("h"),
        ).head()
        return (row["n"], row["h"])

    prev = _sig(cur)
    converged = False
    for _ in range(max_iter):
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        sig = _sig(cur)
        if sig == prev:
            converged = True
            break
        prev = sig
    if not converged:
        # Returning the partially-contracted labeling would be silently
        # WRONG (members could point at non-minimum intermediates). With
        # O(log n) round complexity this needs a ~2^max_iter-node
        # component to fire legitimately — so a trip here means either a
        # pathological graph or a bug, and both deserve a loud stop.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "large-star/small-star rounds (edge-set checksum still "
            "changing); raise max_iter"
        )
    # stars point member → component min. A star ROOT never appears as
    # src here, so it has no row — the caller's left-join coalesce maps
    # it to its own id, which IS the component minimum.
    return cur.groupBy(F.col("src").alias("id")).agg(F.min("dst").alias("_comp"))


def golden_records(
    df: DataFrame,
    cluster_col: str,
    id_col: str,
    rules: dict[str, str],
) -> DataFrame:
    """Survivorship — the step AFTER dedup clustering: collapse each
    duplicate cluster to ONE merged "golden" record, column by column,
    under declarative rules:

    - ``'max'`` / ``'min'``: extreme value (freshest balance, earliest
      signup)
    - ``'longest'``: the longest string, ties broken lexicographically
      LARGEST — implemented as ``max(struct(length, value))``, which
      both Spark and an oracle compare field-wise, so the pick is a
      deterministic total order, never an arbitrary arg_max tie
    - ``'sum'``: additive facts merge (balances, counts)

    Every rule is a plain aggregate expression, so the whole merge is
    ONE groupBy over the cluster label (map-side combinable; adding a
    column adds an expression, not a pass) — no window, no self-join,
    no per-cluster collect. Output: ``(cluster, canonical_id = min id,
    n_members, <one column per rule>)``.

    The classic mode/most-frequent rule is deliberately absent: its
    deterministic form needs a per-(cluster, value) count shuffle per
    column — when needed, compute it standalone and join, rather than
    hiding a second shuffle inside this one-pass contract."""
    aggs = [
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
    ]
    for col, rule in rules.items():
        if rule == "max":
            aggs.append(F.max(col).alias(col))
        elif rule == "min":
            aggs.append(F.min(col).alias(col))
        elif rule == "sum":
            aggs.append(F.sum(col).alias(col))
        elif rule == "longest":
            aggs.append(
                F.max(
                    F.struct(
                        F.length(F.col(col)).alias("l"),
                        F.col(col).alias("v"),
                    )
                )["v"].alias(col)
            )
        else:
            raise ValueError(
                f"unknown survivorship rule {rule!r} for column {col!r} "
                "(supported: max, min, sum, longest)"
            )
    return df.groupBy(cluster_col).agg(*aggs)


def minhash_estimate_audit(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    threshold: float = 0.6,
    det: bool = False,
    n: int = 3,
) -> DataFrame:
    """Measure the MinHash ESTIMATOR against exact Jaccard on this
    corpus — the text analog of ``ann_recall_report``'s
    measure-don't-guess audit: the banding recall math
    (:func:`_band_shape`) assumes signature agreement tracks true
    Jaccard; this query reports how well it actually does, per corpus,
    so the num_hashes/threshold knobs are measured choices rather than
    folklore.

    For every banded candidate pair: the estimate is the fraction of
    agreeing signature components, the truth is exact Jaccard over the
    hashed shingle sets (both already computed by the standard
    pipeline — the audit adds ONE zip_with over signatures the verify
    join already carries). Both land as half-away integer micro, so
    the error distribution is exact BIGINT arithmetic an oracle
    replays. Returns ONE row: ``(n_candidates, n_exact_pass,
    n_est_pass, n_disagree, mean_abs_err_micro, max_abs_err_micro)``
    — ``n_disagree`` counts pairs where the estimator's pass/fail
    verdict at ``threshold`` differs from the exact verdict, i.e. the
    pairs a signature-only (estimate-trusting) dedup would get wrong.

    Scale: identical plan shape to :func:`minhash_near_duplicates`
    (one shingle scan, one signature shuffle, bucket join,
    candidates-only verify) plus a map-side final aggregate to one
    row; the audit is runnable on a sample at 100 TB — the estimator's
    bias is a property of the corpus's shingle-set SIZES, which a
    sample preserves.
    """
    thr_micro = int(round(threshold * 1e6))
    bands, rows = _band_shape(num_hashes, threshold)
    per_doc = materialize(
        _minhash_per_doc(df, id_col, text_col, num_hashes, n=n, det=det)
    )
    banded = _minhash_banded(per_doc.select("_id", "sig"), bands, rows, det=det)
    candidates = (
        banded.alias("a")
        .join(banded.alias("b"), on=["band", "bsig"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    state = per_doc.select(
        F.col("_id").alias("_sid"),
        F.col("sig").alias("_sg"),
        F.col("_grams").alias("_gr"),
    )
    paired = candidates.join(
        state.select(
            F.col("_sid").alias("id_a"),
            F.col("_sg").alias("_sa"),
            F.col("_gr").alias("_ga"),
        ),
        "id_a",
    ).join(
        state.select(
            F.col("_sid").alias("id_b"),
            F.col("_sg").alias("_sb"),
            F.col("_gr").alias("_gb"),
        ),
        "id_b",
    )
    scored = paired.select(
        F.expr(
            f"(2 * 1000000 * size(filter(zip_with(_sa, _sb, (x, y) -> x = y),"
            f" v -> v)) + {num_hashes}) DIV {2 * num_hashes}"
        ).alias("_est"),
        F.expr(
            "(2 * 1000000 * size(array_intersect(_ga, _gb))"
            " + size(array_union(_ga, _gb)))"
            " DIV (2 * size(array_union(_ga, _gb)))"
        ).alias("_exact"),
    ).select(
        "_est",
        "_exact",
        F.abs(F.col("_est") - F.col("_exact")).alias("_err"),
    )
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.count(F.when(F.col("_exact") >= thr_micro, 1))
        .cast("bigint")
        .alias("n_exact_pass"),
        F.count(F.when(F.col("_est") >= thr_micro, 1))
        .cast("bigint")
        .alias("n_est_pass"),
        F.count(
            F.when(
                (F.col("_exact") >= thr_micro) != (F.col("_est") >= thr_micro),
                1,
            )
        )
        .cast("bigint")
        .alias("n_disagree"),
        F.expr(
            "(2 * sum(_err) + count(*)) DIV (2 * count(*))"
        ).alias("mean_abs_err_micro"),
        F.max("_err").cast("bigint").alias("max_abs_err_micro"),
    )
