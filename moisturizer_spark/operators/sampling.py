"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus is never trained on wholesale: it is split into
train/validation/test, rebalanced across sources, and downsampled under
per-domain quotas. Random sampling (``df.sample``) is useless for that at
scale — it is neither reproducible across engines nor stable under
re-partitioning, and a re-run reshuffles the split. Everything here keys
the decision on a **content-derived hash** instead:

- the same row lands in the same split on every engine, every run, every
  partition layout (md5 is md5 — the DuckDB oracle reproduces each query
  bit-for-bit);
- membership survives incremental re-ingestion: adding documents never
  moves an existing document between splits (the property that keeps a
  held-out set held out as the corpus grows);
- no shuffle is needed to *assign* — the hash is a narrow map-side
  projection; only quota ranking shuffles, and then only ``(partition
  key, hash, id)`` tuples, never payloads.

The reference has no sampling surface (no sample/split code anywhere in
``/root/reference/moisturizer/``, verified by module read); these are part
of the mandated LLM-pipeline extension (SURVEY §2d).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# First 8 hex chars of md5 → uniform 32-bit integer. 32 bits of the 128
# are plenty for split thresholds (resolution 2^-32) while staying inside
# BIGINT range in both engines.
_HASH_BITS = 32
_HASH_SPAN = float(1 << _HASH_BITS)


def hash_fraction(key: Column, salt: str = "") -> Column:
    """Uniform [0, 1) fraction derived from md5(salt || key).

    The salt namespaces decisions: the same corpus can carry independent
    splits (e.g. a dedup-holdout and an eval-holdout) by salting each.
    Column-only expression — no UDF, stays inside whole-stage codegen.
    """
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") / F.lit(_HASH_SPAN)


def sql_hash_fraction(key_sql: str, salt: str = "") -> str:
    """DuckDB rendering of :func:`hash_fraction` (oracle parity)."""
    return (
        f"CAST(('0x' || substr(md5('{salt}' || CAST({key_sql} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) / {_HASH_SPAN!r}"
    )


DEFAULT_SPLITS = {"train": 0.90, "val": 0.05, "test": 0.05}


def split_thresholds(splits: dict[str, float] | None = None) -> list[tuple[str, float]]:
    """(name, cumulative upper bound) per split, last bound exclusive-open.

    Single source of truth for BOTH the Spark expression and the oracle
    SQL: cumulative float addition is not exact (0.90 + 0.05 →
    0.9500000000000001), so the two sides must compare against the *same*
    accumulated constants, not re-derive them.
    """
    splits = splits or DEFAULT_SPLITS
    total = sum(splits.values())
    out, cum = [], 0.0
    for name, w in splits.items():
        cum += w / total
        out.append((name, cum))
    return out


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float] | None = None,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by thresholding its hash fraction.

    ``splits`` maps name → weight (normalized internally); iteration order
    fixes the threshold layout, so pass an ordered dict. Default 90/5/5
    train/val/test. Assignment is a pure projection: at 100 TB this adds
    zero shuffles — the split column rides along with whatever the
    consumer does next, and parquet writers can partition by it.
    """
    frac = hash_fraction(F.col(key_col), salt)
    thresholds = split_thresholds(splits)
    expr: Column | None = None
    for name, cum in thresholds[:-1]:
        branch = F.when(frac < F.lit(cum), F.lit(name))
        expr = branch if expr is None else expr.when(frac < F.lit(cum), F.lit(name))
    last = F.lit(thresholds[-1][0])
    return df.withColumn(out_col, last if expr is None else expr.otherwise(last))


def sql_hash_split_case(
    key_sql: str, splits: dict[str, float] | None = None, salt: str = ""
) -> str:
    """DuckDB CASE expression mirroring :func:`hash_split` — same
    accumulated threshold constants (see :func:`split_thresholds`)."""
    frac = sql_hash_fraction(key_sql, salt)
    thresholds = split_thresholds(splits)
    arms = " ".join(
        f"WHEN {frac} < {cum!r} THEN '{name}'" for name, cum in thresholds[:-1]
    )
    return f"CASE {arms} ELSE '{thresholds[-1][0]}' END"


def quota_sample(
    df: DataFrame,
    partition_col: str,
    key_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Keep at most ``k`` rows per ``partition_col`` group, chosen by hash
    rank — deterministic per-domain downsampling (the "cap every source at
    N documents" rebalancing step of corpus curation).

    Hash-rank selection is an unbiased uniform sample per group AND stable:
    re-running over a grown corpus only ever *replaces* members when new
    rows hash lower, never reshuffles wholesale. Scale: one shuffle on the
    partition key carrying ``(partition, hash, key)`` plus surviving
    columns; skewed domains are exactly the ones the quota truncates, so
    the per-group sort is bounded by group size and AQE splits oversized
    partitions. For extreme single-domain skew, pre-filter with an
    approximate per-group count and a hash-threshold prepass so the sort
    only sees ~k candidates per group.
    """
    # Rank by the md5 hex string itself (ASCII order is engine-invariant;
    # no float conversion involved), tiebroken by the key for totality.
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(partition_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_qs_rank", F.row_number().over(w))
        .filter(F.col("_qs_rank") <= k)
        .drop("_qs_rank")
    )


def epoch_plan(
    sizes: DataFrame,
    size_col: str,
    budget: int | Column,
    alpha: float = 0.5,
    max_epochs: float = 4.0,
) -> DataFrame:
    """Mixture → epoch planner: given per-slice available token counts
    and a total training-token budget, compute each slice's temperature
    weight, target token draw, and implied epoch count (passes over the
    slice), capping repetition at ``max_epochs`` (the "don't repeat a
    small source 40×" rule from data-constrained scaling studies).

    Adds: ``mix_weight`` (∝ size^α, normalized, 6-dp), ``target_tokens``
    (weight × budget, rounded to a whole token), ``epochs``
    (target/available, 6-dp), ``over_cap`` (epochs exceeded the cap),
    ``effective_tokens`` (target clamped to cap × available). The
    uncovered remainder (Σ target − Σ effective) is the budget the
    caller re-allocates or shrinks to.

    Like :func:`temperature_weights`, this runs on an ALREADY-AGGREGATED
    frame (one row per source/language) — window normalization over a
    handful of rows, never the corpus. Every derived number is either an
    exact integer or one IEEE op on identical inputs, so the plan is
    reproducible across engines.
    """
    w = Window.partitionBy()
    pw = F.pow(F.col(size_col).cast("double"), F.lit(float(alpha)))
    weight = F.round(pw / F.sum(pw).over(w), 6)
    budget_expr = (
        budget if isinstance(budget, Column) else F.lit(float(budget))
    ).cast("double")
    out = sizes.withColumn("mix_weight", weight).withColumn(
        "target_tokens",
        F.round(F.col("mix_weight") * budget_expr, 0).cast("bigint"),
    )
    avail = F.col(size_col).cast("double")
    epochs = F.round(F.col("target_tokens") / avail, 6)
    cap_tokens = F.round(F.lit(float(max_epochs)) * avail, 0).cast("bigint")
    return (
        out.withColumn("epochs", epochs)
        .withColumn("over_cap", F.col("epochs") > F.lit(float(max_epochs)))
        .withColumn(
            "effective_tokens", F.least(F.col("target_tokens"), cap_tokens)
        )
    )


def expand_epochs(
    docs: DataFrame,
    plan: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    size_col: str = "n_tokens",
    out_col: str = "epoch_idx",
    salt: str = "epoch:",
) -> DataFrame:
    """EXECUTE an epoch plan (:func:`epoch_plan`): materialize the
    per-source repetition as (document, epoch_idx) rows — ``⌊e⌋`` full
    passes over every document plus a deterministic hash-selected
    fraction ``e − ⌊e⌋`` of documents in the final partial epoch, where
    ``e = effective_tokens / available``.

    Selection for the partial epoch is md5-keyed on (id, epoch) — the
    same document set is chosen on every run and engine (the property
    ``df.sample`` lacks), and distinct epochs draw independent samples.
    ``e`` is an IEEE division of two exact integers, so ``⌊e⌋`` and the
    fraction agree bit-for-bit across engines.

    Scale: ``plan`` is a ~|sources|-row frame — it broadcasts; the
    explode multiplies rows by ≤ cap (the plan's ``max_epochs``), which
    is the intended output size of the mixing step; nothing shuffles
    until the caller aggregates or writes.

    ``docs`` MAY carry a column named ``size_col`` (the natural case —
    a per-doc ``n_tokens``): the plan-side columns are aliased to
    reserved ``_avail``/``_eff`` names before the join, so no ambiguity
    arises (mirroring how ``_n_full``/``_frac`` are handled).
    """
    e = F.col("_eff").cast("double") / F.col("_avail").cast("double")
    joined = docs.join(
        F.broadcast(
            plan.select(
                source_col,
                F.col(size_col).alias("_avail"),
                F.col("effective_tokens").alias("_eff"),
            )
        ),
        source_col,
    )
    with_e = joined.withColumn("_n_full", F.floor(e).cast("int")).withColumn(
        "_frac", e - F.floor(e)
    )
    exploded = with_e.withColumn(
        out_col, F.explode(F.sequence(F.lit(0), F.col("_n_full")))
    )
    pick_key = F.concat(
        F.col(id_col).cast("string"), F.lit(":"), F.col(out_col).cast("string")
    )
    return exploded.filter(
        (F.col(out_col) < F.col("_n_full"))
        | (hash_fraction(pick_key, salt) < F.col("_frac"))
    ).drop("_n_full", "_frac", "_avail", "_eff")


def sql_epoch_pick(id_sql: str, epoch_sql: str, salt: str = "epoch:") -> str:
    """DuckDB rendering of :func:`expand_epochs`'s partial-epoch pick."""
    key = f"CAST({id_sql} AS VARCHAR) || ':' || CAST({epoch_sql} AS VARCHAR)"
    return sql_hash_fraction(key, salt)


def shard_assign(
    key: Column, n_shards: int, salt: str = ""
) -> Column:
    """Deterministic shard id in ``[0, n_shards)`` from md5(salt || key).

    The output-layout step of a training run: documents are hashed into a
    fixed number of shards so (a) every writer task owns disjoint files,
    (b) a document lands in the same shard on every re-run (resumable,
    diffable output), and (c) shard sizes concentrate tightly around
    corpus_size / n_shards (md5 is uniform). Uses the md5 *hex prefix*
    (not xxhash64) so the assignment is reproducible by any engine that
    can md5 — including the DuckDB oracle, bit-for-bit.

    Pure column expression: at 100 TB the assignment is a map-side
    projection fused into the scan; the subsequent
    ``repartition(n_shards, shard)`` is the single intentional shuffle
    that physically groups each shard's rows for its writer.
    """
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % n_shards
    ).cast("int")


def sql_shard_assign(key_sql: str, n_shards: int, salt: str = "") -> str:
    """DuckDB rendering of :func:`shard_assign` (oracle parity)."""
    return (
        f"CAST(CAST(('0x' || substr(md5('{salt}' || CAST({key_sql} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % {n_shards} AS INT)"
    )


def shard_manifest(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "",
    size_col: str | None = None,
) -> DataFrame:
    """Shard-level manifest for a deterministic hash-sharded write: one
    row per shard with row count, byte/char volume, and a key checksum —
    the sidecar a downstream loader reads to plan balanced data-parallel
    input without listing files.

    The checksum (sum of key hash prefixes mod 2^31) lets an auditor
    verify a shard's membership without re-reading content. Scale: one
    partial-aggregated shuffle of ``n_shards`` groups.
    """
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    hash32 = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
    agg = [
        F.count(F.lit(1)).alias("n_rows"),
        F.min(key_col).alias("min_key"),
        F.max(key_col).alias("max_key"),
        (F.sum(hash32) % F.lit(2**31)).cast("bigint").alias("key_checksum"),
    ]
    if size_col is not None:
        agg.append(F.sum(size_col).cast("bigint").alias("sum_size"))
    return (
        df.withColumn("shard", shard_assign(F.col(key_col), n_shards, salt))
        .groupBy("shard")
        .agg(*agg)
    )


def temperature_weights(
    sizes: DataFrame, size_col: str, alpha: float = 0.5, out_col: str = "mix_weight"
) -> DataFrame:
    """Temperature-based mixture weights over corpus slices (the
    multilingual/multi-source rebalancing rule: sampling probability
    ∝ size^α, α<1 up-weights small slices, α=1 is proportional, α=0 is
    uniform — the mixing scheme of multilingual pretraining recipes).

    ``sizes`` is an already-aggregated frame (one row per slice, e.g.
    the output of ``groupBy(source).agg(sum(n_tokens))``); the window
    normalization runs over those few rows, never the corpus. Weights
    are rounded to 6 digits so both engines agree after the
    order-dependent float sum (error ~1e-15, far below the rounding
    grain).
    """
    w = Window.partitionBy()
    pw = F.pow(F.col(size_col).cast("double"), F.lit(float(alpha)))
    return sizes.withColumn(
        out_col, F.round(pw / F.sum(pw).over(w), 6)
    )


_ES_SPAN = 4294967297.0  # 2^32 + 1: maps the 32-bit hash into (0, 1]


def weighted_score(key: Column, weight: Column, salt: str = "wsample:") -> Column:
    """Efraimidis–Spirakis exponential-sort key for weighted sampling
    WITHOUT replacement ("Weighted random sampling with a reservoir",
    IPL 2006): rank items by ``u^(1/w)`` — equivalently ``ln(u)/w`` —
    and the top-n are an exact weighted sample. The uniform draw is the
    suite's deterministic md5 recipe (:func:`hash_fraction`'s first-8-
    hex-chars hash), shifted into (0, 1] — ``(h+1)/(2^32+1)`` — so
    ``ln`` never sees 0; u = 1 maps to score 0, the maximum, which is
    fine (it is a measure-2^-32 best draw, not an error).

    Rounded to 6 digits before any ranking (the suite's ln-ulp
    convention — Spark's and DuckDB's ``ln`` differ in the final ulp
    for ~1% of inputs, below the rounding grain); callers must break
    ties on a unique key. Non-positive weights are the caller's job to
    exclude (``w <= 0`` would divide by zero or flip the sign).
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    u = (h + F.lit(1)) / F.lit(_ES_SPAN)
    return F.round(F.log(u) / weight.cast("double"), 6)


def sql_weighted_score(
    key_sql: str, weight_sql: str, salt: str = "wsample:"
) -> str:
    """DuckDB rendering of :func:`weighted_score` (oracle parity):
    identical integer hash, identical (0,1] shift — exact IEEE division
    of exact integers — and ln differences land below the 6-digit
    rounding grain."""
    return (
        f"ROUND(ln((CAST(('0x' || substr(md5('{salt}' || "
        f"CAST({key_sql} AS VARCHAR)), 1, 8)) AS BIGINT) + 1) "
        f"/ {_ES_SPAN!r}) / CAST({weight_sql} AS DOUBLE), 6)"
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    key_col: str,
    by: tuple[str, ...] = (),
    salt: str = "wsample:",
    score_col: str = "score",
    rank_col: str = "rank",
) -> DataFrame:
    """Deterministic weighted sampling without replacement: the ``n``
    highest :func:`weighted_score` rows (per ``by`` group if given) —
    inclusion probability ∝ weight, exactly the A-ES guarantee, yet
    fully replayable from (key, salt) alone. The corpus-curation use:
    "sample 100k docs per source, ∝ quality score" without an RNG whose
    partitioning changes the answer.

    Rows with non-positive weight are excluded (never sampled — the
    limit of w→0⁺, and the only sound reading of w=0). Scale: one
    window over (by) ordered by (score, key); per-group top-n is a
    WindowGroupLimit — each task keeps n rows before the final
    per-group merge, so the sort never materializes a full partition.
    Grouped calls (``by`` non-empty) shard the window; a global sample
    funnels the n survivors of each task through one final merge —
    bounded by n×tasks, fine for n ≪ corpus, the operator's use case.
    """
    w = (
        Window.partitionBy(*by).orderBy(
            F.col(score_col).desc(), F.col(key_col).asc()
        )
    )
    scored = df.filter(F.col(weight_col) > 0).withColumn(
        score_col, weighted_score(F.col(key_col), F.col(weight_col), salt)
    )
    return (
        scored.withColumn(rank_col, F.row_number().over(w).cast("bigint"))
        .filter(F.col(rank_col) <= n)
    )


def cv_folds(
    df: DataFrame,
    key_col: str,
    k: int = 5,
    salt: str = "cv:",
    out_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: fold =
    ``md5(salt || key) mod k`` — the CV companion of :func:`hash_split`
    with the same contracts: reproducible cross-engine (pure integer
    arithmetic on the md5 prefix, no RNG), stable under corpus growth
    (a row keeps its fold forever, so fold-held-out stays held out
    across incremental ingestion), and a pure map-side projection
    (zero shuffles at any scale — the fold column rides along).

    The salt namespaces independent fold structures over one corpus
    (an eval CV and a hyperparameter CV don't correlate)."""
    if k < 2:
        raise ValueError(f"k must be >= 2 (got {k})")
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    return df.withColumn(
        out_col,
        F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"), F.lit(k)),
    )


def sql_cv_fold(key_sql: str, k: int = 5, salt: str = "cv:") -> str:
    """DuckDB rendering of :func:`cv_folds`' fold expression."""
    return (
        f"CAST(('0x' || substr(md5('{salt}' || CAST({key_sql} AS VARCHAR)),"
        f" 1, 8)) AS BIGINT) % {k}"
    )
