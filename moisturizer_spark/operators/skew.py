"""Skew handling: hot-key detection and salted joins.

AQE's skew-join splitting (enabled in `session.get_spark`) handles most
runtime skew for sort-merge joins. Salting is the explicit fallback for
the cases AQE can't fix: a shuffle where one reducer key holds a double-
digit percent of all rows (the classic null/default-value key, or a
viral document id in an inverted index). Reference has no joins at all
(SURVEY.md §2c) — this is part of the 100 TB extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hot_keys(df: DataFrame, key_cols: list[str], min_rows: int = 1_000_000) -> DataFrame:
    """Keys whose row count exceeds ``min_rows`` — the shuffle-killers.

    One partial-aggregated count shuffle; run it on a sample first if
    even counting is expensive at full scale. Output (key…, n_rows)
    sorted descending is the input to choosing a salt factor.
    """
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") >= min_rows)
        .orderBy(F.desc("n_rows"))
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join that splits each hot key across ``salt`` reducers.

    The (large, skewed) ``left`` side gets a per-row salt in
    ``[0, salt)``; the (smaller) ``right`` side is replicated ``salt``
    times via a broadcast range join, so every (key, salt) bucket can
    meet its match. Shuffle cost: left unchanged, right × salt — pick
    the orientation so the replicated side is the small one.

    Result set is identical to ``left.join(right, on, how)`` for inner
    and left joins (each left row meets each matching right row exactly
    once, in exactly one salt bucket). Right/full-outer joins would
    duplicate unmatched right rows across buckets — rejected.

    The salt is ``monotonically_increasing_id() % salt`` — deterministic
    within a run, round-robin within each partition, and independent of
    the key (which is what spreads a single hot key).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salted_left = left.withColumn(
        "_salt", (F.monotonically_increasing_id() % salt).cast("int")
    )
    salts = left.sparkSession.range(salt).select(F.col("id").cast("int").alias("_salt"))
    replicated_right = right.crossJoin(F.broadcast(salts))
    return salted_left.join(replicated_right, [*on, "_salt"], how).drop("_salt")


def key_skew_report(
    df: DataFrame,
    key_cols: list[str],
    percentiles: tuple[float, float] = (0.5, 0.99),
) -> DataFrame:
    """ONE-ROW distribution report over a shuffle key — the diagnosis
    that decides between a plain join, a broadcast, AQE skew-split, or
    :func:`salted_join` BEFORE the job runs at 100 TB: key cardinality,
    row count, the max key's absolute count and share, interpolated
    percentiles of the per-key count distribution, and the Gini
    coefficient of key mass (0 = perfectly uniform keys, →1 = one key
    owns the table).

    Gini uses the sorted-rank identity ``G = (2·Σ rank·x − (n+1)·Σx) /
    (n·Σx)`` over per-key counts ranked ascending — all terms exact
    BIGINTs (tie order cannot change the sum: equal x at swapped ranks
    contribute identically), one final IEEE division. Scale: the heavy
    step is the per-key count (map-side combinable); everything after
    runs at KEY grain, with one global window over the key-count frame
    — bounded by key cardinality, stated (a 10^9-key report should
    sample keys first; the count frame, not this operator, is then the
    thing to shard)."""
    from pyspark.sql import Window

    counts = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    ranked = counts.select(
        "_c",
        F.row_number()
        .over(Window.orderBy(F.col("_c").asc(), *key_cols))
        .cast("bigint")
        .alias("_rk"),
    )
    p_lo, p_hi = percentiles
    return ranked.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("_c").cast("bigint").alias("n_rows"),
        F.max("_c").cast("bigint").alias("max_key_rows"),
        F.round(
            F.max("_c").cast("double") / F.sum("_c").cast("double"), 6
        ).alias("max_key_share"),
        F.percentile("_c", F.lit(p_lo)).alias("p_lo"),
        F.percentile("_c", F.lit(p_hi)).alias("p_hi"),
        F.round(
            (
                F.lit(2) * F.sum(F.col("_rk") * F.col("_c"))
                - (F.count(F.lit(1)) + F.lit(1)) * F.sum("_c")
            ).cast("double")
            / (F.count(F.lit(1)) * F.sum("_c")).cast("double"),
            6,
        ).alias("gini"),
    )
