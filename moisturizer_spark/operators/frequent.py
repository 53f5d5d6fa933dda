"""Exact distributed frequent-items (heavy hitters).

The two-phase candidate/verify algorithm: a per-partition Misra-Gries
style pass proposes candidates, then one exact aggregation over the
candidate set verifies counts. The result is EXACT (same rows a full
GROUP BY + HAVING would return) while shuffling only candidates:

* Completeness: if a value has global count ≥ n/k, then by averaging it
  has local count ≥ local_n/k in at least one partition, so the local
  pass emits it. No global heavy hitter can be missed.
* Cost: the candidate pass is ONE linear scan emitting ≤ k values per
  partition (k = ⌈1/support⌉) PLUS a per-partition row-count sentinel,
  so the global n needed for the threshold rides the same job — no
  separate ``df.count()`` scan. The verify is a broadcast null-safe
  semi-join + one combinable aggregation over candidate rows only. A
  plain GROUP BY over 100 TB of keys shuffles every distinct key; this
  shuffles ≤ k·partitions candidates and the matching rows' counts.

Thresholds use integer arithmetic (support = num/den) so the cutoff is
bit-identical to an oracle's — no float-ceil hazards.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType


def frequent_items(
    df: DataFrame,
    col: str,
    support: tuple[int, int] = (1, 100),
    out_count: str = "n",
) -> DataFrame:
    """All values of ``col`` occurring in at least ``support[0]/support[1]``
    of rows, with their exact counts: the distributed HAVING-count
    query, computed without shuffling every key.

    Returns (col, out_count) — exactly the rows of
    ``GROUP BY col HAVING count >= ceil(n * num / den)``, INCLUDING a
    null group when null is a heavy hitter (the verify join is
    null-safe, matching the candidate pass's ``dropna=False`` counting).

    The candidate set (≤ k per partition) is collected to the driver —
    a bounded, documented collect: it sizes as ⌈1/support⌉ × partitions
    values, independent of data volume.
    """
    num, den = support
    if not 0 < num <= den:
        raise ValueError(f"support must be a fraction in (0, 1]: {support}")
    k = (den + num - 1) // num  # ceil(den/num) = ceil(1/support)
    field = df.schema[col]
    out_schema = StructType([field, StructField("_n_local", LongType(), True)])

    def candidates(batches):
        counts: Counter = Counter()
        n_local = 0
        for pdf in batches:  # the generator spans ONE partition
            vc = pdf[col].value_counts(dropna=False)
            counts.update(vc.to_dict())
            n_local += len(pdf)
        if n_local:
            cut = n_local / k
            keep = [v for v, c in counts.items() if c >= cut]
            # candidate rows carry a null sentinel count; ONE extra row
            # per partition carries the partition's row count so the
            # global n folds into this same job
            yield pd.DataFrame(
                {
                    col: pd.Series(keep + [None], dtype=object),
                    "_n_local": pd.Series([None] * len(keep) + [n_local], dtype=object),
                }
            )

    rows = df.select(col).mapInPandas(candidates, schema=out_schema).collect()
    n = sum(r["_n_local"] for r in rows if r["_n_local"] is not None)
    threshold = (n * num + den - 1) // den  # ceil(n * num/den), exact
    cand_vals = {r[col] for r in rows if r["_n_local"] is None}
    if not cand_vals or n == 0:
        return (
            df.select(col)
            .limit(0)
            .withColumn(out_count, F.lit(0).cast("bigint"))
        )
    cand = df.sparkSession.createDataFrame(
        [(v,) for v in cand_vals], schema=StructType([StructField("_cand", field.dataType, True)])
    )
    return (
        # null-safe semi join: a null heavy hitter must survive the
        # verify step, not silently vanish in an equi-join
        df.join(F.broadcast(cand), on=F.col(col).eqNullSafe(F.col("_cand")), how="left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias(out_count))
        .filter(F.col(out_count) >= threshold)
    )


def basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    item_cap: int = 32,
    freq: DataFrame | None = None,
    assume_distinct: bool = False,
) -> DataFrame:
    """Per-basket co-occurrence pairs — the market-basket primitive —
    with a HOT-BASKET guard: the self-join on the basket key costs
    Σ_baskets k², which is linear in baskets only while baskets stay
    small; one pathological 10^5-item basket alone would emit 10^10
    pairs and wedge its task. Each basket is therefore capped at
    ``item_cap`` items BEFORE the join, keeping the most-frequent
    items (rank by global item frequency DESC, then item id — a
    deterministic total order, so an oracle replays the cut exactly).
    Most-frequent wins because lift/affinity reports rank SUPPORT-heavy
    pairs; the dropped tail of a pathological basket contributes pairs
    of near-zero support. With sane baskets (k <= item_cap) the cap is
    provably a no-op.

    Returns (item_a, item_b, n_both) with item_a < item_b, n_both =
    number of capped baskets containing both.

    Scale: frequency is one combinable aggregation; the cap window and
    the pair join both shuffle on ``basket_col`` (same key — AQE reuses
    the partitioning); per-basket work is bounded at item_cap² by
    construction. The distinct item set and the capped baskets are
    persisted — each feeds two plan branches (freq + cap; both self-
    join sides), and without the boundaries the source scan re-executes
    per branch."""
    from pyspark.sql import Window

    from moisturizer_spark.operators.common import materialize

    # assume_distinct: the caller already holds a distinct (and usually
    # persisted) (basket, item) frame — re-distincting the same plan
    # here would double-cache the identical subtree (CacheManager
    # "already cached" warnings) and add a redundant Exchange
    items = (
        df.select(basket_col, item_col)
        if assume_distinct
        else materialize(df.select(basket_col, item_col).distinct())
    )
    if freq is None:
        freq = items.groupBy(item_col).agg(
            F.count(F.lit(1)).cast("bigint").alias("_n_item")
        )
    else:
        freq = freq.select(item_col, F.col(freq.columns[-1]).alias("_n_item"))
    w = Window.partitionBy(basket_col).orderBy(
        F.col("_n_item").desc(), F.col(item_col)
    )
    capped = materialize(
        items.join(F.broadcast(freq), item_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= item_cap)
        .select(basket_col, item_col)
    )
    a = capped.select(basket_col, F.col(item_col).alias("item_a"))
    b = capped.select(basket_col, F.col(item_col).alias("item_b"))
    return (
        a.join(b, basket_col)
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
