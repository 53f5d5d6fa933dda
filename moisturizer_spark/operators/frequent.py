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
