"""Exact distributed frequent-items (heavy hitters).

The two-phase candidate/verify algorithm: a per-partition Misra-Gries
style pass proposes candidates, then one exact aggregation over the
candidate set verifies counts. The result is EXACT (same rows a full
GROUP BY + HAVING would return) while shuffling only candidates:

* Completeness: if a value has global count ≥ n/k, then by averaging it
  has local count ≥ local_n/k in at least one partition, so the local
  pass emits it. No global heavy hitter can be missed.
* Cost: the candidate pass is a linear scan emitting ≤ k values per
  partition (k = ⌈1/support⌉); the verify is a broadcast semi-join +
  one combinable aggregation over candidate rows only. A plain
  GROUP BY over 100 TB of keys shuffles every distinct key; this
  shuffles ≤ k·partitions candidates and the matching rows' counts.

Thresholds use integer arithmetic (support = num/den) so the cutoff is
bit-identical to an oracle's — no float-ceil hazards.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from pyspark.sql import DataFrame, functions as F


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
    ``GROUP BY col HAVING count >= ceil(n * num / den)``.
    """
    num, den = support
    if not 0 < num <= den:
        raise ValueError(f"support must be a fraction in (0, 1]: {support}")
    n = df.count()
    threshold = (n * num + den - 1) // den  # ceil(n * num/den), exact
    k = (den + num - 1) // num  # ceil(den/num) = ceil(1/support)
    col_type = df.schema[col].dataType.simpleString()

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
            yield pd.DataFrame({col: keep})

    cand = df.select(col).mapInPandas(candidates, schema=f"{col} {col_type}")
    cand = cand.distinct()
    return (
        df.join(F.broadcast(cand), on=col, how="left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias(out_count))
        .filter(F.col(out_count) >= threshold)
    )
