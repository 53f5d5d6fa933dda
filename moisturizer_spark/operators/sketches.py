"""Mergeable distinct-count sketches (Apache DataSketches HLL via Spark
built-ins).

The 100 TB pre-aggregation pattern: store a fixed-size HLL sketch per
fine-grained cell (e.g. day × event_type) ONCE, then answer any coarser
distinct-count rollup by merging sketches — no rescan of the fact table,
and union is lossless for HLL (the merged sketch equals the sketch of
the merged data, so estimates never degrade with regrouping). All three
stages are JVM built-ins (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``); the shuffle carries O(cells × sketch_bytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hll_rollup(
    df: DataFrame,
    keys: list[str],
    col: str,
    lg_k: int = 14,
    out_col: str = "hll",
) -> DataFrame:
    """Per-cell HLL sketches of ``col``: the stored, mergeable rollup.
    ``lg_k=14`` ⇒ ~0.8% relative standard error at 16 KB per cell."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias(out_col)
    )


def hll_merge_estimate(
    rollup: DataFrame,
    keys: list[str],
    sketch_col: str = "hll",
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Merge sketch cells up to ``keys`` granularity and estimate the
    distinct count — the any-range query over the stored rollup."""
    grouped = rollup.groupBy(*keys) if keys else rollup.groupBy()
    return grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias(out_col)
    )
