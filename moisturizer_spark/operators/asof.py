"""As-of join: for each left row, the latest right row at-or-before it.

Spark has no built-in ASOF JOIN (DuckDB/Pandas do), so this composes one
from existing operators — the union-and-window formulation:

1. tag both sides, union on (partition keys, event time),
2. one window pass per partition key ordered by time carries the most
   recent right-row payload forward (``last(..., ignorenulls=True)``),
3. keep left rows, unpack the carried payload.

Cost: ONE shuffle on the partition keys (same as the sort-merge join the
equivalent range-join would need, but with no range-explosion), then a
linear windowed scan — the right strategy at 100 TB, where a naive
``a.ts >= b.ts`` range join degenerates to a near-cross-product.
Skewed partition keys are handled by AQE skew splitting on the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_payload: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: latest right row with time <= left time per key.

    Left rows with no prior right row keep nulls (left-outer semantics,
    matching DuckDB ``ASOF LEFT JOIN``). Ties on time resolve to the right
    row (right side sorts before left at equal times), i.e. ``<=``.
    """
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in on and c != right_time]

    lhs = left.withColumn("_side", F.lit(1)).withColumn("_t", F.col(left_time)).withColumn(
        "_payload",
        F.lit(None).cast(
            "struct<" + ", ".join(
                f"`{c}`: {right.schema[c].dataType.simpleString()}" for c in right_payload + [right_time]
            ) + ">"
        ),
    )
    rhs = right.select(
        *on,
        F.lit(0).alias("_side"),
        F.col(right_time).alias("_t"),
        F.struct(*right_payload, F.col(right_time)).alias("_payload"),
    )
    lhs = lhs.select(*left.columns, "_side", "_t", "_payload")
    rhs_aligned = rhs.select(
        *[
            F.col(c) if c in on else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        "_side",
        "_t",
        "_payload",
    )
    unioned = lhs.unionByName(rhs_aligned)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_match", F.last(F.col("_payload"), ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1).select(
        *left.columns,
        *[F.col("_match")[c].alias(f"{c}{suffix}") for c in right_payload],
        F.col("_match")[right_time].alias(f"{right_time}{suffix}"),
    )
    return out
