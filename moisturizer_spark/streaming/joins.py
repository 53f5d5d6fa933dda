"""Stream-stream joins with bounded state.

Structured Streaming can join two live streams only when the engine can
prove it may discard buffered rows: both sides carry watermarks and the
join condition bounds event time (Spark's stream-stream join contract).
This module packages the engine's canonical shape — "match each left
event to right events of the same key within a lookback window" — the
streaming analog of :func:`moisturizer_spark.operators.asof_join`'s
batch interval join.

State size is O(keys × lookback window of rows), NOT O(stream): rows
older than (watermark + lookback) are evicted by the engine. At 100 TB/day
stream rates the knobs are the watermark (late-data tolerance vs state
size) and the lookback (business window); both sides shuffle once on the
join key — same partitioning the stateful operators use, so a
key-partitioned topology reuses it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "1 hour",
    watermark: str = "2 hours",
    right_payload: tuple[str, ...] = ("event_id",),
    how: str = "inner",
) -> DataFrame:
    """Join each left event to the right-side events of the same key whose
    timestamp falls in ``[left.ts - lookback, left.ts]``.

    Works identically on batch DataFrames (watermarks are no-ops there),
    which is how the equivalence tests pin the semantics: one code path,
    two execution modes. Right-side columns come back suffixed
    ``_right``; ``how`` may be ``inner`` or ``leftOuter`` (outer emits
    the unmatched left row once the watermark passes).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    renamed = rw.select(
        F.col(on).alias(f"{on}_right"),
        F.col(right_ts).alias(f"{right_ts}_right"),
        *[F.col(c).alias(f"{c}_right") for c in right_payload],
    )
    lt, rt = F.col(left_ts), F.col(f"{right_ts}_right")
    cond = (
        (F.col(on) == F.col(f"{on}_right"))
        & (rt >= lt - F.expr(f"INTERVAL {lookback}"))
        & (rt <= lt)
    )
    return lw.join(renamed, cond, how).drop(f"{on}_right")
