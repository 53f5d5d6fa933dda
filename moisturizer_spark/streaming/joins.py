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


def stream_banded_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lo_seconds: int = -120,
    hi_seconds: int = 120,
    watermark: str = "2 hours",
    right_payload: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """KEYLESS stream-stream interval join: every left event paired with
    every right event whose time falls in ``[left.ts + lo, left.ts + hi]``
    (inclusive seconds), with no shared key column at all — the streaming
    sibling of :func:`moisturizer_spark.operators.asof.
    banded_interval_join`.

    Why it exists: Structured Streaming REJECTS a stream-stream join
    without an equality predicate ("stream-stream join without equality
    predicate is not supported" — the symmetric hash join needs keys to
    shard its state store). Time banding manufactures the key from event
    time itself: right rows band once on ``floor(epoch_us / W)``
    (W = the ``hi − lo + 1``-second window span), left rows explode to
    their ≤2 overlapping bands (a stateless ≤2× fan-out), and the join
    becomes a legal keyed stream-stream join — band equality plus the
    exact event-time range condition, which also gives the engine the
    time bound it needs to EVICT state: rows older than
    (watermark + span) drop from the store, so state is
    O(in-flight window), not O(stream).

    A (left,right) pair can meet in at most one band (the right row has
    exactly one band id) — no post-join dedup. Right columns come back
    suffixed ``_right``. Works identically on batch frames (watermarks
    are no-ops there), which is how the equivalence test pins semantics:
    one code path, two execution modes.

    Scale: state shards on the band id; a traffic spike concentrates one
    band's store, the same skew note as the batch operator — widen W or
    pre-filter the hot slice. Band arithmetic is the batch operator's
    pure-integer pmod+DIV floor division; the range condition compares
    raw timestamps (exact integer microseconds under the hood), so
    banding can never disagree with the filter.
    """
    if lo_seconds > hi_seconds:
        raise ValueError(
            f"empty interval: lo={lo_seconds} > hi={hi_seconds}"
        )
    width_us = (hi_seconds - lo_seconds + 1) * 1_000_000

    def _band_sql(us_expr: str) -> str:
        return f"(({us_expr}) - pmod({us_expr}, {width_us})) DIV {width_us}"

    lhs = (
        left.withWatermark(left_ts, watermark)
        .withColumn(
            "_sbj_us", F.unix_micros(F.col(left_ts).cast("timestamp"))
        )
        .withColumn(
            "_sbj_band",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.expr(_band_sql(f"_sbj_us + {lo_seconds * 1_000_000}")),
                        F.expr(_band_sql(f"_sbj_us + {hi_seconds * 1_000_000}")),
                    )
                )
            ),
        )
        .drop("_sbj_us")
    )
    rhs = (
        right.withWatermark(right_ts, watermark)
        .select(
            F.col(right_ts).alias(f"{right_ts}_right"),
            *[F.col(c).alias(f"{c}_right") for c in right_payload],
        )
        .withColumn(
            "_sbj_band",
            F.expr(
                _band_sql(
                    f"unix_micros(cast({right_ts}_right as timestamp))"
                )
            ),
        )
    )
    lt, rt = F.col(left_ts), F.col(f"{right_ts}_right")
    cond = (
        (F.col("_sbj_band") == F.col("_sbj_band_r"))
        & (rt >= lt + F.expr(f"make_interval(0, 0, 0, 0, 0, 0, {lo_seconds})"))
        & (rt <= lt + F.expr(f"make_interval(0, 0, 0, 0, 0, 0, {hi_seconds})"))
    )
    return (
        lhs.join(
            rhs.withColumnRenamed("_sbj_band", "_sbj_band_r"), cond, "inner"
        )
        .drop("_sbj_band", "_sbj_band_r")
    )
