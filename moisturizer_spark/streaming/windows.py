"""Event-time windowed aggregations with watermarks.

Not present in the reference (its consumer has no event-time reasoning —
SURVEY §2c "streaming: none"), but part of this engine's extended surface.
Each function works on BOTH a streaming and a batch DataFrame (Spark's
``window``/``session_window`` are plan-level), so the same definitions
serve `readStream` pipelines and backfills — the classic kappa shape.

Late data: rows older than the watermark are dropped from streaming state;
in batch mode the watermark is a no-op and all data participates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _with_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-type counts + value sums in non-overlapping event-time windows."""
    return (
        _with_watermark(events, ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(15,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Overlapping sliding-window counts per type."""
    return (
        _with_watermark(events, ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window, slide).alias("win"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user session windows with a dynamic inactivity gap — the
    streaming-native dual of the batch sessionize query
    (:func:`moisturizer_spark.workload.events_sessionize`)."""
    return (
        _with_watermark(events, ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("win"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(15,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )
