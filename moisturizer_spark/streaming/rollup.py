"""Continuous rollup: an incrementally-maintained aggregate table.

The Timescale-style "hypertable rollup" as a Spark-first construct: a
streaming query folds each micro-batch's *partial* aggregates into a
keyed rollup table, so dashboard queries read a table whose size is
O(groups), never O(events). Only algebraic aggregates participate
(count, sum, min, max — anything with a merge function); averages are
finalized at read time from (sum, count) so merging stays exact.

Scale shape per micro-batch: the batch partial-aggregates map-side down
to O(groups-in-batch) rows, then MERGEs into the rollup keyed by the
group columns — the table itself never re-aggregates history. Late data
needs no special casing: whatever bucket a late event lands in simply
gets merged again (the rollup is eventually exact without watermark
loss, because the store is keyed state, not emitted-and-forgotten
windows — the trade-off vs `streaming/windows.py` is unbounded key
state, bounded by bucket granularity × retention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from moisturizer_spark.storage import ParquetTable

_MERGEABLE = {"n_events": "sum", "sum_value": "sum", "min_value": "min", "max_value": "max"}

# txn app id under which the rollup records its applied-batch watermark
TXN_APP = "continuous_rollup"


def _bucketize(events: DataFrame, ts_col: str, bucket: str, keys: list[str]) -> DataFrame:
    return events.select(
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
        *keys,
        F.col("value"),
    )


def _partial(events: DataFrame, keys: list[str]) -> DataFrame:
    """Per-batch partial aggregate — the mergeable state vector."""
    return events.groupBy("bucket", *keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,6)")).alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def _merge_into(table: ParquetTable, partial: DataFrame, keys: list[str],
                txn: tuple[str, int] | None = None) -> None:
    """Fold a batch's partials into the rollup: union + re-merge per key.

    Copy-on-write analog of `MERGE ... WHEN MATCHED UPDATE SET n = t.n +
    s.n`; on Delta this is that statement verbatim. Each batch touches
    O(groups) rows — history is never rescanned.
    """
    group_cols = ["bucket", *keys]
    if table.exists():
        combined = table.read().unionByName(partial)
    else:
        combined = partial
    merged = combined.groupBy(*group_cols).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )
    table.overwrite(merged, txn=txn)


def apply_batch(
    table: ParquetTable,
    batch_df: DataFrame,
    batch_id: int,
    ts_col: str = "ts",
    bucket: str = "day",
    keys: list[str] | None = None,
) -> bool:
    """Idempotently fold one micro-batch into the rollup; returns whether
    the batch was applied.

    The additive merge is NOT naturally idempotent (replaying a batch
    would double-count n_events/sum_value), so the applied batch_id is
    committed in the same atomic manifest swap as the merged data
    (:meth:`ParquetTable.txn_version`). A batch replayed after a
    crash-before-checkpoint is detected and skipped — this is what makes
    the foreachBatch sink exactly-once rather than at-least-once.
    """
    keys = keys if keys is not None else ["event_type"]
    last = table.txn_version(TXN_APP)
    if last is not None and batch_id <= last:
        return False
    if batch_df.isEmpty():
        return False
    partial = _partial(_bucketize(batch_df, ts_col, bucket, keys), keys)
    _merge_into(table, partial, keys, txn=(TXN_APP, batch_id))
    return True


def continuous_rollup(
    events: DataFrame,
    table: ParquetTable,
    ts_col: str = "ts",
    bucket: str = "day",
    keys: list[str] | None = None,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain ``table`` as the continuously-updated ``bucket``-grained
    rollup of a streaming events DataFrame. Returns the streaming query.

    Exactly-once per bucket-cell: ParquetTable's manifest swap makes each
    merge all-or-nothing, and :func:`apply_batch` commits the applied
    batch_id inside that same swap, so a batch replayed after a
    crash-before-checkpoint is recognized and skipped instead of being
    double-counted into the additive aggregates.
    """

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        apply_batch(table, batch_df, batch_id, ts_col, bucket, keys)

    writer = events.writeStream.foreachBatch(fold)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_rollup(table: ParquetTable) -> DataFrame:
    """Read-time finalization: derive the non-algebraic aggregates."""
    df = table.read()
    return df.select(
        *df.columns,
        (F.col("sum_value").cast("double") / F.col("n_events")).alias("avg_value"),
    )
