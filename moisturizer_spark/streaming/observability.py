"""Streaming observability: per-micro-batch metrics as a queryable table.

Every long-running Structured Streaming deployment eventually asks the
same four questions — is the stream keeping up (input vs processed
rate), how big is the state store, where is the watermark relative to
event time, and which batch regressed. The engine exposes the answers
through ``StreamingQueryListener`` progress events; this module folds
them into a plain DataFrame/parquet table so the monitoring queries are
ordinary SQL over ordinary columns (the ``ivf_drift_report`` pattern:
an ops affordance shipped next to the operator it watches).

Driver-cost note: listener callbacks run on the driver's listener bus
thread and do O(1) work per micro-batch (append one small dict) — no
executor work, no per-row cost; at any stream rate the table grows one
row per batch per query. ``snapshot``/``flush`` are explicit calls, so
nothing writes unless asked.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

_SCHEMA = (
    "query_name string, query_id string, run_id string, batch_id long, "
    "ts string, num_input_rows long, input_rows_per_sec double, "
    "processed_rows_per_sec double, batch_duration_ms long, "
    "watermark string, state_rows long, state_rows_updated long, "
    "state_memory_bytes long, n_state_operators long"
)


class StreamMetricsRecorder(StreamingQueryListener):
    """Accumulates one row per (query, micro-batch) from progress
    events; ``snapshot(spark)`` returns them as a DataFrame,
    ``flush(spark, path)`` appends them to a parquet table and clears
    the buffer (so a scheduled flush gives an append-only metrics
    table with no duplicate batches).

    Register/unregister with ``spark.streams.addListener(rec)`` /
    ``removeListener(rec)`` — or use ``attach``/``detach``.
    """

    def __init__(self) -> None:
        self._rows: list[tuple] = []
        self._lock = threading.Lock()

    # -- listener contract --------------------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (engine API)
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        state_ops = p.get("stateOperators") or []
        row = (
            p.get("name"),
            p.get("id"),
            p.get("runId"),
            int(p.get("batchId", -1)),
            p.get("timestamp"),
            int(p.get("numInputRows", 0)),
            float(p.get("inputRowsPerSecond", 0.0) or 0.0),
            float(p.get("processedRowsPerSecond", 0.0) or 0.0),
            int((p.get("durationMs") or {}).get("triggerExecution", 0)),
            (p.get("eventTime") or {}).get("watermark"),
            sum(int(s.get("numRowsTotal", 0)) for s in state_ops),
            sum(int(s.get("numRowsUpdated", 0)) for s in state_ops),
            sum(int(s.get("memoryUsedBytes", 0)) for s in state_ops),
            len(state_ops),
        )
        with self._lock:
            self._rows.append(row)

    # -- consumption ---------------------------------------------------------
    def attach(self, spark: SparkSession) -> "StreamMetricsRecorder":
        spark.streams.addListener(self)
        return self

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self)

    def snapshot(self, spark: SparkSession) -> DataFrame:
        """The buffered batch rows as a DataFrame (buffer unchanged)."""
        with self._lock:
            rows = list(self._rows)
        return spark.createDataFrame(rows, _SCHEMA)

    def flush(self, spark: SparkSession, path: str) -> int:
        """Append buffered rows to a parquet table and clear the
        buffer; returns the number of rows written. Batch rows are
        buffered exactly once, so repeated flushes never duplicate."""
        with self._lock:
            rows, self._rows = self._rows, []
        if rows:
            spark.createDataFrame(rows, _SCHEMA).write.mode("append").parquet(
                path
            )
        return len(rows)


def lag_report(metrics: DataFrame) -> DataFrame:
    """Keep-up diagnosis per query over a metrics table: batches where
    processing ran slower than arrival (``falling_behind``), plus state
    growth between consecutive batches — the first thing an on-call
    looks at. Pure DataFrame ops over the small metrics table.

    Input contract: run this over the ACCUMULATED parquet metrics
    table (``spark.read.parquet(path)`` after :meth:`MetricsBuffer.
    flush`), not over a post-flush in-memory snapshot —
    ``state_rows_delta`` is a lag() over only the rows present in
    ``metrics``, so a frame holding just the latest flush gets a NULL
    delta on its first batch and deltas never span flush boundaries.
    Reading the full table restores the cross-flush chain; the one
    irreducibly-NULL delta is each query's genuinely-first batch."""
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy("query_id").orderBy("batch_id")
    return metrics.select(
        "query_name",
        "query_id",
        "batch_id",
        "num_input_rows",
        "batch_duration_ms",
        "state_rows",
        (
            (F.col("input_rows_per_sec") > F.col("processed_rows_per_sec"))
            & (F.col("num_input_rows") > 0)
        ).alias("falling_behind"),
        (F.col("state_rows") - F.lag("state_rows").over(w)).alias(
            "state_rows_delta"
        ),
    )
