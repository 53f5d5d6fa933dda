"""Arbitrary stateful streaming on ``transformWithStateInPandas``
(Spark 4's successor to ``applyInPandasWithState``).

The old API (see ``stateful.py``) packs all per-key state into ONE
tuple-shaped row and hand-rolls expiry via ``GroupStateTimeout``. The new
API gives each key *typed, independently-updatable state variables*
(ValueState / ListState / MapState), native per-field TTL, and timers —
and it runs on the RocksDB state store, which is also what makes
very-large state (100 TB-scale key domains) operable: state lives
off-heap/on-disk per partition with incremental checkpointing, instead
of in executor heap.

The reference has no per-key state at all (its only cross-batch state is
the driver-side descriptor cache, reference ``moisturizer/consumer.py:16``)
— this module is part of the engine's extended streaming surface, kept
alongside the old-API operators so both state models stay covered.

Requires ``spark.sql.streaming.stateStore.providerClass`` =
``...RocksDBStateStoreProvider`` (the API rejects the default HDFS-backed
provider); tests set it per-query via the session conf.

Availability: the API's Python-side state server speaks protobuf
(``google.protobuf``), which this container does not ship — the e2e test
skips when the package is absent, the same gating as the msgpack decode
and Cassandra sink paths. The operator itself is pure public PySpark API
and runs wherever ``pip install protobuf`` has happened.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

TOPK_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("top_values", T.ArrayType(T.DoubleType())),
    ]
)


class _TopKProcessor(StatefulProcessor):
    """Per-key running top-k with two independent state variables:

    - ``count``  (ValueState[long]) — total events seen for the key
    - ``topk``   (ValueState[array<double>]) — the k largest values so far

    Keeping them separate is the point of the new API: a pipeline can
    later add e.g. a MapState of per-type counters without rewriting the
    packed tuple schema (the applyInPandasWithState migration hazard).
    """

    def __init__(self, k: int):
        self._k = k

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._count = handle.getValueState("count", "n BIGINT")
        self._topk = handle.getValueState("topk", "vals ARRAY<DOUBLE>")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n = self._count.get()[0] if self._count.exists() else 0
        vals = list(self._topk.get()[0]) if self._topk.exists() else []
        for pdf in rows:
            n += len(pdf)
            vals.extend(float(v) for v in pdf["value"].dropna())
            # keep only k survivors — state stays O(k) per key no matter
            # how many batches flow through
            vals = sorted(vals, reverse=True)[: self._k]
        self._count.update((n,))
        self._topk.update((vals,))
        yield pd.DataFrame(
            [{"user_id": key[0], "n_events": n, "top_values": vals}]
        )

    def close(self) -> None:
        pass


def running_user_topk(events: DataFrame, k: int = 3) -> DataFrame:
    """Per-user running top-``k`` event values across micro-batches,
    emitted for every key that appears in a batch (update mode).

    State per key is exactly ``k`` doubles + one counter regardless of
    stream length; keys shuffle once to their state partition (the same
    hash partitioning as any streaming aggregation) and RocksDB keeps the
    working set off-heap — the operator's memory footprint is independent
    of the key-domain size.
    """
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_TopKProcessor(k),
        outputStructType=TOPK_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
