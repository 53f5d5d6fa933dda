"""Per-type parquet tables with keyed last-write-wins upsert (MERGE).

The reference relies on Cassandra's LSM upsert-as-insert: ``model.save()``
is a blind INSERT that overwrites by primary key ``id``
(reference ``moisturizer/consumer.py:69-70``, pk ``moisturizer/models.py:53-54``).

Spark-first re-expression: each type is one parquet table; an upsert is a
MERGE. Without a transactional table format in this container we implement
copy-on-write MERGE: union(existing, incoming) → window dedup by key →
atomic directory swap. The dedup is expressed with ``row_number`` over
``(id)`` ordered by ``(last_modified DESC, source precedence)`` — a single
shuffle on the merge key, map-side combinable, skew-handled by AQE.

Scale note (100 TB): the same call sites map 1:1 onto Delta Lake
``MERGE INTO t USING s ON t.id = s.id WHEN MATCHED UPDATE ALL WHEN NOT
MATCHED INSERT ALL`` with deletion vectors + partition pruning on the merge
keys; the copy-on-write fallback here exists only because delta-spark is
not installed. The public API (``upsert``/``read``/``delete_where``) is
format-agnostic so swapping the backend is a one-file change.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

# Incoming rows beat existing rows on last_modified ties (LWW upsert).
_PRECEDENCE_COL = "__precedence"
_ROWNUM_COL = "__rn"


class ParquetTable:
    """One keyed table stored as a parquet directory with atomic swaps."""

    def __init__(self, spark: SparkSession, path: str, key: str = "id"):
        self.spark = spark
        self.path = path
        self.key = key

    # -- reads --------------------------------------------------------------
    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.path, "_SUCCESS")) or (
            os.path.isdir(self.path) and any(n.endswith(".parquet") for n in os.listdir(self.path))
        )

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def read_or_empty(self, schema: T.StructType) -> DataFrame:
        if self.exists():
            return self.read()
        return self.spark.createDataFrame([], schema)

    # -- writes -------------------------------------------------------------
    def overwrite(self, df: DataFrame) -> None:
        """Write ``df`` as the new table contents via write-to-temp + swap,
        so concurrent readers never observe a half-written table."""
        tmp = f"{self.path}.tmp-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        old = f"{self.path}.old-{uuid.uuid4().hex[:8]}"
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

    def upsert(
        self,
        incoming: DataFrame,
        order_col: str = "last_modified",
        seq_col: str | None = None,
    ) -> None:
        """MERGE ``incoming`` into the table, last-write-wins by ``key``.

        Within-batch duplicates also collapse to the newest row (the
        reference processes messages sequentially so later messages win —
        SURVEY §7 risk 4). Ordering: ``order_col`` (event time) desc, then
        ``seq_col`` (arrival order within the batch, if provided) desc,
        then incoming-beats-existing precedence. ``seq_col`` is consumed
        here and never stored.
        """
        if seq_col is not None and seq_col not in incoming.columns:
            seq_col = None
        if not self.exists():
            merged = self._dedup(
                incoming.withColumn(_PRECEDENCE_COL, F.lit(1)), order_col, seq_col
            )
            self.overwrite(merged)
            return
        existing = self.read()
        # Add-only schema evolution: align both sides on the union of columns.
        all_cols = list(dict.fromkeys(existing.columns + incoming.columns))
        existing = _with_missing(existing, incoming.schema, all_cols)
        incoming = _with_missing(incoming, existing.schema, all_cols)
        unioned = (
            existing.withColumn(_PRECEDENCE_COL, F.lit(0))
            .unionByName(incoming.withColumn(_PRECEDENCE_COL, F.lit(1)))
        )
        self.overwrite(self._dedup(unioned, order_col, seq_col))

    def _dedup(self, df: DataFrame, order_col: str, seq_col: str | None = None) -> DataFrame:
        order = [F.col(_PRECEDENCE_COL).desc()]
        if seq_col is not None and seq_col in df.columns:
            order.insert(0, F.col(seq_col).desc_nulls_last())
        if order_col in df.columns:
            order.insert(0, F.col(order_col).desc_nulls_last())
        w = Window.partitionBy(self.key).orderBy(*order)
        drop_cols = [_ROWNUM_COL, _PRECEDENCE_COL] + ([seq_col] if seq_col else [])
        return (
            df.withColumn(_ROWNUM_COL, F.row_number().over(w))
            .filter(F.col(_ROWNUM_COL) == 1)
            .drop(*drop_cols)
        )

    def delete_where(self, condition) -> DataFrame:
        """Delete matching rows; returns the deleted rows (the reference's
        DELETE echoes them, ``tests/test_views.py:300-305``).

        The echo is materialized to the driver BEFORE the overwrite —
        never ``.cache()`` here: a cached plan over this path would be
        substituted into later scans of the same (now rewritten) path by
        Spark's CacheManager, serving stale rows. Echo-on-delete is a
        row-level REST semantic; bulk deletion at scale goes through
        ``overwrite`` with a predicate instead.
        """
        df = self.read()
        rows = df.filter(condition).collect()
        self.overwrite(df.filter(~condition))
        return self.spark.createDataFrame(rows, df.schema)

    def file_stats(self) -> tuple[int, int]:
        """(n_data_files, total_bytes) of the current table directory."""
        n, total = 0, 0
        if not os.path.isdir(self.path):
            return 0, 0
        for name in os.listdir(self.path):
            if name.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(self.path, name))
        return n, total

    def compact(self, target_file_bytes: int = 128 * 1024 * 1024) -> int:
        """Rewrite the table into ~``target_file_bytes`` files; returns the
        new file count.

        Streaming micro-batch MERGEs leave one file per shuffle partition
        per batch; at high batch frequency the table degrades into
        thousands of KB-sized files and scan planning (footer reads, task
        scheduling) starts to dominate query time — the classic small-file
        problem. Compaction is the same read → repartition → atomic-swap
        path as every other rewrite, so readers never see a half-compacted
        table. On Delta this maps to OPTIMIZE (+ ZORDER for clustering);
        run it off the ingest path on a schedule.
        """
        n_files, total_bytes = self.file_stats()
        target = max(1, -(-total_bytes // max(target_file_bytes, 1)))
        if n_files <= target:
            return n_files
        self.overwrite(self.read().repartition(target))
        return self.file_stats()[0]

    def drop(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)


def _with_missing(df: DataFrame, other_schema: T.StructType, ordered: list[str]) -> DataFrame:
    """Project ``df`` to ``ordered`` columns, adding typed nulls for ones it
    lacks (add-only evolution: columns are only ever added)."""
    other = {f.name: f.dataType for f in other_schema.fields}
    own = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for name in ordered:
        if name in own:
            cols.append(F.col(name))
        else:
            cols.append(F.lit(None).cast(other[name]).alias(name))
    return df.select(*cols)
