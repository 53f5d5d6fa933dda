"""Bucketed tables: pre-shuffled layout for co-located, exchange-free joins.

At 100 TB the single biggest join cost is shuffling the fact table. A
table bucketed (and sorted) by its join key is *already* hash-partitioned
on disk: every join between two tables bucketed by the same key into the
same bucket count runs as a zero-Exchange sort-merge join — each task
reads bucket i of both sides. The shuffle is paid once at write time and
amortized over every subsequent join; for an ingest-once/query-many
analytics store that trade is almost always right.

This is the vanilla-Spark analog of the reference's Cassandra partition
keys (`/root/reference/moisturizer/models.py:53-54` routes rows by id) —
the partition key lives in the table layout, not in each query.

Caveats encoded here rather than left to folklore:
- both sides must agree on bucket count (or be exact multiples); we pin
  the count in one place per logical key for that reason.
- bucket pruning applies to equality point-lookups on the bucket column.
- AQE cannot re-balance bucketed scans — pick the count for target file
  sizes at the expected data volume (buckets ≈ table_bytes / 256 MB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) managed
    parquet table. Sorting within buckets makes the downstream join's
    sort phase a no-op and enables min/max skipping within buckets."""
    writer = df.write.format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.mode(mode).saveAsTable(table_name)


def bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table (bucket metadata rides along from the
    catalog, which is what lets the planner elide the Exchange)."""
    return spark.table(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on,
    how: str = "inner",
) -> DataFrame:
    """Join two same-key/same-count bucketed tables. The resulting plan
    must contain no Exchange on either side (asserted in tests); if an
    Exchange appears, bucket counts or key sets have drifted."""
    return bucketed(spark, left_table).join(bucketed(spark, right_table), on, how)
