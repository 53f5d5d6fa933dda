"""Sinks: where merged tables and streams land beyond the local warehouse.

The reference's one sink is the Cassandra upsert inside its consumer loop
(``/root/reference/moisturizer/consumer.py:69-70`` — ``model.save()`` is a
blind INSERT that overwrites by primary key). In this engine the primary
sink is the bucketed parquet warehouse (:mod:`moisturizer_spark.storage`);
this module adds the export surface:

- :func:`export_table` / :func:`export_query` — distributed file export
  (parquet/json/csv) of any table or query result. Tested.
- :func:`cassandra_writer` — the reference-parity Cassandra sink, gated on
  the spark-cassandra-connector JVM package (not present in this
  container, so it raises a clear error at build time rather than at
  runtime mid-stream; the option-plumbing is real and unit-tested).
- :func:`jdbc_writer` — same pattern for JDBC warehouses.

Scale: every export is a plain ``df.write`` — one distributed job, no
driver materialization. Writer-builders return functions usable both for
batch (call with a DataFrame) and ``foreachBatch`` (pass as the sink with
``lambda df, _id: writer(df)``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

_EXPORT_FORMATS = {"parquet", "json", "csv"}

CASSANDRA_FORMAT = "org.apache.spark.sql.cassandra"


def export_table(df: DataFrame, path: str, fmt: str = "parquet",
                 mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """Write ``df`` to files at ``path`` (the backfill/export analog of
    :mod:`moisturizer_spark.sources`). ``partition_by`` produces
    hive-layout directories for downstream partition pruning."""
    if fmt not in _EXPORT_FORMATS:
        raise ValueError(f"unsupported export format {fmt!r}; one of {sorted(_EXPORT_FORMATS)}")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)


def export_query(spark, query_fn: Callable, sf_dir: str, path: str, fmt: str = "parquet") -> None:
    """Materialize one workload query straight to files — the
    'ship this result to the lake' path."""
    export_table(query_fn(spark, sf_dir), path, fmt=fmt)


def _connector_available(spark, fmt: str) -> bool:
    """True iff the JVM can load ``fmt``'s DataSource (external package)."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 - JVM probe
            "org.apache.spark.sql.cassandra.DefaultSource"
            if fmt == CASSANDRA_FORMAT
            else fmt
        )
        return True
    except Exception:
        return False


def cassandra_writer(
    spark,
    keyspace: str,
    table: str,
    mode: str = "append",
) -> Callable[[DataFrame], None]:
    """Build the reference-parity Cassandra sink
    (``consumer.py:69-70``: upsert-by-primary-key — Cassandra INSERT
    semantics make ``mode="append"`` an upsert).

    Requires the spark-cassandra-connector package on the cluster
    (``--packages com.datastax.spark:spark-cassandra-connector_2.13:...``);
    absent, this raises immediately with instructions instead of failing
    inside a running stream.
    """
    if not _connector_available(spark, CASSANDRA_FORMAT):
        raise RuntimeError(
            "spark-cassandra-connector is not on the classpath; launch with "
            "--packages com.datastax.spark:spark-cassandra-connector_2.13:<ver> "
            "to enable the Cassandra sink"
        )

    def write(df: DataFrame) -> None:
        (
            df.write.format(CASSANDRA_FORMAT)
            .options(keyspace=keyspace, table=table)
            .mode(mode)
            .save()
        )

    return write


def jdbc_writer(
    url: str, table: str, mode: str = "append", **options: str
) -> Callable[[DataFrame], None]:
    """Build a JDBC sink (requires the driver jar on the classpath)."""

    def write(df: DataFrame) -> None:
        df.write.mode(mode).options(**options).jdbc(url, table)

    return write
