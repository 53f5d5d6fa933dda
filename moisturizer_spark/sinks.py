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


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str = "doc_id",
    n_shards: int = 16,
    salt: str = "shard:",
    size_col: str | None = None,
) -> list[dict]:
    """Physically write a corpus as deterministic hash shards — the
    output-layout step of a training-data pipeline: one partition
    directory per shard (``shard=<i>/``), plus a ``_manifest.json``
    sidecar with per-shard row counts, key ranges, membership checksums,
    and byte volume (:func:`~moisturizer_spark.operators.sampling.
    shard_manifest`'s rows) so a loader plans balanced data-parallel
    reads without listing files, and re-runs land every document in the
    same shard (resumable, diffable output).

    Scale: the shard id is a map-side md5 projection; the ONE
    intentional shuffle is ``repartition(n_shards, shard)`` so each
    shard's rows are physically grouped and each writer task owns
    exactly one output directory. The manifest aggregation re-uses the
    same assignment expression (consistency pinned in tests); its
    ``n_shards`` rows collect to the driver — bounded by construction.

    Returns the manifest as a list of dicts (also written to the
    sidecar).
    """
    import json
    import os

    from pyspark.sql import functions as F

    from moisturizer_spark.operators.sampling import shard_assign, shard_manifest

    sharded = df.withColumn(
        "shard", shard_assign(F.col(key_col), n_shards, salt)
    )
    (
        sharded.repartition(n_shards, F.col("shard"))
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
    manifest_rows = [
        r.asDict()
        for r in shard_manifest(
            df, key_col, n_shards, salt=salt, size_col=size_col
        )
        .orderBy("shard")
        .collect()  # bounded: n_shards rows
    ]
    tmp = os.path.join(path, "_manifest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(
            {"n_shards": n_shards, "key_col": key_col, "salt": salt,
             "shards": manifest_rows},
            fh,
        )
    os.replace(tmp, os.path.join(path, "_manifest.json"))
    return manifest_rows


def read_shard(spark, path: str, shard: int) -> DataFrame:
    """Read ONE shard of a :func:`write_training_shards` layout — the
    loader side: partition pruning keeps the scan to that shard's
    directory (a data-parallel worker reads only its slice)."""
    return spark.read.parquet(path).filter(f"shard = {shard}")
