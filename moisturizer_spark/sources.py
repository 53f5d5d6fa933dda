"""Batch sources: file-borne envelopes and typed objects for the ingest engine.

The reference's only source is the Kafka consumer loop
(`/root/reference/moisturizer/consumer.py:72-81`); its envelope shape is
``{type_id, data}`` (`consumer.py:33-37`). This module widens that surface
to the batch/backfill paths a real deployment needs — reading the same
envelopes from files, and lifting *typed* tabular files (parquet/CSV/JSON)
into envelopes so any tabular dataset can be ingested as objects of a
declared type. Streaming equivalents live in
:mod:`moisturizer_spark.streaming.ingest_stream`.

All readers return DataFrames the ingest engine accepts directly
(:func:`moisturizer_spark.ingest.unwrap_envelope` shapes): either a raw
``value`` column or explicit ``(type_id, data)`` columns. Nothing here
collects or loops on the driver — a backfill of a million files is one
distributed scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_envelopes_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """One JSON envelope per line (the Kafka wire format, at rest).

    ``spark.read.text`` keeps each line opaque; decode/validation happens
    inside the ingest engine so malformed lines dead-letter instead of
    failing the scan.
    """
    return spark.read.text(path).select(F.col("value"))


def to_envelopes(df: DataFrame, type_id: str) -> DataFrame:
    """Wrap a typed DataFrame's rows as ``(type_id, data)`` envelopes.

    ``data`` is the JSON-serialized row — the engine re-infers/validates
    against the type's descriptor exactly as it would for wire input, so
    file backfills and live traffic take the identical code path (same
    schema evolution, same conflict errors, same dead-lettering).
    """
    return df.select(
        F.lit(type_id).alias("type_id"),
        F.to_json(F.struct(*df.columns)).alias("data"),
    )


def read_objects_parquet(
    spark: SparkSession, path: str, type_id: str
) -> DataFrame:
    """Parquet rows → envelopes of ``type_id``."""
    return to_envelopes(spark.read.parquet(path), type_id)


def read_objects_csv(
    spark: SparkSession,
    path: str,
    type_id: str,
    header: bool = True,
    infer_schema: bool = True,
) -> DataFrame:
    """CSV rows → envelopes of ``type_id``.

    ``inferSchema`` here only shapes the *wire* value (string vs number in
    the JSON); authoritative typing still happens in the engine's own
    inference lattice, which errors on conflicts instead of widening.
    """
    reader = spark.read.option("header", str(header).lower())
    if infer_schema:
        reader = reader.option("inferSchema", "true")
    return to_envelopes(reader.csv(path), type_id)


def read_objects_json(spark: SparkSession, path: str, type_id: str) -> DataFrame:
    """JSON-lines rows (already-typed documents, not envelopes) →
    envelopes of ``type_id``. Rows pass through as raw text so the
    engine's own decoder handles malformed documents via dead-letters."""
    return spark.read.text(path).select(
        F.lit(type_id).alias("type_id"), F.col("value").alias("data")
    )
