"""Batch ingestion: envelope → validate → infer/evolve → flatten → upsert.

Re-expresses the reference's per-message loop
(reference ``moisturizer/consumer.py:59-83``) as vectorized micro-batches:

reference (1 msg at a time)          this engine (per batch)
--------------------------------     ----------------------------------------
unwrap_message (msgpack/json)        :func:`unwrap_envelope` — JVM ``from_json``
                                     envelope split + dead-letter branch
get_descriptor (dict cache)          driver-side Registry cache
infer_schema_change per message      ONE distributed field-profile pass per
                                     type (Arrow-batched ``mapInPandas``),
                                     merged once on the driver
validate + flatten per message       ONE distributed validate pass emitting
                                     typed rows + per-record dead letters
model.save() per message             ONE keyed LWW MERGE per type

Sequential-per-message processing is the reference's biggest scale defect
(SURVEY §4); this design replaces it wholesale. The only driver-side loop
is over *distinct type_ids in the batch* (DDL orchestration), not rows.

Error semantics preserved: a poison message kills neither the batch nor the
stream — it lands in the dead-letter table with an error string (upgrade
over the reference's Sentry-capture-and-drop, ``consumer.py:79-83``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from moisturizer_spark.flatten import flatten_dict
from moisturizer_spark.registry import Registry
from moisturizer_spark.storage import ParquetTable
from moisturizer_spark.typesys import Descriptor, FieldDescriptor, compatible

try:  # prefer the C-accelerated package when a deployment has it
    import msgpack  # type: ignore

    _HAS_REAL_MSGPACK = True
except ImportError:
    # the wire format is a small public spec; the built-in pure-Python
    # codec removes the import gate entirely (decode capability is now
    # unconditional — only the PATH-SELECTION heuristic below still
    # cares whether the real package is installed)
    from moisturizer_spark import msgpack_mini as msgpack

    _HAS_REAL_MSGPACK = False

DEAD_LETTER_TABLE = "_dead_letters"

_PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType()),
        T.StructField("jtype", T.StringType()),
        T.StructField("jformat", T.StringType()),
    ]
)


def decode_envelope_bytes(raw: bytes) -> tuple[str | None, dict]:
    """msgpack-else-JSON decode of one wire message
    (reference ``moisturizer/consumer.py:24-39``)."""
    try:
        payload = msgpack.loads(raw, raw=False)
    except Exception:
        payload = json.loads(raw)
    if not isinstance(payload, dict) or "type_id" not in payload:
        raise ValueError("envelope missing required 'type_id'")
    return payload["type_id"], payload.get("data") or {}


def _decode_envelopes_python(df: DataFrame) -> DataFrame:
    """Arrow-batched distributed decode of raw wire bytes: msgpack when
    the package is importable, JSON fallback — per MESSAGE, exactly the
    reference's probe-then-fallback (``moisturizer/consumer.py:24-39``).

    Used when a topic may carry msgpack envelopes (the JVM cannot parse
    them); JSON-only deployments take the ``from_json`` path instead,
    which stays inside whole-stage codegen.
    """
    out_schema = T.StructType(
        [
            T.StructField("type_id", T.StringType()),
            T.StructField("data", T.StringType()),
            T.StructField("_decode_error", T.StringType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            type_ids, datas, errors = [], [], []
            for raw in pdf["value"]:
                try:
                    type_id, data = decode_envelope_bytes(bytes(raw))
                    type_ids.append(type_id)
                    datas.append(json.dumps(data))
                    errors.append(None)
                except Exception as exc:
                    type_ids.append(None)
                    datas.append(None)
                    errors.append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(
                {"type_id": type_ids, "data": datas, "_decode_error": errors}
            )

    return df.select("value").mapInPandas(run, out_schema)


def unwrap_envelope(df: DataFrame, wire_format: str = "auto") -> tuple[DataFrame, DataFrame]:
    """Split an envelope DataFrame into (good, dead_letters).

    Accepts either ``(type_id STRING, data STRING)`` columns directly
    (FIXTURES.md F1) or a raw ``value BINARY`` Kafka-style column.
    ``wire_format``:

    - ``"auto"``: distributed msgpack-else-JSON decode when the REAL
      msgpack package is installed (its presence signals a deployment
      whose producers emit msgpack — those events must not
      dead-letter); JVM-side ``from_json`` otherwise. Decode CAPABILITY
      is unconditional either way (``msgpack_mini`` backs the decoder
      when the package is absent) — this knob only picks the default
      plan, keeping JSON-only containers on the codegen fast path.
    - ``"json"``: force the JVM path (fastest; JSON-only topics).
    - ``"python"``: force the mapInPandas msgpack-else-JSON path (the
      right setting for msgpack topics in package-less deployments).
    """
    if "type_id" not in df.columns and "value" in df.columns:
        use_python = wire_format == "python" or (
            wire_format == "auto" and _HAS_REAL_MSGPACK
        )
        if use_python:
            decoded = _decode_envelopes_python(df)
            good = decoded.filter(F.col("type_id").isNotNull()).drop("_decode_error")
            dead = (
                decoded.filter(F.col("type_id").isNull())
                .withColumn(
                    "error",
                    F.coalesce(
                        F.col("_decode_error"),
                        F.lit("envelope missing required 'type_id'"),
                    ),
                )
                .drop("_decode_error")
            )
            return good, dead
        decoded = F.from_json(
            F.col("value").cast("string"),
            T.StructType(
                [
                    T.StructField("type_id", T.StringType()),
                    T.StructField("data", T.StringType()),
                ]
            ),
        )
        df = df.withColumn("type_id", decoded["type_id"]).withColumn(
            "data", decoded["data"]
        )
    good = df.filter(F.col("type_id").isNotNull())
    dead = df.filter(F.col("type_id").isNull()).withColumn(
        "error", F.lit("envelope missing required 'type_id'")
    )
    return good, dead


def _txn_applied(table: ParquetTable, app_id: str, batch_id: int | None) -> bool:
    """True iff this batch already committed to ``table`` under ``app_id``
    (replay after crash-before-checkpoint)."""
    if batch_id is None:
        return False
    v = table.txn_version(app_id)
    return v is not None and batch_id <= v


@dataclass
class IngestStats:
    types: int = 0
    rows_upserted: int = 0
    dead_letters: int = 0
    evolved_fields: int = 0


class IngestEngine:
    """Vectorized ingestion into per-type tables via a :class:`Registry`."""

    def __init__(self, registry: Registry):
        self.registry = registry

    # -- field profiling (distributed, Arrow-batched) -----------------------
    @staticmethod
    def _profile(data_df: DataFrame) -> list[tuple[str, str, str | None]]:
        """Distinct (field, type, format) triples across the batch.

        mapInPandas emits per-partition-distinct triples; the global
        distinct is a tiny shuffle (bounded by #fields × #types, i.e.
        schema-sized, not data-sized)."""

        def emit(batches):
            for pdf in batches:
                seen: set[tuple[str, str, str | None]] = set()
                for payload in pdf["data"]:
                    try:
                        obj = flatten_dict(json.loads(payload) if payload else {})
                    except (ValueError, TypeError, AttributeError):
                        continue  # bad JSON dead-letters in the validate pass
                    for key, value in obj.items():
                        fd = FieldDescriptor.from_value(value)
                        seen.add((key, fd.type, fd.format))
                yield pd.DataFrame(
                    [
                        {"field": f, "jtype": t, "jformat": fmt or ""}
                        for f, t, fmt in seen
                    ],
                    columns=["field", "jtype", "jformat"],
                )

        rows = data_df.select("data").mapInPandas(emit, _PROFILE_SCHEMA).distinct().collect()
        return [(r["field"], r["jtype"], r["jformat"] or None) for r in rows]

    def _evolve(self, descriptor: Descriptor, profile) -> int:
        """Merge new fields into the descriptor (add-only). Fields whose
        batch-inferred type conflicts with the descriptor are NOT widened —
        the conflicting *records* die in the validate pass, matching the
        reference's per-message error capture. When a brand-new field shows
        multiple types within one batch, first-seen-by-sorted-order wins
        deterministically and the other records dead-letter."""
        new_fields: dict[str, FieldDescriptor] = {}
        for field, jtype, jformat in sorted(profile, key=lambda x: (x[0], x[1], x[2] or "")):
            if jtype == "null":
                continue
            if field in descriptor.properties or field in new_fields:
                continue
            new_fields[field] = FieldDescriptor(type=jtype, format=jformat)
        if new_fields:
            descriptor.apply_change(new_fields)
            self.registry.save(descriptor)
        return len(new_fields)

    # -- validation (distributed, Arrow-batched) ----------------------------
    @staticmethod
    def _validate_pass(data_df: DataFrame, descriptor: Descriptor) -> DataFrame:
        """Validate + coerce + flatten every record against the (already
        evolved) descriptor. Emits rows in the descriptor's storage schema
        plus an ``_error`` string column (null = valid) and the arrival
        sequence ``_seq`` (LWW tiebreaker — the reference processes
        messages sequentially, so within-batch duplicates must resolve to
        the LAST arrival, not whichever partition validated first).

        ``last_modified`` defaults to ONE timestamp for the whole batch:
        per-record ``now()`` inside a parallel map would order rows by
        processing time, which does not track arrival order.
        """
        import datetime as _dt

        props = {k: v.to_dict() for k, v in descriptor.properties.items()}
        schema = (
            descriptor.spark_schema()
            .add("_error", T.StringType())
            .add("_seq", T.LongType())
            .add("_raw", T.StringType())  # original payload, error rows only
        )
        out_cols = [f.name for f in schema.fields]
        type_id = descriptor.id
        batch_ts = _dt.datetime.now(_dt.timezone.utc)

        def run(batches):
            desc = Descriptor.from_row({"id": type_id, "properties": props})
            for pdf in batches:
                rows = []
                for payload, seq in zip(pdf["data"], pdf["_seq"]):
                    row = dict.fromkeys(out_cols)
                    row["_seq"] = int(seq)
                    try:
                        obj = json.loads(payload) if payload else {}
                        if not isinstance(obj, dict):
                            raise ValueError("payload is not an object")
                        validated = desc.validate(flatten_dict(obj), default_ts=batch_ts)
                        row.update({k: v for k, v in validated.items() if k in row})
                    except Exception as exc:  # per-record dead letter
                        row["_error"] = f"{type(exc).__name__}: {exc}"
                        row["_raw"] = payload
                        row["id"] = ""
                    rows.append(row)
                yield pd.DataFrame(rows, columns=out_cols)

        return data_df.select("data", "_seq").mapInPandas(run, schema)

    # -- batch entry point --------------------------------------------------
    def ingest_batch(
        self,
        envelope_df: DataFrame,
        wire_format: str = "auto",
        batch_id: int | None = None,
    ) -> IngestStats:
        """Run one envelope batch through decode → validate → evolve →
        MERGE. ``batch_id`` (provided by the streaming foreachBatch sink)
        makes the whole batch replay-idempotent: each table write commits
        the batch id as a txn watermark in its manifest, and an
        already-applied batch skips both the non-idempotent dead-letter
        appends AND the (idempotent but costly) MERGE rewrites."""
        stats = IngestStats()
        good, dead = unwrap_envelope(envelope_df, wire_format=wire_format)
        # Arrival order within the batch (per-partition exact, partition-index
        # ordered across partitions — the same guarantee Kafka itself gives).
        good = good.withColumn("_seq", F.monotonically_increasing_id())
        stats.dead_letters += self._dead_letter(
            dead.select(F.to_json(F.struct(*dead.columns)).alias("payload"),
                        F.col("error")),
            txn=("ingest:dead:envelope", batch_id) if batch_id is not None else None,
        )

        type_ids = [r[0] for r in good.select("type_id").distinct().collect()]
        stats.types = len(type_ids)
        for type_id in sorted(type_ids):
            per_type = good.filter(F.col("type_id") == type_id)
            descriptor = self.registry.get_or_create(type_id)
            stats.evolved_fields += self._evolve(descriptor, self._profile(per_type))
            validated = self._validate_pass(per_type, descriptor).cache()
            bad = validated.filter(F.col("_error").isNotNull())
            # dead letters keep the ORIGINAL envelope (type_id + raw data),
            # same shape as envelope-stage dead letters, so replay can
            # re-ingest them verbatim after a schema fix
            stats.dead_letters += self._dead_letter(
                bad.select(
                    F.to_json(
                        F.struct(
                            F.lit(type_id).alias("type_id"),
                            F.col("_raw").alias("data"),
                        )
                    ).alias("payload"),
                    F.col("_error").alias("error"),
                ),
                txn=(f"ingest:dead:{type_id}", batch_id) if batch_id is not None else None,
            )
            rows = validated.filter(F.col("_error").isNull()).drop("_error", "_raw")
            table = self.registry.table(type_id)
            # Never MERGE an empty batch: besides the wasted rewrite, an
            # all-rows-invalid batch would impose this batch's (possibly
            # stale) column types onto the stored table via union coercion.
            # rows_upserted counts THIS batch's merged rows (cheap: counted
            # off the cached `validated` frame), never a table re-scan.
            n_rows = rows.count()
            if n_rows and not _txn_applied(table, "ingest", batch_id):
                table.upsert(
                    rows,
                    seq_col="_seq",
                    txn=("ingest", batch_id) if batch_id is not None else None,
                )
                stats.rows_upserted += n_rows
            validated.unpersist()
        return stats

    def compact_warehouse(self, target_file_bytes: int = 128 * 1024 * 1024) -> dict[str, int]:
        """Compact every type table plus the dead-letter log; returns
        {table: file_count_after}.

        Micro-batch MERGEs leave one fresh file per touched bucket per
        batch and appends stack files per bucket, so file counts (and
        manifest lists) grow with batch cadence. Run off the hot path —
        the streaming sink can invoke it every N batches
        (:func:`moisturizer_spark.streaming.ingest_stream.start_ingest_stream`
        ``compact_every``); readers are never blocked (same atomic
        manifest swap as any write).
        """
        import os

        out: dict[str, int] = {}
        for type_id in self.registry.list_ids():
            table = self.registry.table(type_id)
            if table.exists():
                out[type_id] = table.compact(target_file_bytes)
        dead = ParquetTable(
            self.registry.spark, os.path.join(self.registry.warehouse, DEAD_LETTER_TABLE)
        )
        if dead.exists():
            out[DEAD_LETTER_TABLE] = dead.compact(target_file_bytes)
        return out

    def _dead_letter(self, df: DataFrame, txn: tuple[str, int] | None = None) -> int:
        """Append dead letters; returns how many were written (counted off
        the same materialization the write uses — no extra scan of the
        upstream plan for stats). With ``txn``, a replayed batch (id at or
        below the committed watermark) is skipped — appends are additive,
        so without this a crash-before-checkpoint would duplicate them."""
        import os

        path = os.path.join(self.registry.warehouse, DEAD_LETTER_TABLE)
        table = ParquetTable(self.registry.spark, path)
        if txn is not None and _txn_applied(table, txn[0], txn[1]):
            return 0
        df = df.persist()
        try:
            n = df.count()
            if n:
                table.append(df.withColumn("ts", F.current_timestamp()), txn=txn)
            return n
        finally:
            df.unpersist()

    def dead_letters(self) -> DataFrame:
        import os

        path = os.path.join(self.registry.warehouse, DEAD_LETTER_TABLE)
        table = ParquetTable(self.registry.spark, path)
        schema = T.StructType(
            [
                T.StructField("payload", T.StringType()),
                T.StructField("error", T.StringType()),
                T.StructField("ts", T.TimestampType()),
            ]
        )
        return table.read_or_empty(schema)

    def replay_dead_letters(self, type_id: str) -> IngestStats:
        """Re-ingest one type's dead letters (after a schema fix, e.g.
        :meth:`~moisturizer_spark.crud.Engine.migrate_type`).

        The dead-letter payload for validation failures is the original
        envelope's fields as JSON with a null ``id`` marker; records that
        fail again simply dead-letter again (the replayed batch goes
        through the normal pipeline), so replay is safe to run repeatedly.
        Replayed rows are removed from the dead-letter table first —
        their reprocessing outcome (stored row or fresh dead letter)
        replaces them.
        """
        import os

        # the schema fix typically happened through another registry
        # instance (CRUD engine) — reload from the source of truth
        self.registry.refresh()
        path = os.path.join(self.registry.warehouse, DEAD_LETTER_TABLE)
        table = ParquetTable(self.registry.spark, path)
        if not table.exists():
            return IngestStats()
        parsed = F.from_json(
            F.col("payload"),
            T.StructType([T.StructField("type_id", T.StringType())]),
        )
        matches = F.coalesce(parsed["type_id"], F.lit("")) == type_id
        replay = table.delete_where(matches)
        if not replay.head(1):
            return IngestStats()
        envelopes = replay.select(
            F.lit(type_id).alias("type_id"),
            F.get_json_object(F.col("payload"), "$.data").alias("data"),
        )
        return self.ingest_batch(envelopes)
