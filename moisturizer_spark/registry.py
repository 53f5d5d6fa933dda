"""Descriptor registry: schema-as-data with a self-describing bootstrap row.

The reference keeps descriptors in a Cassandra table whose own schema is
described by a meta-descriptor row ``id='descriptor_model'``
(reference ``moisturizer/__init__.py:32-42``, ``moisturizer/models.py:111-136``),
and caches descriptors in a per-consumer dict
(reference ``moisturizer/consumer.py:16,41-46``).

Here the registry is a small JSON-lines document beside the warehouse plus
an in-memory cache on the driver — schemas are metadata (KBs), so a
driver-side store is the *correct* scale choice; executors only ever see
the resolved ``StructType``. ``to_df`` exposes the registry as a DataFrame
(``MAP<STRING, STRUCT<...>>`` properties, mirroring FIXTURES.md F3) for
introspection queries.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, types as T

from moisturizer_spark.errors import TypeNotFound
from moisturizer_spark.storage import ParquetTable
from moisturizer_spark.typesys import Descriptor, FieldDescriptor

META_DESCRIPTOR_ID = "descriptor_model"

_PROPERTIES_TYPE = T.MapType(
    T.StringType(),
    T.StructType(
        [
            T.StructField("type", T.StringType()),
            T.StructField("format", T.StringType()),
            T.StructField("primary_key", T.BooleanType()),
            T.StructField("partition_key", T.BooleanType()),
            T.StructField("required", T.BooleanType()),
            T.StructField("index", T.BooleanType()),
        ]
    ),
)

REGISTRY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("description", T.StringType()),
        T.StructField("last_modified", T.TimestampType()),
        T.StructField("properties", _PROPERTIES_TYPE),
    ]
)


class Registry:
    """Driver-side descriptor store, persisted to ``<warehouse>/_descriptors.json``."""

    def __init__(self, spark: SparkSession, warehouse: str,
                 retain_versions: int = 1):
        self.spark = spark
        self.warehouse = warehouse
        # version history depth for every table this registry hands out
        # (time travel / change-data-feed; see ParquetTable.retain_versions)
        self.retain_versions = retain_versions
        os.makedirs(warehouse, exist_ok=True)
        self._path = os.path.join(warehouse, "_descriptors.json")
        self._cache: dict[str, Descriptor] = {}
        # type_id -> registered SQL view name (see register_views)
        self._views: dict[str, str] = {}
        self._load()
        self._bootstrap()

    # -- persistence --------------------------------------------------------
    def _load(self) -> None:
        if os.path.exists(self._path):
            with open(self._path) as fh:
                for line in fh:
                    if line.strip():
                        desc = Descriptor.from_row(json.loads(line))
                        self._cache[desc.id] = desc

    def _flush(self) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.warehouse, suffix=".json")
        with os.fdopen(fd, "w") as fh:
            for desc in self._cache.values():
                row = desc.to_row()
                row["last_modified"] = row["last_modified"].isoformat()
                fh.write(json.dumps(row) + "\n")
        os.replace(tmp, self._path)

    def _bootstrap(self) -> None:
        """Insert the self-describing meta-descriptor row
        (reference ``moisturizer/__init__.py:37-42``). Idempotent."""
        if META_DESCRIPTOR_ID not in self._cache:
            meta = Descriptor(
                id=META_DESCRIPTOR_ID,
                properties={
                    "properties": FieldDescriptor(type="object", format="descriptor")
                },
            )
            self._cache[META_DESCRIPTOR_ID] = meta
            self._flush()

    def refresh(self) -> None:
        """Reload descriptors from disk, dropping the driver cache.

        The registry file is the source of truth; this cache is the
        reference's per-consumer descriptor dict (``consumer.py:16``).
        Call after another Registry instance/process may have changed a
        descriptor (e.g. a CRUD ``migrate_type`` while an ingest engine
        holds its own registry) — the reference has the same
        reload-after-external-change step at ``consumer.py:66-67``.
        """
        self._cache = {}
        self._load()
        self._bootstrap()

    # -- CRUD on descriptors ------------------------------------------------
    def get(self, type_id: str) -> Descriptor:
        try:
            return self._cache[type_id]
        except KeyError:
            raise TypeNotFound(f"unknown type {type_id!r}") from None

    def exists(self, type_id: str) -> bool:
        return type_id in self._cache

    def get_or_create(self, type_id: str) -> Descriptor:
        """Reference ``moisturizer/consumer.py:48-55`` get-or-create."""
        if type_id not in self._cache:
            self.save(Descriptor(id=type_id))
        return self._cache[type_id]

    def save(self, descriptor: Descriptor) -> None:
        self._cache[descriptor.id] = descriptor
        self._flush()

    def delete(self, type_id: str) -> None:
        """Drop descriptor + physical table
        (reference ``moisturizer/models.py:176-182``)."""
        self.get(type_id)
        del self._cache[type_id]
        self._flush()
        self.table(type_id).drop()

    def list_ids(self) -> list[str]:
        return sorted(self._cache)

    # -- physical tables ----------------------------------------------------
    def table(self, type_id: str) -> ParquetTable:
        safe = "".join(c if c.isalnum() or c in "_-" else "_" for c in type_id)
        on_commit = None
        if type_id in self._views:
            # writes through this handle keep the registered view on the
            # table head (a temp view pins the file snapshot it was built
            # on; without the refresh, vacuum of the next-next commit
            # would delete the files the stale view references)
            on_commit = lambda: self._refresh_view(type_id)  # noqa: E731
        return ParquetTable(
            self.spark,
            os.path.join(self.warehouse, f"objects_{safe}"),
            retain_versions=self.retain_versions,
            on_commit=on_commit,
        )

    def _refresh_view(self, type_id: str) -> None:
        view = self._views.get(type_id)
        if view is None:
            return
        table = self.table(type_id)
        if table.exists():
            table.read().createOrReplaceTempView(view)

    def register_views(self, prefix: str = "", include_meta: bool = False) -> list[str]:
        """Expose every type's table as a Spark SQL temp view named
        ``<prefix><type_id>`` (sanitized), so the whole warehouse is
        queryable via ``spark.sql`` — joins across types, window
        functions, the works — with no data movement: views are logical,
        so Catalyst still prunes columns and pushes filters into each
        table's parquet scan.

        A temp view pins BOTH the schema and the data snapshot current at
        registration time. To keep views live, every commit made through
        a table handle from THIS registry re-registers the view on the
        new head (see :meth:`table`), so CRUD/ingest through the same
        registry is always visible to SQL. Writers constructed
        independently on the same warehouse path bypass the hook — call
        ``register_views`` again (idempotent) after external writes or
        DDL. The meta descriptor pseudo-type is skipped unless
        ``include_meta``. Returns the view names registered.
        """
        names = []
        for type_id in self.list_ids():
            if type_id == META_DESCRIPTOR_ID and not include_meta:
                continue
            table = self.table(type_id)
            if not table.exists():
                continue
            safe = "".join(c if c.isalnum() or c == "_" else "_" for c in type_id)
            view = f"{prefix}{safe}"
            table.read().createOrReplaceTempView(view)
            self._views[type_id] = view
            names.append(view)
        return names

    # -- introspection ------------------------------------------------------
    def to_df(self) -> DataFrame:
        rows = []
        for desc in self._cache.values():
            row = desc.to_row()
            row["last_modified"] = _dt.datetime.now(_dt.timezone.utc)
            rows.append(row)
        return self.spark.createDataFrame(rows, REGISTRY_SCHEMA)
