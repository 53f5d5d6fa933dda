"""moisturizer_spark — a PySpark-native analytics + schema-inferring event engine.

A from-scratch re-expression of the capabilities of gabisurita/moisturizer
(reference: /root/reference, a ~500-LoC Kafka→Cassandra schema-inferring
event store) as an idiomatic PySpark engine:

- **Type system & schema inference** (`typesys`): the reference's
  JSON-Schema ``(type, format)`` lattice (reference ``moisturizer/models.py:8-30``)
  re-expressed over Spark ``StructType``, with *conflict-errors-not-widening*
  semantics (reference ``tests/test_models.py:65-83``).
- **Descriptor registry** (`registry`): schema-as-data, one descriptor row
  per type, self-describing bootstrap row
  (reference ``moisturizer/__init__.py:37-42``).
- **Flatten/unflatten** (`flatten`): nested JSON → ``__``-separated flat
  columns (reference ``moisturizer/schemas.py:37-43``).
- **Storage** (`storage`): per-type parquet tables with last-write-wins
  keyed upsert (MERGE semantics; reference ``moisturizer/consumer.py:69-70``).
- **Ingestion** (`ingest`, `streaming`): batch + Structured Streaming
  envelope decode → validate → infer/evolve → flatten → upsert
  (reference ``moisturizer/consumer.py``).
- **CRUD surface** (`crud`): the REST-era typed-object CRUD + users +
  permissions semantics (reference ``tests/test_views.py``).
- **Analytics operators** (`operators`): joins/aggs/windows come free from
  Catalyst; plus LLM-data-pipeline extensions — exact & near dedup
  (MinHash-LSH, SimHash, n-gram Jaccard), similarity search over embedding
  columns, text analysis (language-ID, quality, tokens, fingerprints),
  multimodal binary columns.

Design target: 100 TB on a 1000-executor cluster. Everything is declared
through the DataFrame API so Catalyst applies predicate pushdown, column
pruning, join selection, and AQE; Python-side loops exist only on the
driver for DDL orchestration, never per-row.
"""

__version__ = "0.1.0"

from moisturizer_spark.session import get_spark  # noqa: F401
