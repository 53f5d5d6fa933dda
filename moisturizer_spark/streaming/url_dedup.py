"""Streaming canonical-URL dedup: the URL column of the dedup ×
delivery matrix (exact / near-text / semantic / media / URL — each
batch AND streaming against persisted, restart-surviving state).

A crawl frontier delivers the same page under endless URL spellings
(mirror hosts, tracking parameters, fragments — see
:mod:`moisturizer_spark.operators.urls`); this stage drops the whole
class per micro-batch for the cost of a map-side canonicalization and
one anti-join against the persisted canonical-URL store — upstream of
(and orders of magnitude cheaper than) the content-level stages, which
then only see URL-unique documents.

Exactly-once is the curation stream's 3-write discipline verbatim
(curated → stats → store, each carrying the stream-lifetime app id +
batch id as a per-table txn watermark): survivors are a pure function
of (batch, store-before-this-batch), so both derived writes sequence
BEFORE the store absorbs the batch's canonical URLs — a crash between
any two writes replays to the identical survivor set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from moisturizer_spark.operators.common import materialize
from moisturizer_spark.operators.urls import canonicalize_url
from moisturizer_spark.storage import ParquetTable
from moisturizer_spark.streaming._txn import (
    stream_app_id as _stream_app_id,
    txn_behind as _behind_app,
)

APP_ID = "url_dedup_stream"


def incremental_url_dedup(
    new_docs: DataFrame,
    store: ParquetTable,
    url_col: str = "url",
    id_col: str = "doc_id",
    record: bool = True,
) -> DataFrame:
    """Canonical-URL dedup of a NEW batch against a persisted store —
    the URL sibling of :func:`~moisturizer_spark.operators.dedup.
    incremental_exact_dedup`: canonicalize (map-side), keep the
    min-``id_col`` row per canonical URL WITHIN the batch
    (deterministic), anti-join canonical URLs already in the store,
    then (``record=True``) upsert the survivors' canonical URLs.

    Returns the surviving batch rows plus a ``canonical_url`` column.
    Scale: the anti-join runs on (canonical_url, id) projections — the
    store is bucketed on the canonical URL and its row is two small
    strings per unique page; text never shuffles.

    NULL / empty / whitespace-only URLs are NOT a dedup key: such rows
    PASS THROUGH unjudged (kept, never stored) with a NULL
    ``canonical_url`` — otherwise every URL-less document in a batch
    would collapse to one survivor (and empty strings would collapse
    corpus-wide through the store), silently discarding distinct
    documents that merely lack a URL.

    ``record=False`` skips the store write for callers sequencing the
    table writes under per-table txn watermarks (the streaming stage
    below)."""
    canon = new_docs.withColumn(
        "canonical_url",
        F.when(
            F.trim(F.coalesce(F.col(url_col), F.lit(""))) == "", F.lit(None)
        ).otherwise(canonicalize_url(F.col(url_col))),
    )
    unjudged = canon.filter(F.col("canonical_url").isNull())
    judged = canon.filter(F.col("canonical_url").isNotNull())
    from pyspark.sql import Window

    w = Window.partitionBy("canonical_url").orderBy(F.col(id_col).asc())
    batch = (
        judged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if store.exists():
        seen = store.read().select(
            F.col(store.key).alias("canonical_url")
        )
        batch = batch.join(seen, on="canonical_url", how="left_anti")
    batch = materialize(batch)  # two consumers: caller + store upsert
    if record:
        store.upsert(
            batch.select(
                F.col("canonical_url").alias(store.key),
                F.col(id_col).cast("string").alias("first_doc_id"),
            )
        )
    return batch.unionByName(unjudged)


def start_url_dedup_stream(
    doc_stream: DataFrame,
    curated: ParquetTable,
    store: ParquetTable,
    stats: ParquetTable,
    checkpoint_dir: str,
    url_col: str = "url",
    id_col: str = "doc_id",
    available_now: bool = True,
) -> StreamingQuery:
    """Run canonical-URL dedup over a document stream via foreachBatch.

    ``doc_stream`` must carry (id_col, url_col, ...) columns.
    ``curated`` is keyed on ``id_col``; ``store`` on the canonical URL;
    ``stats`` on the batch id with (n_input, n_url_dups, n_kept).
    """
    app_id = _stream_app_id(APP_ID, checkpoint_dir)

    def _behind(table: ParquetTable, batch_id: int) -> bool:
        return _behind_app(table, app_id, batch_id)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if not (
            _behind(curated, batch_id)
            or _behind(store, batch_id)
            or _behind(stats, batch_id)
        ):
            return  # fully-applied batch replayed after a restart
        n_in = batch_df.count()
        kept = incremental_url_dedup(
            batch_df, store, url_col=url_col, id_col=id_col, record=False
        )
        if _behind(curated, batch_id):
            curated.upsert(kept, txn=(app_id, batch_id))
        # stats BEFORE store (curation.py ordering rationale): n_kept is
        # a function of the pre-batch store; persisting it after the
        # store write would replay to n_kept=0 on a crash in between
        if _behind(stats, batch_id):
            spark = batch_df.sparkSession
            n_kept = kept.count()
            stats.upsert(
                spark.createDataFrame(
                    [(batch_id, n_in, n_in - n_kept, n_kept)],
                    f"{stats.key} long, n_input long, "
                    "n_url_dups long, n_kept long",
                ),
                txn=(app_id, batch_id),
            )
        if _behind(store, batch_id):
            # unjudged pass-through rows carry a NULL canonical_url and
            # must never become store keys
            store.upsert(
                kept.filter(F.col("canonical_url").isNotNull()).select(
                    F.col("canonical_url").alias(store.key),
                    F.col(id_col).cast("string").alias("first_doc_id"),
                ),
                txn=(app_id, batch_id),
            )

    writer = doc_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
