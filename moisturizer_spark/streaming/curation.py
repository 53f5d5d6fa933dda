"""Streaming corpus curation: quality filter + cross-batch dedup, exactly-once.

Composes the batch curation operators with Structured Streaming: each
micro-batch of documents is quality-filtered
(:func:`~moisturizer_spark.operators.textan.default_quality_rules`),
deduplicated against the PERSISTED fingerprint store (so dedup state
survives restarts and spans the whole corpus history, not the stream's
watermark), and appended to a curated table together with a one-row
per-batch funnel record.

Exactly-once without distributed transactions: each of the three writes
(curated append, fingerprint upsert, stats append) carries the batch id
as a per-table txn watermark, ordered so a crash between any two writes
replays deterministically —

1. curated.append   (survivors computed from batch + CURRENT store)
2. stats.append     (funnel counts — same pure function of batch + store)
3. store.upsert     (survivors' fingerprints — LAST)

On replay, each write re-runs only if its table's watermark is behind.
The ordering is what makes the recomputation safe: survivors (and hence
the funnel counts) are a pure function of (batch,
store-before-this-batch), so every derived write — curated AND stats —
must be sequenced BEFORE the store write. A crash between any two
writes then re-derives the identical survivor set; flip the store write
earlier and a replayed batch would see its own fingerprints, drop every
survivor, and (for stats) permanently record n_kept=0.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from moisturizer_spark.operators.dedup import incremental_exact_dedup
from moisturizer_spark.operators.textan import default_quality_rules
from moisturizer_spark.storage import ParquetTable
from moisturizer_spark.streaming._txn import (
    stream_app_id as _stream_app_id,
    txn_behind as _behind_app,
)

APP_ID = "curation_stream"


def start_curation_stream(
    doc_stream: DataFrame,
    curated: ParquetTable,
    store: ParquetTable,
    stats: ParquetTable,
    checkpoint_dir: str,
    rules: list[tuple[str, Column]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
) -> StreamingQuery:
    """Run the curation pipeline over a document stream via foreachBatch.

    ``doc_stream`` must carry (id_col, text_col, n_chars) columns (the
    quality rules read ``n_chars``; pass custom ``rules`` to change
    that). ``curated`` is keyed on ``id_col``; ``store`` on the content
    fingerprint; ``stats`` on the batch id.

    Scale: per batch, the quality cascade is a map-side CASE projection;
    dedup anti-joins (fingerprint, id) projections against the bucketed
    store; appends write ~one file per bucket. State is the store table
    itself — no streaming state store, no watermark coupling, and the
    same store serves concurrent BATCH dedup jobs.
    """
    rules_ = default_quality_rules(text_col) if rules is None else rules
    q_pass = reduce(lambda a, b: a & b, [cond for _, cond in rules_])
    # stream-lifetime watermark namespace: a FRESH checkpoint restarts
    # batch ids at 0, so the app id must change with it (_txn docstring)
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
        good = batch_df.filter(q_pass)
        kept = incremental_exact_dedup(
            good, store, text_col=text_col, id_col=id_col, record=False
        )
        if _behind(curated, batch_id):
            curated.upsert(
                kept.drop("fp"), txn=(app_id, batch_id)
            )
        # stats BEFORE store: n_kept is derived from the pre-batch store
        # (via `kept`), so it must be persisted before the store absorbs
        # this batch's fingerprints — a crash after the store write would
        # otherwise replay with every survivor anti-joined away and
        # permanently record n_kept=0.
        if _behind(stats, batch_id):
            spark = batch_df.sparkSession
            n_kept = kept.count()
            stats.upsert(
                spark.createDataFrame(
                    [(batch_id, n_in, good.count(), n_kept)],
                    f"{stats.key} long, n_input long, n_quality long, n_kept long",
                ),
                txn=(app_id, batch_id),
            )
        if _behind(store, batch_id):
            store.upsert(
                kept.select(
                    F.col("fp").alias(store.key),
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
