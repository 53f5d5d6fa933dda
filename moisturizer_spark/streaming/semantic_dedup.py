"""Streaming SEMANTIC dedup against a persisted IVF index.

Completes the dedup × delivery matrix: exact content
(:mod:`streaming/curation`), near-dup text
(:mod:`streaming/near_dup`), and now embedding-space near-dup — each
micro-batch of vectors is deduped within itself (exact cosine over the
batch — batches are broadcast-sized), then against the ever-growing
persisted IVF index (:func:`~moisturizer_spark.operators.similarity.
ivf_query`: centroids from the sidecar, probed-list partition pruning,
no assignment scan), and the survivors are appended to a curated
table, a per-batch stats row, and the index
(:func:`~moisturizer_spark.operators.similarity.ivf_append` — frozen
centroids, no retrain).

Exactly-once discipline is the :mod:`streaming/near_dup` recipe
verbatim: curated and stats writes ride per-table batch-id txn
watermarks and are sequenced BEFORE the index append, which is
watermarked by an atomically-replaced ``_stream_txn.json`` sidecar.
The replay-convergence argument also carries over: ``ivf_query``
filters self-matches (``query_id != neighbor_id``) and two surviving
batch vectors are by construction NOT semantic dups of each other, so
a replay that finds the batch already appended computes the identical
survivor set; the only residue is duplicate physical (id, vector)
rows, which are semantically inert (duplicate candidates score
identically) and which ``ivf_compact`` sheds at the next compaction.

Recall caveat, inherited from IVF itself: the cross-corpus check sees
only the probed lists, so a semantic dup hiding in an unprobed list
survives — raise ``n_probe`` (up to ``n_lists`` for exhaustive search)
to trade batch latency for dedup recall; the within-batch stage is
always exact.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from moisturizer_spark.streaming._txn import (
    txn_behind as _behind_app,
    bump_index_watermark as _bump,
    index_watermark as _index_watermark,
    stream_app_id as _stream_app_id,
)

from moisturizer_spark.operators.similarity import (
    embedding_cosine_pairs,
    ivf_append,
    ivf_query,
)
from moisturizer_spark.storage import ParquetTable

APP_ID = "semantic_dedup_stream"


def start_semantic_dedup_stream(
    vec_stream: DataFrame,
    index_path: str,
    curated: ParquetTable,
    stats: ParquetTable,
    checkpoint_dir: str,
    threshold: float = 0.95,
    n_probe: int = 4,
    available_now: bool = True,
) -> StreamingQuery:
    """Run the semantic-dedup pipeline over an embedding stream via
    foreachBatch. ``vec_stream`` must carry the index's (id_col,
    vec_col) columns (names and id type validated against the sidecar
    by ``ivf_query``/``ivf_append``); ``curated`` is keyed on the id
    column; ``stats`` on the batch id. ``threshold`` is the rounded
    cosine at-or-above which two vectors count as duplicates."""
    with open(os.path.join(index_path, "_ivf.json")) as fh:
        meta = json.load(fh)
    id_col, vec_col = meta["id_col"], meta["vec_col"]

    # stream-lifetime watermark namespace: a FRESH checkpoint restarts
    # batch ids at 0, so the app id must change with it (_txn docstring)
    app_id = _stream_app_id(APP_ID, checkpoint_dir)

    def _behind(table: ParquetTable, batch_id: int) -> bool:
        return _behind_app(table, app_id, batch_id)

    def _bump_index_watermark(path: str, batch_id: int) -> None:
        _bump(path, app_id, batch_id)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        idx_applied = _index_watermark(index_path, app_id)
        if (
            not (_behind(curated, batch_id) or _behind(stats, batch_id))
            and idx_applied is not None
            and idx_applied >= batch_id
        ):
            return  # fully-applied batch replayed after a restart
        n_in = batch_df.count()
        # 1) within-batch: exact cosine pairs (batch × batch broadcast —
        #    micro-batches are broadcast-sized); drop the LATER id
        pairs_in = embedding_cosine_pairs(
            batch_df, threshold, id_col=id_col, vec_col=vec_col
        )
        losers = pairs_in.select(
            F.greatest(F.col("id_a"), F.col("id_b")).alias(id_col)
        ).distinct()
        batch_keep = batch_df.join(losers, id_col, "left_anti")
        # 2) vs the persisted corpus index: any probed neighbor at or
        #    above the threshold marks the batch vector a duplicate
        dup_ids = (
            ivf_query(spark, index_path, batch_keep, k=1, n_probe=n_probe)
            .filter(F.col("sim") >= threshold)
            .select(F.col("query_id").alias(id_col))
            .distinct()
        )
        survivors = batch_keep.join(dup_ids, id_col, "left_anti")
        if _behind(curated, batch_id):
            curated.upsert(survivors, txn=(app_id, batch_id))
        if _behind(stats, batch_id):
            n_batch_keep = batch_keep.count()
            n_kept = survivors.count()
            stats.upsert(
                spark.createDataFrame(
                    [
                        (
                            batch_id,
                            n_in,
                            n_in - n_batch_keep,
                            n_batch_keep - n_kept,
                            n_kept,
                        )
                    ],
                    f"{stats.key} long, n_input long, n_batch_dups long, "
                    "n_corpus_dups long, n_kept long",
                ),
                txn=(app_id, batch_id),
            )
        if idx_applied is None or idx_applied < batch_id:
            ivf_append(
                spark, index_path, survivors.select(id_col, vec_col)
            )
            _bump_index_watermark(index_path, batch_id)

    writer = vec_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
