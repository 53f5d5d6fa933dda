"""Streaming MEDIA near-dup curation — the image/audio leg of the
dedup x delivery matrix (exact: curation.py; near-text: near_dup.py;
semantic: semantic_dedup.py; THIS: perceptual hashes over raw media
payloads).

Per micro-batch, against a persisted perceptual-hash index
(:func:`~moisturizer_spark.operators.multimodal.phash_build`):

1. within-batch near-dup pairs (banded Hamming join over the batch's
   own hashes) — the LATER id of every pair drops;
2. survivors query the index (:func:`phash_query` — stored bytes never
   re-decode; the sidecar pins kernel/grid/threshold so the stream
   cannot drift from the corpus it dedups against);
3. exactly-once delivery via the shared curation-stream machinery:
   per-table batch-id txn watermarks under the stream-LIFETIME app id
   (fresh checkpoint = reprocess, same checkpoint = exactly-once) and
   the atomic index-sidecar watermark for the non-idempotent hash
   append. Replay converges for the near_dup.py reason: self-pairs are
   filtered and survivors are mutually non-dup, so a re-append only
   leaves duplicate physical hash rows, which queries collapse via the
   candidate DISTINCT and :func:`~moisturizer_spark.operators.
   multimodal.phash_compact` physically sheds (generation-dir rewrite +
   atomic sidecar swap, mirroring ``minhash_compact``/``ivf_compact``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from moisturizer_spark.operators.multimodal import (
    _hash_media,
    _phash_meta,
    phash_append,
    phash_query,
    phash_near_duplicates,
    video_near_duplicates,
)
from moisturizer_spark.storage import ParquetTable
from moisturizer_spark.streaming._txn import (
    txn_behind as _behind_app,
    bump_index_watermark as _bump,
    index_watermark as _index_watermark,
    stream_app_id as _stream_app_id,
)

APP_ID = "media_dedup_stream"


def start_media_dedup_stream(
    media_stream: DataFrame,
    index_path: str,
    curated: ParquetTable,
    stats: ParquetTable,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Run the media near-dup pipeline over a binary-payload stream via
    foreachBatch. ``media_stream`` must carry the index's (id_col,
    content_col) columns; ``curated`` is keyed on the id column;
    ``stats`` on the batch id."""
    meta = _phash_meta(index_path)
    id_col, content_col = meta["id_col"], meta["content_col"]
    app_id = _stream_app_id(APP_ID, checkpoint_dir)

    def _behind(table: ParquetTable, batch_id: int) -> bool:
        return _behind_app(table, app_id, batch_id)

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
        hashed = _hash_media(batch_df, meta)
        # 1) within-batch: drop the LATER id of every near-dup pair
        # (frame-indexed sidecar → the video all-frames-match contract)
        pair_finder = (
            video_near_duplicates
            if meta.get("frame_bytes")
            else phash_near_duplicates
        )
        pairs_in = pair_finder(
            hashed, id_col=id_col, max_distance=meta["max_distance"]
        )
        losers = pairs_in.select(
            F.greatest(F.col("id_a"), F.col("id_b")).alias(id_col)
        ).distinct()
        batch_keep = batch_df.join(losers, id_col, "left_anti")
        # 2) vs the persisted corpus index
        dups = phash_query(spark, index_path, batch_keep)
        survivors = batch_keep.join(
            dups.select(F.col("batch_id").alias(id_col)).distinct(),
            id_col,
            "left_anti",
        )
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
            phash_append(
                spark, index_path, survivors.select(id_col, content_col)
            )
            _bump(index_path, app_id, batch_id)

    writer = media_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
