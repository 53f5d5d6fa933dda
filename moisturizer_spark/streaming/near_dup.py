"""Streaming NEAR-duplicate curation against a persisted MinHash index.

The continuous-crawl complement of :mod:`streaming/curation` (which
dedups EXACT content): each micro-batch of documents is near-dup'd
within itself, then against the ever-growing persisted MinHash-LSH
index (:func:`~moisturizer_spark.operators.dedup.minhash_build` /
``minhash_query``), and the survivors are appended to a curated table,
a per-batch stats row, and the index itself — so batch N+1 dedups
against everything batch N kept, across restarts, with no streaming
state store and no watermark coupling.

Exactly-once discipline (the curation-stream recipe, adapted to an
index that appends parquet rather than upserting a keyed table):

1. ``curated.upsert``  (survivors — pure function of batch + index
   BEFORE this batch)
2. ``stats.upsert``    (same purity argument: sequenced before the
   index absorbs the batch)
3. ``minhash_append``  LAST, watermarked in a ``_stream_txn.json``
   sidecar bumped atomically (``os.replace``) after the append.

Replay analysis — why re-running a partially-applied batch converges:
``minhash_query`` filters self-pairs (``corpus_id != batch_id``), and
two surviving batch docs are by construction NOT near-dups of each
other, so a replay that finds the batch's own rows already appended
computes the IDENTICAL survivor set; the curated/stats writes skip via
their table watermarks. The one non-idempotent window — crash between
the parquet append and the sidecar bump — re-appends the batch's band
and gram rows; duplicate index rows are SEMANTICALLY harmless
(candidate pairs are de-duplicated before the verify join and
duplicated verify rows only repeat identical pair rows, which
downstream anti-joins ignore) and ``minhash_compact`` drops them at
the next compaction. This is the standard trade for append-only
layouts: exactly-once EFFECT, at-least-once physical rows.

Scale: per batch, one signature pass over the batch; the candidate
join touches only colliding LSH buckets of the stored band table;
appends write ~shuffle-partitions small files (compact on cadence,
exactly like the batch pipeline).
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

from moisturizer_spark.operators.dedup import (
    minhash_append,
    minhash_near_duplicates,
    minhash_query,
)
from moisturizer_spark.storage import ParquetTable

APP_ID = "near_dup_stream"


def start_near_dup_stream(
    doc_stream: DataFrame,
    index_path: str,
    curated: ParquetTable,
    stats: ParquetTable,
    checkpoint_dir: str,
    available_now: bool = True,
    pairs: ParquetTable | None = None,
) -> StreamingQuery:
    """Run the near-dup curation pipeline over a document stream via
    foreachBatch. ``doc_stream`` must carry the index's (id_col,
    text_col) columns; the banding shape, shingle size, and threshold
    all come from the index sidecar so the stream can never drift from
    the corpus it dedups against. ``curated`` is keyed on the id
    column; ``stats`` on the batch id.

    ``pairs`` (optional) is an EDGE table keyed on the canonical
    ``pair`` string: every near-dup pair the batch surfaces — within
    the batch and against the corpus index — upserts as
    ``(pair, id_a, id_b)`` with id_a < id_b. Feeding it to
    :class:`~moisturizer_spark.incremental.IncrementalCCView` turns the
    stream into continuously-maintained dedup CLUSTERS: the stream only
    ever INSERTS edges, exactly the monotone case the view folds
    without recomputing star contraction. Upserts are keyed, so replay
    rewrites the same rows (idempotent without any extra bookkeeping);
    the write rides the same purity window as curated/stats (before the
    index absorbs the batch)."""
    with open(os.path.join(index_path, "_minhash.json")) as fh:
        meta = json.load(fh)
    id_col, text_col = meta["id_col"], meta["text_col"]

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
            and not (pairs is not None and _behind(pairs, batch_id))
            and idx_applied is not None
            and idx_applied >= batch_id
        ):
            return  # fully-applied batch replayed after a restart
        n_in = batch_df.count()
        # 1) within-batch near-dups: drop the LATER id of every pair
        #    (transient pair finder, same signature family as the index)
        pairs_in = minhash_near_duplicates(
            batch_df,
            id_col=id_col,
            text_col=text_col,
            num_hashes=meta["num_hashes"],
            threshold=meta["threshold"],
            n=meta["shingle_n"],
        )
        losers = pairs_in.select(
            F.greatest(F.col("id_a"), F.col("id_b")).alias(id_col)
        ).distinct()
        batch_keep = batch_df.join(losers, id_col, "left_anti")
        # 2) vs the persisted corpus index
        dups = minhash_query(spark, index_path, batch_keep)
        survivors = batch_keep.join(
            dups.select(F.col("batch_id").alias(id_col)).distinct(),
            id_col,
            "left_anti",
        )
        if pairs is not None and _behind(pairs, batch_id):
            corpus_pairs = dups.select(
                F.least("batch_id", "corpus_id").alias("id_a"),
                F.greatest("batch_id", "corpus_id").alias("id_b"),
            )
            all_pairs = (
                pairs_in.select("id_a", "id_b")
                .unionByName(corpus_pairs)
                .distinct()
                .select(
                    F.concat_ws("|", F.col("id_a"), F.col("id_b")).alias(
                        pairs.key
                    ),
                    "id_a",
                    "id_b",
                )
            )
            pairs.upsert(all_pairs, txn=(app_id, batch_id))
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
            minhash_append(
                spark, index_path, survivors.select(id_col, text_col)
            )
            _bump_index_watermark(index_path, batch_id)

    writer = doc_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
