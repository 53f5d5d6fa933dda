"""Sequence packing: assign documents to fixed-length training sequences.

LLM training consumes fixed ``ctx_len``-token sequences, but documents have
arbitrary lengths; packing decides which documents share a sequence. Two
strategies, both sharded so no global coordination exists at 100 TB:

- :func:`pack_chunked` — the GPT-style "concatenate then chunk" layout:
  documents are laid head-to-tail in a deterministic order and the stream
  is cut every ``ctx_len`` tokens. Zero padding waste, but documents
  straddle sequence boundaries. Pure window arithmetic (exact integers,
  oracle-reproducible).
- :func:`pack_first_fit` — first-fit-decreasing bin packing: no document
  is split, bins never exceed ``ctx_len``, waste is bounded (FFD uses at
  most 11/9·OPT + 6/9 bins). Per-shard Arrow ``applyInPandas`` — the
  classic case where per-group imperative logic genuinely beats relational
  expression.

Sharding: both strategies partition the corpus by ``id % n_shards`` and
pack within shards independently. That is exactly how a distributed
training-data pipeline behaves (each writer packs its own shard; there is
no global document order worth preserving), and it means the window /
groupBy parallelism equals ``n_shards`` — raise it with corpus size, the
same knob rule as storage buckets. A single global ORDER BY would funnel
100 TB through one partition; the shard design never does.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F


def pack_chunked(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    ctx_len: int = 256,
    n_shards: int = 8,
) -> DataFrame:
    """Concatenate-then-chunk packing: within each shard, documents are
    laid out in ``id`` order and cut into ``ctx_len``-token sequences.

    Adds: ``shard_id``, ``seq_first``/``seq_last`` (sequence ids the
    document's tokens land in, shard-local), ``offset_in_seq`` (token
    offset of the document's first token inside ``seq_first``). A
    document with 0 tokens occupies no sequence (``seq_last < seq_first``
    is normalized to ``seq_last = seq_first``; its offset is still
    meaningful as an insertion point).

    All integer arithmetic over a per-shard running sum — one shuffle on
    ``shard_id``, exact and order-deterministic, so a SQL oracle
    reproduces it bit-for-bit.
    """
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).cast("int")
    out = df.withColumn("shard_id", shard)
    w = (
        Window.partitionBy("shard_id")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tokens_col).over(w)
    cum_prev = cum - F.col(tokens_col)
    return (
        out.withColumn("_cum_prev", cum_prev)
        .withColumn("seq_first", F.expr(f"_cum_prev div {ctx_len}"))
        .withColumn(
            "seq_last",
            F.greatest(
                F.expr(f"(_cum_prev + {tokens_col} - 1) div {ctx_len}"),
                F.col("seq_first"),
            ),
        )
        .withColumn("offset_in_seq", F.expr(f"_cum_prev % {ctx_len}"))
        .drop("_cum_prev")
    )


def pack_first_fit(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    ctx_len: int = 256,
    n_shards: int = 8,
) -> DataFrame:
    """First-fit-decreasing bin packing within shards: documents sorted by
    (tokens desc, id) each go to the lowest-indexed bin with room; no bin
    exceeds ``ctx_len``. Documents longer than ``ctx_len`` get a
    dedicated bin and ``truncated = true`` (the caller decides split vs
    drop semantics).

    Returns (id, shard_id, tokens, bin_id, truncated). Deterministic:
    the sort key and first-fit scan have no ties left to chance.

    Scale shape: one shuffle on ``shard_id``; each group streams through
    a single Arrow batch. Bin state is a per-shard list of residual
    capacities — O(bins) memory, not O(docs). Shards bound group size,
    so executor memory is controlled by ``n_shards``, the same dial as
    every other per-shard stage.
    """
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).cast("int")
    slim = df.select(
        F.col(id_col), F.col(tokens_col).cast("long"), shard.alias("shard_id")
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([tokens_col, id_col], ascending=[False, True])
        residual: list[int] = []  # remaining capacity per bin
        bin_ids, truncated = [], []
        for t in pdf[tokens_col]:
            t = int(t)
            if t >= ctx_len:
                bin_ids.append(len(residual))
                residual.append(0)
                truncated.append(t > ctx_len)
                continue
            for b, r in enumerate(residual):
                if r >= t:
                    bin_ids.append(b)
                    residual[b] = r - t
                    break
            else:
                bin_ids.append(len(residual))
                residual.append(ctx_len - t)
            truncated.append(False)
        pdf = pdf.assign(bin_id=bin_ids, truncated=truncated)
        return pdf

    schema = (
        f"{id_col} long, {tokens_col} long, shard_id int, "
        "bin_id long, truncated boolean"
    )
    return slim.groupBy("shard_id").applyInPandas(pack, schema=schema)
