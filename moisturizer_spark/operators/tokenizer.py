"""Distributed BPE tokenizer training — vocabulary induction over a corpus.

The tokenizer-training step of an LLM data pipeline: learn byte-pair
(here: character-pair) merge rules from corpus statistics. Classic BPE
(Sennrich et al., 2016, "Neural Machine Translation of Rare Words with
Subword Units") greedily merges the most frequent adjacent symbol pair,
``n_merges`` times.

Scale design — the two ideas that make this work on 100 TB:

- **Train on the word-frequency table, not the corpus.** The first (and
  only corpus-sized) pass aggregates to ``(word, freq)`` — vocabulary
  cardinality, typically 10^5–10^7 rows regardless of corpus size. Every
  merge iteration then scans ONLY that table; pair counts are weighted by
  ``freq``. This is exactly how single-machine BPE trainers scale, made
  distributed.
- **One bounded driver action per merge.** Each iteration is one
  combinable pair-count shuffle over the vocab table plus a
  ``limit(1).collect()`` of the argmax pair (a 1-row collect, documented
  bounded). The merge itself is a per-row JVM ``aggregate`` fold — no
  Python in the loop. Iteration frames are cached and the predecessor
  unpersisted, so iteration ``i`` does not recompute merges ``1..i-1``.

Ties on pair count break lexicographically on (left, right) — fully
deterministic, so the learned merge table is reproducible run-to-run and
engine-to-engine. For a real 100 TB corpus you'd compose with
``sampling.hash_fraction`` to train on a deterministic sample; the
algorithm is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from moisturizer_spark.operators.textan import tokens_col

__all__ = ["word_freq_table", "merge_pair_expr", "bpe_train", "bpe_segment"]


def word_freq_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The corpus-sized pass: distinct words with occurrence counts.

    Output: (word, freq, syms) where ``syms`` is the initial
    character-symbol array. One explode + one combinable shuffle keyed by
    word; everything downstream of this is vocabulary-sized.
    """
    words = df.select(
        F.explode(tokens_col(F.col(text_col))).alias("word")
    )
    wf = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    syms = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.substring(F.col("word"), i, 1),
    )
    # substring(col, i, 1) with a non-literal position is evaluated per
    # element on the already-present `word` column — no recompute trap.
    return wf.select("word", "freq", syms.alias("syms"))


def merge_pair_expr(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right, non-overlapping merge of (left, right) into
    one symbol — the scan ``i += 2 if pair else 1`` as a JVM
    ``aggregate`` fold with a (out, pending) accumulator.

    After a merge the merged symbol cannot start another merge in the
    same pass (pending resets) — matching the reference scan semantics.
    Symbols are never empty strings, so '' is a safe no-pending sentinel.
    """
    joined = left + right
    init = F.struct(
        F.array().cast("array<string>").alias("out"), F.lit("").alias("p")
    )

    def step(acc, s):
        out, p = acc["out"], acc["p"]
        is_merge = (p == F.lit(left)) & (s == F.lit(right))
        new_out = (
            F.when(p == "", out)
            .when(is_merge, F.concat(out, F.array(F.lit(joined))))
            .otherwise(F.concat(out, F.array(p)))
        )
        new_p = F.when(p == "", s).when(is_merge, F.lit("")).otherwise(s)
        return F.struct(new_out.alias("out"), new_p.alias("p"))

    def fin(acc):
        return F.when(acc["p"] == "", acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["p"]))
        )

    return F.aggregate(syms, init, step, fin)


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair counts over the vocab table, weighted by word freq.

    ``syms`` is a materialized column, so indexing it inside the HOF
    lambda is a per-element array access, not an expression recompute.
    """
    pairs = F.when(
        F.size("syms") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at(F.col("syms"), i).alias("l"),
                F.element_at(F.col("syms"), i + 1).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    return (
        vocab.select(F.explode(pairs).alias("pr"), "freq")
        .groupBy(F.col("pr.l").alias("l"), F.col("pr.r").alias("r"))
        .agg(F.sum("freq").alias("n"))
    )


def _merge_local(syms: list[str], left: str, right: str) -> list[str]:
    """Driver-side mirror of :func:`merge_pair_expr` (same greedy scan)."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    local_vocab_threshold: int = 100_000,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merge rules from a corpus.

    Returns ``(merges, vocab)``: ``merges`` is a list of
    (rank, left, right, weighted_pair_count) in learn order, and
    ``vocab`` the final (word, freq, syms) frame with all merges applied.

    Size-gated execution (the connected-components pattern,
    ``dedup._star_components``): after the one corpus-sized
    word-frequency aggregation, a vocabulary of ≤ ``local_vocab_threshold``
    rows is collected ONCE (a bounded collect — vocabularies are 10^5–10^7
    entries regardless of corpus size; the default gate is ~10 MB) and the
    merge loop runs on the driver — 10 Spark jobs become 1, and the loop
    is pure integer counting. Above the gate, the loop stays distributed:
    per iteration one combinable pair-count shuffle over the vocab table
    plus a 1-row argmax collect, the merge applied as a JVM ``aggregate``
    fold, and the frame re-cached so merge ``i`` never re-derives merges
    ``1..i-1``. Both paths implement the identical deterministic
    algorithm (count argmax, lexicographic ties) and are pinned equal in
    ``tests/test_tokenizer.py``.
    """
    vocab = word_freq_table(df, text_col).cache()
    n_vocab = vocab.count()  # materialize before the loop
    merges: list[tuple[int, str, str, int]] = []

    if n_vocab <= local_vocab_threshold:
        rows = vocab.collect()  # bounded by the gate above
        vocab.unpersist()
        freq = {r["word"]: r["freq"] for r in rows}
        local = {r["word"]: list(r["syms"]) for r in rows}
        for rank in range(n_merges):
            pairs: dict[tuple[str, str], int] = {}
            for w, syms in local.items():
                f = freq[w]
                for a, b in zip(syms, syms[1:]):
                    pairs[(a, b)] = pairs.get((a, b), 0) + f
            if not pairs:
                break
            (l, r), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
            merges.append((rank, l, r, int(n)))
            local = {w: _merge_local(s, l, r) for w, s in local.items()}
        spark = df.sparkSession
        out_vocab = spark.createDataFrame(
            [(w, freq[w], local[w]) for w in sorted(local)],
            "word string, freq bigint, syms array<string>",
        )
        return merges, out_vocab

    for rank in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("n").desc(), "l", "r")
            .limit(1)
            .collect()  # bounded: exactly one row (the argmax pair)
        )
        if not top:
            break
        l, r, n = top[0]["l"], top[0]["r"], top[0]["n"]
        merges.append((rank, l, r, int(n)))
        nxt = vocab.withColumn("syms", merge_pair_expr(F.col("syms"), l, r)).cache()
        nxt.count()
        vocab.unpersist()
        vocab = nxt
    return merges, vocab


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_syms",
) -> DataFrame:
    """Apply a learned merge table to new text: per word, fold the merge
    rules in rank order. Pure column expression (one chained fold per
    rule) — tokenizing with a learned vocab is a map-side projection at
    any corpus size.

    For deep merge tables prefer a pandas UDF with a trie; this chained
    form is right for the shallow tables ``bpe_train`` produces here.
    """
    words = df.withColumn("_w", F.explode(tokens_col(F.col(text_col))))
    syms = F.transform(
        F.sequence(F.lit(1), F.length("_w")),
        lambda i: F.substring(F.col("_w"), i, 1),
    )
    for _, l, r, _n in merges:
        syms = merge_pair_expr(syms, l, r)
    return words.select(
        *df.columns, F.col("_w").alias("word"), syms.alias(out_col)
    )
