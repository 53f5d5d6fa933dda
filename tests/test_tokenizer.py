"""BPE trainer vs a pure-Python reference implementation.

The reference is the textbook algorithm (Sennrich et al., 2016): count
adjacent symbol pairs over the word-frequency table, merge the most
frequent pair greedily left-to-right non-overlapping, repeat. Ties break
lexicographically on (left, right) — same rule as the operator, so the
merge SEQUENCES must match exactly, not just the final vocab.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from moisturizer_spark.operators.tokenizer import (
    bpe_segment,
    bpe_train,
    merge_pair_expr,
    word_freq_table,
)


def _ref_tokens(text: str) -> list[str]:
    cleaned = re.sub(r"[^a-z0-9\s]", " ", text.lower())
    return [w for w in re.split(r"\s+", cleaned) if w]


def _ref_merge(syms: list[str], left: str, right: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_bpe(texts: list[str], n_merges: int):
    freq = Counter(w for t in texts for w in _ref_tokens(t))
    vocab = {w: list(w) for w in freq}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq[w]
        if not pairs:
            break
        # max count, ties lexicographic on (left, right)
        (l, r), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, n))
        vocab = {w: _ref_merge(s, l, r) for w, s in vocab.items()}
    return merges, vocab


CORPUS = [
    "the cat sat on the mat",
    "the bat and the cat chat",
    "that hat is flat",
    "matter chatter batter",
]


def test_bpe_merge_sequence_matches_reference(spark):
    """Default path: vocab under the size gate -> driver-local loop."""
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges, vocab = bpe_train(df, n_merges=8)
    ref_merges, ref_vocab = _ref_bpe(CORPUS, n_merges=8)
    assert merges == ref_merges
    got = {r["word"]: list(r["syms"]) for r in vocab.collect()}
    assert got == ref_vocab
    vocab.unpersist()


def test_bpe_distributed_path_matches_local(spark):
    """Force the distributed loop (threshold=0): identical merge
    sequence and final vocab as the size-gated local solve."""
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges, vocab = bpe_train(df, n_merges=6, local_vocab_threshold=0)
    ref_merges, ref_vocab = _ref_bpe(CORPUS, n_merges=6)
    assert merges == ref_merges
    got = {r["word"]: list(r["syms"]) for r in vocab.collect()}
    assert got == ref_vocab
    vocab.unpersist()


def test_merge_pair_expr_greedy_non_overlapping(spark):
    # "aaaa" with merge (a,a) -> ["aa","aa"], NOT ["aa","a","a"] or
    # ["aaa","a"]: after a merge the pair scanner advances past it.
    df = spark.createDataFrame([(["a", "a", "a", "a", "b"],)], "syms array<string>")
    out = df.select(merge_pair_expr(F.col("syms"), "a", "a").alias("m")).first()["m"]
    assert list(out) == ["aa", "aa", "b"]
    # pending tail is flushed
    df2 = spark.createDataFrame([(["x", "a", "a", "x"],)], "syms array<string>")
    out2 = df2.select(merge_pair_expr(F.col("syms"), "a", "a").alias("m")).first()["m"]
    assert list(out2) == ["x", "aa", "x"]


def test_word_freq_table_weights_pairs(spark):
    df = spark.createDataFrame([("dog dog dog cat",)], "text string")
    wf = {r["word"]: r["freq"] for r in word_freq_table(df).collect()}
    assert wf == {"dog": 3, "cat": 1}


def test_bpe_segment_applies_merges_in_rank_order(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges, vocab = bpe_train(df, n_merges=5)
    seg = bpe_segment(df, merges)
    got = {r["word"]: list(r["bpe_syms"]) for r in seg.collect()}
    ref = {r["word"]: list(r["syms"]) for r in vocab.collect()}
    assert got == ref  # segmenting the training corpus == trained vocab
    vocab.unpersist()
