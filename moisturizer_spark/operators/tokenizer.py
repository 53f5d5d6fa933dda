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

from pyspark.sql import Column, DataFrame, Window, functions as F

from moisturizer_spark.operators.textan import tokens_col

__all__ = [
    "word_freq_table",
    "merge_pair_expr",
    "bpe_train",
    "bpe_segment",
    "viterbi_expr",
    "unigram_train",
    "unigram_segment",
]


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


# -- unigram language-model tokenizer (SentencePiece-style) -------------------
#
# Kudo 2018 ("Subword Regularization", the SentencePiece unigram model),
# in its deterministic HARD-EM (Viterbi-EM) form: the E-step segments
# every word with the 1-best Viterbi parse under the current piece
# costs instead of accumulating forward-backward expectations, and
# pruning keeps the top pieces by Viterbi count instead of ranking by
# likelihood loss. Stated simplifications — they trade a little
# likelihood for exact integer reproducibility: every quantity below is
# either a BIGINT count or a nano-bit integer cost
# round(1e9·log2((total+V)/(cnt+1))) (add-1 smoothing over a FIXED
# vocab membership per round), so Spark, DuckDB, and the pure-Python
# replay produce byte-identical vocabularies and segmentations.
#
# Scale shape mirrors BPE above: one corpus-sized word-frequency pass,
# then every EM round touches only the vocabulary table. The Viterbi
# DP is a per-row JVM ``aggregate`` fold over word positions (costs
# supplied as a one-row broadcast map) — the E-step adds NO shuffle;
# the M-step is one vocabulary-sized combinable count. Words longer
# than ``max_word_len`` are EXCLUDED from training (a stated modeling
# bound that also bounds the oracle's position-unrolled CTE chain);
# single-character pieces are always retained, so every training word
# has a parse.

_UNI_SEP = "\x1f"  # path separator: below any alphanumeric codepoint


def viterbi_expr(word_col: Column, cost_map: Column, max_piece_len: int) -> Column:
    """1-best Viterbi parse of ``word_col`` under ``cost_map``
    (piece → nano-bit cost) as a pure column expression: an
    ``aggregate`` fold over positions 1..len, each position folding its
    ≤ ``max_piece_len`` back-candidates to the minimum
    ``(cost, n_pieces, path)`` triple — the tie order that makes the
    parse unique and engine-independent (path strings compare bytewise
    in Spark, DuckDB, and Python alike; the 0x1f separator sorts below
    every alphanumeric so piece boundaries can't alias).

    Returns a struct ``(c BIGINT, k INT, p STRING)``: total cost,
    piece count, and the 0x1f-joined piece path. A position no vocab
    piece can end at (an unseen character — impossible for training
    words, possible for :func:`unigram_segment` on new text) yields the
    2^62 cost sentinel; downstream sums stay far inside int64 because
    the sentinel is only ever carried, never re-added."""
    n = F.length(word_col)
    init = F.array(
        F.struct(
            F.lit(0).cast("bigint").alias("c"),
            F.lit(0).cast("int").alias("k"),
            F.lit("").alias("p"),
        )
    )
    sentinel = F.struct(
        F.lit(2**62).cast("bigint").alias("c"),
        F.lit(0).cast("int").alias("k"),
        F.lit("").alias("p"),
    )

    def pos_step(acc, i):
        def cand_step(best, k):
            piece = F.substring(word_col, (i - k + F.lit(1)).cast("int"), k.cast("int"))
            prev = F.element_at(acc, (i - k + F.lit(1)).cast("int"))
            c = F.element_at(cost_map, piece)
            cand_c = prev["c"] + c
            cand_k = prev["k"] + F.lit(1).cast("int")
            cand_p = F.when(prev["p"] == "", piece).otherwise(
                F.concat(prev["p"], F.lit(_UNI_SEP), piece)
            )
            better = c.isNotNull() & (
                (cand_c < best["c"])
                | ((cand_c == best["c"]) & (cand_k < best["k"]))
                | (
                    (cand_c == best["c"])
                    & (cand_k == best["k"])
                    & (cand_p < best["p"])
                )
            )
            return F.when(
                better,
                F.struct(
                    cand_c.alias("c"), cand_k.alias("k"), cand_p.alias("p")
                ),
            ).otherwise(best)

        best = F.aggregate(
            F.sequence(F.lit(1), F.least(F.lit(max_piece_len), i)),
            sentinel,
            cand_step,
        )
        return F.concat(acc, F.array(best))

    states = F.aggregate(F.sequence(F.lit(1), n), init, pos_step)
    return F.element_at(states, (n + F.lit(1)).cast("int"))


def _uni_cost_col(cnt: Column, total: Column, v: Column) -> Column:
    """Add-1-smoothed nano-bit piece cost:
    ``round(1e9 · log2((total + V) / (cnt + 1)))`` — always ≥ 0 (the
    ratio is ≥ 1 because ``total`` sums the member counts), so HALF_UP
    (Spark), half-away (DuckDB), and ``floor(x+0.5)`` (the Python
    replay) agree."""
    ratio = (total + v).cast("double") / (cnt + F.lit(1)).cast("double")
    return F.round(F.log2(ratio) * F.lit(1e9)).cast("bigint")


def _uni_seed(wf: DataFrame, max_piece_len: int, seed_multi: int) -> DataFrame:
    """Seed vocabulary: every substring of every training word up to
    ``max_piece_len`` chars, counted with positional multiplicity and
    weighted by word frequency; ALL single characters are kept (the
    coverage guarantee) plus the top ``seed_multi`` multi-character
    substrings by (count DESC, piece ASC). Output: (piece, cnt)."""
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda s: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(
                        F.lit(max_piece_len), F.length("word") - s + F.lit(1)
                    ),
                ),
                lambda k: F.substring(
                    F.col("word"), s.cast("int"), k.cast("int")
                ),
            ),
        )
    )
    counts = (
        wf.select(F.explode(subs).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
    )
    chars = counts.filter(F.length("piece") == 1)
    multi = (
        counts.filter(F.length("piece") >= 2)
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.orderBy(F.col("cnt").desc(), F.col("piece"))
            ),
        )
        .filter(F.col("_rn") <= seed_multi)
        .drop("_rn")
    )
    return chars.unionByName(multi)


def _uni_costs(vocab_counts: DataFrame) -> DataFrame:
    """(piece, cnt) → (piece, cost) under the round's own total/V —
    one single-row aggregate broadcast back over the vocab frame."""
    tot = vocab_counts.agg(
        F.sum("cnt").cast("bigint").alias("_t"),
        F.count(F.lit(1)).cast("bigint").alias("_v"),
    )
    return vocab_counts.crossJoin(F.broadcast(tot)).select(
        "piece",
        _uni_cost_col(F.col("cnt"), F.col("_t"), F.col("_v")).alias("cost"),
    )


def _uni_segment_frame(
    wf: DataFrame, costs: DataFrame, max_piece_len: int
) -> DataFrame:
    """E-step: Viterbi-parse every training word under ``costs``.
    The cost table collapses to a one-row map and broadcasts; the fold
    itself is map-side. Output: (word, freq, k, pth)."""
    cmap = costs.agg(
        F.map_from_entries(
            F.collect_list(F.struct("piece", "cost"))
        ).alias("_m")
    )
    vit = viterbi_expr(F.col("word"), F.col("_m"), max_piece_len)
    # fold once per row, then project the struct fields — referencing
    # the expression twice would evaluate the whole DP twice per word
    return (
        wf.crossJoin(F.broadcast(cmap))
        .select("word", "freq", vit.alias("_v"))
        .select(
            "word",
            "freq",
            F.col("_v.c").alias("c"),
            F.col("_v.k").alias("k"),
            F.col("_v.p").alias("pth"),
        )
    )


def _uni_mstep(seg: DataFrame, members: DataFrame) -> DataFrame:
    """M-step: Viterbi piece counts (freq-weighted), carried over the
    FIXED vocab membership — unused members keep cnt 0 so the add-1
    smoothing keeps them parseable next round. Output: (piece, cnt)."""
    used = (
        seg.select(
            F.explode(F.split("pth", _UNI_SEP)).alias("piece"), "freq"
        )
        .groupBy("piece")
        .agg(F.sum("freq").cast("bigint").alias("_used"))
    )
    return members.select("piece").join(used, "piece", "left").select(
        "piece", F.coalesce(F.col("_used"), F.lit(0)).cast("bigint").alias("cnt")
    )


def unigram_train(
    df: DataFrame,
    vocab_multi: int = 48,
    em_rounds: int = 2,
    max_piece_len: int = 4,
    max_word_len: int = 10,
    seed_multi: int = 80,
    text_col: str = "text",
    local_vocab_threshold: int = 100_000,
) -> tuple[DataFrame, DataFrame]:
    """Train the unigram-LM tokenizer. Returns ``(pieces, seg)``:

    - ``pieces``: (piece, piece_len, cnt, cost_nano) — the final
      vocabulary (all single chars + top ``vocab_multi`` multi-char
      pieces by last-EM count), its FINAL-pass Viterbi counts, and the
      nano-bit costs the final pass used;
    - ``seg``: (word, freq, n_pieces, cost_nano) — the final
      segmentation of the training words (fertility numerators) with
      each word's total Viterbi cost in nano-bits (the unigram-LM
      information content — the quality-scoring hook).

    Size-gated execution exactly like :func:`bpe_train`: a word table
    under ``local_vocab_threshold`` rows collects once and the whole
    EM runs on the driver in pure Python (the replay algorithm —
    tests pin both paths equal); above the gate every round is one
    map-side Viterbi fold plus one vocabulary-sized count shuffle,
    with the counts frame materialized per round so round ``i`` never
    re-derives rounds ``1..i-1``."""
    from moisturizer_spark.operators.common import materialize

    spark = df.sparkSession
    wf = materialize(
        word_freq_table(df, text_col)
        .filter(F.length("word") <= max_word_len)
        .select("word", "freq")
    )
    n_words = wf.count()

    if n_words <= local_vocab_threshold:
        rows = wf.collect()  # bounded by the gate above
        pieces, seg = _unigram_train_local(
            [(r["word"], r["freq"]) for r in rows],
            vocab_multi=vocab_multi,
            em_rounds=em_rounds,
            max_piece_len=max_piece_len,
            seed_multi=seed_multi,
        )
        return (
            spark.createDataFrame(
                pieces,
                "piece string, piece_len int, cnt bigint, cost_nano bigint",
            ),
            spark.createDataFrame(
                seg,
                "word string, freq bigint, n_pieces int, cost_nano bigint",
            ),
        )

    counts = materialize(_uni_seed(wf, max_piece_len, seed_multi))
    for _ in range(em_rounds):
        seg = _uni_segment_frame(wf, _uni_costs(counts), max_piece_len)
        counts = materialize(_uni_mstep(seg, counts))
    # prune: chars always survive; multi-char by (cnt DESC, piece ASC)
    chars = counts.filter(F.length("piece") == 1)
    multi = (
        counts.filter(F.length("piece") >= 2)
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.orderBy(F.col("cnt").desc(), F.col("piece"))
            ),
        )
        .filter(F.col("_rn") <= vocab_multi)
        .drop("_rn")
    )
    pruned = materialize(chars.unionByName(multi))
    final_costs = materialize(_uni_costs(pruned))
    final_seg = materialize(
        _uni_segment_frame(wf, final_costs, max_piece_len)
    )
    final_counts = _uni_mstep(final_seg, pruned)
    pieces = (
        final_counts.join(final_costs, "piece")
        .select(
            "piece",
            F.length("piece").cast("int").alias("piece_len"),
            "cnt",
            F.col("cost").alias("cost_nano"),
        )
    )
    seg_out = final_seg.select(
        "word",
        "freq",
        F.col("k").cast("int").alias("n_pieces"),
        F.col("c").cast("bigint").alias("cost_nano"),
    )
    return pieces, seg_out


def unigram_segment(
    df: DataFrame,
    pieces: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    out_col: str = "uni_pieces",
) -> DataFrame:
    """Apply a learned unigram vocabulary to new text: per word, the
    same Viterbi fold under the stored costs. Map-side at any corpus
    size (one-row broadcast cost map). Words containing characters the
    vocabulary lacks have NO parse: they return an EMPTY piece array
    and carry a cost ≥ the 2^62 sentinel in ``<out_col>_cost`` —
    filter on the cost (or on ``size(out_col) == 0``) before consuming
    the pieces."""
    cmap = pieces.select("piece", F.col("cost_nano").alias("cost")).agg(
        F.map_from_entries(
            F.collect_list(F.struct("piece", "cost"))
        ).alias("_m")
    )
    words = df.withColumn("_w", F.explode(tokens_col(F.col(text_col))))
    vit = viterbi_expr(F.col("_w"), F.col("_m"), max_piece_len)
    return (
        words.crossJoin(F.broadcast(cmap))
        .select(*df.columns, "_w", vit.alias("_v"))
        .select(
            *df.columns,
            F.col("_w").alias("word"),
            # an unparseable word's path is the sentinel's empty string;
            # split('') would yield [''] — a phantom piece — so emit a
            # truly EMPTY array instead
            F.when(
                F.col("_v.c") < F.lit(2**62),
                F.split(F.col("_v.p"), _UNI_SEP),
            )
            .otherwise(F.array().cast("array<string>"))
            .alias(out_col),
            F.col("_v.c").alias(f"{out_col}_cost"),
        )
    )


# -- pure-Python replay (also the size-gated driver path) ----------------------


def _uni_cost_local(cnt: int, total: int, v: int) -> int:
    import math

    return int(math.floor(1e9 * math.log2((total + v) / (cnt + 1)) + 0.5))


def _viterbi_local(
    word: str, cost: dict, max_piece_len: int
) -> tuple[int, int, str]:
    """Driver-side mirror of :func:`viterbi_expr` — identical
    (cost, n_pieces, path) minimization and tie order."""
    best = [(0, 0, "")]
    for i in range(1, len(word) + 1):
        b = (2**62, 0, "")
        for k in range(1, min(max_piece_len, i) + 1):
            piece = word[i - k : i]
            c = cost.get(piece)
            if c is None:
                continue
            prev = best[i - k]
            path = piece if prev[2] == "" else prev[2] + _UNI_SEP + piece
            cand = (prev[0] + c, prev[1] + 1, path)
            if cand < b:
                b = cand
        best.append(b)
    return best[len(word)]


def _unigram_train_local(
    word_freqs: list,
    vocab_multi: int,
    em_rounds: int,
    max_piece_len: int,
    seed_multi: int,
) -> tuple[list, list]:
    """The whole trainer on the driver (words already length-capped by
    the caller). Returns (pieces_rows, seg_rows) matching
    :func:`unigram_train`'s distributed output exactly."""
    # seed counts with positional multiplicity
    seed: dict[str, int] = {}
    for w, f in word_freqs:
        for s in range(len(w)):
            for k in range(1, min(max_piece_len, len(w) - s) + 1):
                p = w[s : s + k]
                seed[p] = seed.get(p, 0) + f
    chars = {p: c for p, c in seed.items() if len(p) == 1}
    multis = sorted(
        ((p, c) for p, c in seed.items() if len(p) >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )[:seed_multi]
    counts = dict(chars)
    counts.update(dict(multis))

    def costs_of(cnts: dict) -> dict:
        total, v = sum(cnts.values()), len(cnts)
        return {p: _uni_cost_local(c, total, v) for p, c in cnts.items()}

    def e_then_m(cnts: dict) -> tuple[dict, dict]:
        cost = costs_of(cnts)
        seg = {}
        used: dict[str, int] = {}
        for w, f in word_freqs:
            c, k, pth = _viterbi_local(w, cost, max_piece_len)
            seg[w] = (f, k, c)
            for p in pth.split(_UNI_SEP):
                used[p] = used.get(p, 0) + f
        return {p: used.get(p, 0) for p in cnts}, seg

    for _ in range(em_rounds):
        counts, _ = e_then_m(counts)
    pruned = {p: c for p, c in counts.items() if len(p) == 1}
    top = sorted(
        ((p, c) for p, c in counts.items() if len(p) >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )[:vocab_multi]
    pruned.update(dict(top))
    final_cost = costs_of(pruned)
    final_counts, seg = e_then_m(pruned)
    pieces_rows = [
        (p, len(p), final_counts[p], final_cost[p]) for p in sorted(pruned)
    ]
    seg_rows = [(w, f, k, c) for w, (f, k, c) in sorted(seg.items())]
    return pieces_rows, seg_rows
