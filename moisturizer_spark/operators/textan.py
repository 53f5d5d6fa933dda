"""Text analysis operators: tokens, quality features, language ID.

All pure column expressions (split / regexp / length / array functions) —
whole-stage-codegen-friendly, no UDFs, linear scans with no shuffle until
the caller aggregates. The expressions are deliberately reproducible in
ANSI SQL so the DuckDB oracle can verify them bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from moisturizer_spark.operators.common import materialize

# A small multilingual stopword table for quality scoring / language ID.
# Deliberately tiny + hardcoded: it is a *feature dictionary*, broadcast to
# executors inside the plan as a literal array, not a data dependency.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "mit"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "de", "du", "pour"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "de", "del", "para"),
}


def tokens_col(text: Column) -> Column:
    """Lowercased alphanumeric tokenization.

    One regex pass: splitting directly on non-alphanumeric runs is
    token-for-token identical to the two-pass strip-then-split form
    (replace ``[^a-z0-9\\s]``→space, split ``\\s+``) — verified equal on
    the harness corpus — and measured 1.7× faster, which matters because
    this expression sits under ~25 document queries. ``filter(x -> x !=
    '')`` guards empty strings from leading/trailing separators so token
    counts match ``len(text.split())`` semantics. The DuckDB oracle
    rendering (``_SQL_TOKS`` in workload.py) keeps the two-pass form;
    both produce the same token arrays by construction.
    """
    return F.filter(
        F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != ""
    )


# GPT-2-style pre-tokenizer regex, restricted to the feature subset Java
# regex and RE2 (DuckDB) match identically: leftmost-first alternation of
# contraction suffixes, space-prefixed letter runs, digit runs, and
# punctuation runs. No lookahead (RE2 has none) and no \p classes (the
# engines' Unicode tables differ); applied to lowercased text.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+"


def bpe_tokens_col(text: Column) -> Column:
    """BPE-ish subword pre-tokenization (the GPT-2 split, sans merges).

    Token *count* under this split is the standard proxy for LLM token
    budgets when the real tokenizer isn't available: contractions,
    space-glued words, digit runs, and punctuation runs each count once.
    Pure ``regexp_extract_all`` — JVM-side, no UDF.
    """
    return F.regexp_extract_all(F.lower(text), F.lit(BPE_PATTERN), 0)


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token statistics: n_tokens, n_unique, avg token length."""
    toks = tokens_col(F.col(text_col))
    return df.withColumns(
        {
            "n_tokens": F.size(toks),
            "n_unique_tokens": F.size(F.array_distinct(toks)),
            "avg_token_len": F.when(
                F.size(toks) > 0,
                F.aggregate(
                    toks, F.lit(0), lambda acc, t: acc + F.length(t)
                ).cast("double")
                / F.size(toks),
            ).otherwise(F.lit(None).cast("double")),
        }
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document-quality features (the C4/Gopher-style basics):

    - ``punct_ratio``: punctuation chars / total chars
    - ``digit_ratio``: digit chars / total chars
    - ``stopword_ratio``: english-stopword tokens / tokens
    - ``dup_token_ratio``: 1 - unique/total tokens (repetitiveness)
    """
    text = F.col(text_col)
    total = F.length(text).cast("double")
    toks = tokens_col(text)
    n_toks = F.size(toks)
    stop = F.array([F.lit(s) for s in STOPWORDS["en"]])
    return df.withColumns(
        {
            "punct_ratio": F.when(
                total > 0,
                (total - F.length(F.regexp_replace(text, r"[^\w\s]", ""))) / total,
            ).otherwise(0.0),
            "digit_ratio": F.when(
                total > 0,
                (total - F.length(F.regexp_replace(text, r"[0-9]", ""))) / total,
            ).otherwise(0.0),
            "stopword_ratio": F.when(
                n_toks > 0,
                F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast("double")
                / n_toks,
            ).otherwise(0.0),
            "dup_token_ratio": F.when(
                n_toks > 0,
                1.0 - F.size(F.array_distinct(toks)).cast("double") / n_toks,
            ).otherwise(0.0),
        }
    )


def repetition_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition diagnostics (the Gopher repetition-rule
    family, adapted to newline-free corpora): how much of a document is
    the same thing said again.

    Output columns (all exact integers, so downstream ratios are
    bit-reproducible across engines as a single final division):

    - ``n_tokens``           total word tokens
    - ``top_bigram_n``       occurrences of the document's most frequent
                             word bigram (0 when < 2 tokens)
    - ``tri_total`` / ``tri_distinct``  trigram occurrence vs distinct
                             counts — ``1 - distinct/total`` is the
                             duplicate-trigram fraction

    Scale shape: the ENTIRE feature set is per-row JVM array expressions
    — zero shuffle, zero join. The top-bigram count is the maximum run
    length over the document's SORTED bigram array (equal grams are
    adjacent after array_sort, so the most frequent gram's count is the
    longest run): O(g log g) per row, embarrassingly parallel, and
    measured faster than the explode → two-phase hash aggregate → rejoin
    formulation it replaces even at test scale. Monster documents cost
    their own row's time only — no shuffle skew to manage.
    """
    # grams are projected once each: tri feeds BOTH tri_total and
    # tri_distinct, and CollapseProject preserves a multiply-referenced
    # non-cheap alias — inlining would tokenize + gram the text twice
    pre = df.select(
        F.col(id_col),
        *[c for c in df.columns if c != id_col and c != text_col],
        F.size(tokens_col(F.col(text_col))).alias("n_tokens"),
        word_ngrams(F.col(text_col), 3).alias("_tri"),
        word_ngrams(F.col(text_col), 2).alias("_bi"),
    )
    # max run length over the sorted gram array = top gram's count;
    # empty array → 0 ("no bigram occurs")
    top_run = F.expr(
        """
        aggregate(
          array_sort(_bi),
          struct(CAST('' AS STRING) AS prev, 0 AS run, 0 AS best),
          (acc, x) -> CASE WHEN x = acc.prev
              THEN struct(x AS prev, acc.run + 1 AS run,
                          greatest(acc.best, acc.run + 1) AS best)
              ELSE struct(x AS prev, 1 AS run,
                          greatest(acc.best, 1) AS best) END,
          acc -> acc.best)
        """
    )
    return pre.select(
        *[c for c in pre.columns if c not in ("_tri", "_bi")],
        F.size("_tri").alias("tri_total"),
        F.size(F.array_distinct("_tri")).alias("tri_distinct"),
        top_run.alias("top_bigram_n"),
    )


def word_ngrams(text: Column, n: int) -> Column:
    """Word n-grams of a text column as an array of space-joined strings.

    Built entirely from JVM array functions (tokenize → sequence →
    slice → join); returns an empty array for texts shorter than ``n``
    tokens — the ``when`` guard matters because ``sequence(1, 0)``
    counts DOWN in Spark and would emit phantom grams.
    """
    # Bind the token array as a lambda variable (single-element array →
    # transform → [0]): expressions captured inside HOF lambdas are
    # re-evaluated PER ELEMENT, so referencing the raw tokenization from
    # the per-gram lambda would re-run regex+split+filter once per gram —
    # O(tokens²) work per row (measured 25× slowdown on the bench corpus).
    def per_tokens(w):
        grams = F.transform(
            F.sequence(F.lit(1), F.size(w) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        )
        return F.when(F.size(w) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )

    return F.element_at(F.transform(F.array(tokens_col(text)), per_tokens), 1)


def chunk_sliding(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 32,
) -> DataFrame:
    """Sliding-window chunking: split each document into overlapping
    ``chunk_tokens``-token windows every ``stride`` tokens — the RAG /
    retrieval-ingestion primitive (overlap keeps answers that straddle a
    boundary findable).

    Returns one row per chunk: (id, chunk_id, chunk_start, chunk_len,
    chunk_text). The final window is the remainder (shorter than
    ``chunk_tokens``); windows starting at or past the token count are
    not emitted, and an empty document yields no chunks. Pure JVM array
    expressions (tokenize once, slice per window) + ``posexplode`` — a
    linear scan with no shuffle; downstream embedding/indexing stages
    consume the exploded rows in whatever partitioning they need.
    """
    toks = tokens_col(F.col(text_col))
    # Bind toks once via the single-element-array trick (see word_ngrams:
    # HOF lambdas re-evaluate captured projections per element).
    bound = df.select(
        F.col(id_col),
        F.explode_outer(
            F.element_at(
                F.transform(
                    F.array(toks),
                    lambda w: F.transform(
                        F.when(
                            F.size(w) > 0,
                            F.sequence(F.lit(0), F.size(w) - 1, F.lit(stride)),
                        ).otherwise(F.array().cast("array<int>")),
                        lambda s: F.struct(
                            s.alias("start"),
                            F.array_join(F.slice(w, s + 1, chunk_tokens), " ").alias(
                                "txt"
                            ),
                            F.least(F.size(w) - s, F.lit(chunk_tokens)).alias("len"),
                        ),
                    ),
                ),
                1,
            )
        ).alias("_c"),
    ).filter(F.col("_c").isNotNull())
    return bound.select(
        id_col,
        (F.col("_c.start") / stride).cast("bigint").alias("chunk_id"),
        F.col("_c.start").cast("bigint").alias("chunk_start"),
        F.col("_c.len").cast("bigint").alias("chunk_len"),
        F.col("_c.txt").alias("chunk_text"),
    )


# PII patterns restricted to the regex subset Java and RE2 (DuckDB) treat
# identically: no lookaround, no \b against unicode classes. Deliberately
# simple — a *scanner*, not a validator; precision/recall trade-offs are
# the caller's via replacement.
PII_PATTERNS = {
    # Order matters for redaction: specific before general, or the broad
    # phone pattern would consume SSN-shaped digit runs first.
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "ipv4": r"([0-9]{1,3}\.){3}[0-9]{1,3}",
    "ssn_like": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "phone": r"\+?[0-9][0-9()\-. ]{7,}[0-9]",
}


def pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row PII hit counts: one ``n_<kind>`` column per pattern.
    JVM ``regexp_extract_all`` — linear scan, no UDF."""
    return df.withColumns(
        {
            f"n_{kind}": F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)
            )
            for kind, pat in PII_PATTERNS.items()
        }
    )


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str | None = None) -> DataFrame:
    """Replace every PII match with ``[<KIND>]`` markers, in pattern
    order. Chained JVM ``regexp_replace`` — stays in whole-stage
    codegen."""
    out = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"[{kind.upper()}]")
    return df.withColumn(out_col or text_col, out)


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_shared: int = 1,
) -> DataFrame:
    """Benchmark decontamination: find training documents that share at
    least ``min_shared`` distinct word ``n``-grams with an evaluation
    corpus — the contamination check every serious LLM training pipeline
    runs before a benchmark score means anything (the GPT-3 paper used
    13-grams; pick ``n`` per tokenizer granularity).

    Returns (id, n_shared) per contaminated training document.

    Scale shape: both sides project to (md5(gram)) — 32-byte fixed keys,
    never text. The eval side (a benchmark suite) is tiny relative to the
    corpus, so Spark broadcasts its distinct gram set and the probe over
    100 TB of training grams is a map-side hash lookup. Deliberately NO
    pre-join distinct on the train side — that would shuffle every corpus
    gram; instead duplicates are collapsed by count_distinct AFTER the
    probe, so the only shuffle carries hit rows (rare by construction).
    md5 (not xxhash64) so the DuckDB oracle reproduces the join keys
    bit-for-bit; the 2^-64 collision regime is identical on both engines.
    """
    def grams(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.col(id_col).alias("_id"),
                F.explode_outer(word_ngrams(F.col(text_col), n)).alias("gram"),
            )
            .filter(F.col("gram").isNotNull())  # null-check the raw gram, not md5(gram)
            .select("_id", F.md5("gram").alias("gh"))
        )

    ev = grams(eval_df).select("gh").distinct()
    return (
        grams(train)
        .join(F.broadcast(ev), "gh")
        .groupBy(F.col("_id").alias(id_col))
        .agg(F.count_distinct(F.col("gh")).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def containment_scores(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_containment: float = 0.5,
) -> DataFrame:
    """Per-pair n-gram *containment* against an evaluation corpus: for
    every (training doc, eval doc) pair sharing at least one word
    ``n``-gram, the fraction of the eval doc's distinct grams found in
    the training doc — ``|G(e) ∩ G(t)| / |G(e)|``.

    Containment (not Jaccard) is the right contamination metric when the
    eval item is much shorter than the training document: a benchmark
    question fully embedded in a long web page has Jaccard ≈ 0 but
    containment = 1. This refines :func:`decontaminate` (which only
    counts shared grams corpus-wide) into attribution — WHICH benchmark
    item leaked, and how completely.

    Returns (train_id, eval_id, n_shared, containment) with containment
    rounded to 6 digits (cross-engine float stability) and thresholded
    at ``min_containment``.

    Scale shape: the eval side is a benchmark suite — thousands of rows
    against a 100 TB corpus — so its (eval_id, gram-hash) pairs AND its
    per-item gram counts both broadcast; the corpus side streams its
    grams through a map-side hash probe, and the only shuffle carries
    hit pairs (rare by construction) keyed by the (train, eval) pair.
    Keys are md5(gram): fixed 32-byte width, oracle-reproducible.
    """
    def grams(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.select(
                F.col(id_col).alias(tag),
                F.explode_outer(word_ngrams(F.col(text_col), n)).alias("gram"),
            )
            .filter(F.col("gram").isNotNull())
            .select(tag, F.md5("gram").alias("gh"))
        )

    ev = grams(eval_df, "eval_id").distinct()
    ev_sizes = ev.groupBy("eval_id").agg(
        F.count(F.lit(1)).alias("_ev_grams")
    )
    return (
        grams(train, "train_id")
        .join(F.broadcast(ev), "gh")
        .groupBy("train_id", "eval_id")
        .agg(F.count_distinct("gh").alias("n_shared"))
        .join(F.broadcast(ev_sizes), "eval_id")
        .select(
            "train_id",
            "eval_id",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double") / F.col("_ev_grams"), 6
            ).alias("containment"),
        )
        .filter(F.col("containment") >= min_containment)
    )


def default_quality_rules(
    text_col: str = "text", n_chars_col: str = "n_chars"
) -> list[tuple[str, Column]]:
    """The calibrated C4/Gopher-style rule cascade shared by the quality
    funnel and the curation pipeline (kept in ONE place so their driver
    checks can never drift): min length → min words → mean token length
    → repetitiveness → badwords (the C4 "bad words" stage, density
    semantics — see :mod:`moisturizer_spark.operators.blocklist`; last
    in the cascade so the cheap structural gates attribute first). All
    thresholds are integer-exact (ratio tests multiplied through) so
    any engine buckets identically."""
    from moisturizer_spark.operators.blocklist import badwords_rule

    text = F.col(text_col)
    toks = tokens_col(text)
    n_words = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    alnum = F.length(F.regexp_replace(F.lower(text), r"[^a-z0-9]", ""))
    return [
        ("min_chars", F.col(n_chars_col) >= 100),
        ("min_words", n_words >= 20),
        ("mean_word_len", alnum <= 5 * n_words),
        ("repetition", 5 * n_uniq >= 2 * n_words),
        badwords_rule(toks),
    ]


def cascade_filter_stats(
    df: DataFrame,
    rules: list[tuple[str, Column]],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quality-filter funnel: evaluate an ordered rule cascade (C4 /
    Gopher style) and report, per group, how many documents each rule
    removed — attributing every document to the FIRST rule it fails,
    exactly like a short-circuiting filter pipeline would.

    ``rules`` is an ordered list of (rule_name, keep_condition). Output
    is one row per (group, stage) with stage ∈ rule names + 'kept',
    n_docs, and the stage ordinal — the numbers a pipeline owner reads
    to see which filter is doing the work before committing to a full
    100 TB run.

    Scale: the cascade is a single CASE-WHEN projection (zero shuffles,
    whole-stage codegen); the only shuffle aggregates (group, stage)
    pairs — cardinality = groups × (rules + 1), trivially small.
    """
    first_fail = F.coalesce(
        *[F.when(~cond, F.lit(name)) for name, cond in rules],
        F.lit("kept"),
    )
    ordinal = {name: i for i, (name, _) in enumerate(rules)}
    ordinal["kept"] = len(rules)
    stage_ord = F.coalesce(
        *[
            F.when(F.col("stage") == F.lit(k), F.lit(v))
            for k, v in ordinal.items()
        ]
    )
    gcols = group_cols or []
    return (
        df.withColumn("stage", first_fail)
        .groupBy(*gcols, "stage")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("stage_idx", stage_ord.cast("int"))
    )


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
    out_col: str = "fingerprints",
    det: bool = False,
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS algorithm): hash every
    k-gram, then keep the minimum hash of each ``window`` consecutive
    hashes — guaranteeing any shared substring of length ≥ k+window-1
    contributes at least one common fingerprint between two documents.

    Pure SQL higher-order functions over the normalized text — linear
    scan, no shuffle, no Python per row. Output is the distinct
    fingerprint array per document; near-dup detection is then an
    explode + inverted-index self-join on fingerprint values, exactly
    like the shingle pipeline but with O(len/window) postings per doc
    instead of O(len).

    The normalized text and the k-gram hash array are bound as lambda
    variables (``transform(array(x), v -> ...)[0]``) rather than as
    separate projections: CollapseProject would inline a projection
    alias into every use site inside the window lambda, re-evaluating
    the O(n) hash array once per window — O(n^2·k) per document
    (measured 85s for 100 ×280-char docs; 0.2s with the binding).
    Lambda variables are evaluated exactly once.

    ``det=True`` swaps the k-gram hash to the md5-derived 60-bit
    family: window minima and distinct-set semantics are value-based
    integers, so an oracle replays the fingerprint sets exactly.
    """
    normalized = (
        f"trim(regexp_replace(lower({text_col}), '\\\\s+', ' '))"
    )
    gram_hash = (
        "cast(conv(substring(md5(concat('v:', substring(t, i, {k}))), 1, 15),"
        " 16, 10) as bigint)"
        if det
        else "xxhash64(substring(t, i, {k}))"
    ).format(k=k)
    hashes = (
        f"transform(sequence(1, greatest(length(t) - {k - 1}, 1)), "
        f"i -> {gram_hash})"
    )
    mins = (
        f"array_distinct(transform("
        f"sequence(1, greatest(size(h) - {window - 1}, 1)), "
        f"j -> array_min(slice(h, j, {window}))))"
    )
    fingerprint = (
        f"transform(array({normalized}), t -> "
        f"transform(array({hashes}), h -> {mins})[0])[0]"
    )
    return df.withColumn(out_col, F.expr(fingerprint))


def winnowing_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
    min_common: int = 10,
    max_df: int | None = None,
    det: bool = False,
) -> DataFrame:
    """Near-dup pairs by shared winnowing fingerprints (id_a < id_b,
    n_common ≥ min_common). The inverted-index join shuffles (hash, id)
    pairs — O(len/window) per document, never the text.

    ``max_df`` drops fingerprints appearing in more than that many
    documents before the self-join. At corpus scale a handful of
    stop-fingerprints (boilerplate, common phrases) would otherwise
    dominate the join: a posting list of length m contributes m^2 pair
    rows, so capping document frequency bounds the worst bucket at
    max_df^2 while near-identical pairs (which share many *rare*
    fingerprints) still surface. Slightly undercounts n_common; keep
    None for exact small-corpus semantics."""
    fp = winnowing_fingerprints(
        df.select(id_col, text_col), text_col, k, window, det=det
    )
    # explode_outer, not explode: InferFiltersFromGenerate only fires for
    # inner generates, and its size()/isnotnull() filter re-evaluates the
    # whole fingerprint expression 2 extra times per row. The array is
    # never empty (greatest(.., 1) floor), so the semantics are identical.
    inv = materialize(
        fp.select(F.col(id_col).alias("_id"), F.explode_outer("fingerprints").alias("fp"))
    )
    if max_df is not None:
        keep = inv.groupBy("fp").agg(F.count(F.lit(1)).alias("_df")).filter(
            F.col("_df") <= max_df
        )
        inv = inv.join(keep.select("fp"), on="fp")
    return (
        inv.alias("a")
        .join(inv.alias("b"), on="fp")
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-voting language ID across {en, de, fr, es}; 'other' if no hit.

    Score per language = count of that language's stopwords among the
    document's tokens; argmax with deterministic (score desc, lang asc)
    tie-break. A real pipeline would use fastText — this is the built-in,
    dependency-free heuristic, and it is fully expressible in SQL for the
    oracle.
    """
    # tokenize ONCE into a real column: the 4 per-language scores each
    # reference the array, and CollapseProject keeps a multiply-referenced
    # non-cheap alias as its own projection — inlining `tokens_col` here
    # would re-run the regexp split once per language per row
    df = df.withColumn("_lid_toks", tokens_col(F.col(text_col)))
    toks = F.col("_lid_toks")
    scores = []
    for lang in sorted(STOPWORDS):
        stop = F.array([F.lit(s) for s in STOPWORDS[lang]])
        score = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(
        F.transform(
            F.array(*scores),
            # array_max on structs orders lexicographically by field order:
            # (score, negated-lang-rank) → max = highest score, then the
            # alphabetically-first language. Encode lang rank as negative
            # index so 'de' beats 'en' on ties, deterministically.
            lambda s: F.struct(
                s["score"].alias("score"),
                (-F.array_position(
                    F.array(*[F.lit(L) for L in sorted(STOPWORDS)]), s["lang"]
                )).alias("neg_rank"),
                s["lang"].alias("lang"),
            ),
        )
    )
    pred = F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("other"))
    return df.withColumn(out_col, pred).drop("_lid_toks")


def dup_span_stats(
    df: DataFrame,
    by_col: str = "source",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Corpus-duplicate n-gram span coverage per group — the
    exact-substring-dedup *diagnostic* (how much of each slice of the
    corpus is text that also occurs elsewhere), the measurement behind
    "deduplicating training data makes language models better"-style
    span dedup: a span is duplicated when its word ``n``-gram occurs
    more than once across the WHOLE corpus (same doc or another doc).

    Returns one row per ``by_col`` value that has at least one ``n``-gram:
    ``(by, total_spans, dup_spans, dup_span_frac)`` where the counts are
    exact integers (ratio is a single final IEEE division, so engines
    agree bit-for-bit).

    Scale plan: occurrence rows never carry document text — only
    ``(by, gram)``. Phase 1 aggregates to ``(by, gram, count)`` with
    map-side combine (the heavy reduction happens before the shuffle);
    phase 2 is a window-sum keyed on ``gram`` over the already-aggregated
    frame (rows bounded by |distinct grams| × |groups touching them|, not
    corpus token count); phase 3 reduces to |groups| rows. No join
    carries text, no all-pairs anything. At 100 TB the gram column can be
    swapped for ``xxhash64(gram)`` (8 bytes) without changing semantics —
    kept as the string here so the DuckDB oracle can reproduce it.
    """
    from pyspark.sql import Window

    g = df.select(
        F.col(by_col).alias("_by"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("_gram"),
    )
    per = g.groupBy("_by", "_gram").agg(F.count(F.lit(1)).alias("_c"))
    tot = per.withColumn(
        "_cg", F.sum("_c").over(Window.partitionBy("_gram"))
    )
    return (
        tot.groupBy("_by")
        .agg(
            F.sum("_c").cast("bigint").alias("total_spans"),
            F.sum(F.when(F.col("_cg") >= 2, F.col("_c")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("dup_spans"),
        )
        .select(
            F.col("_by").alias(by_col),
            "total_spans",
            "dup_spans",
            (F.col("dup_spans").cast("double") / F.col("total_spans").cast("double"))
            .alias("dup_span_frac"),
        )
    )


def remove_dup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    hash_grams: bool = False,
    skew_guard: bool = False,
) -> DataFrame:
    """Exact-substring span REMOVAL — the ExactSubstr step of
    "Deduplicating Training Data Makes Language Models Better" (Lee et
    al., 2022), at word n-gram granularity: every corpus-duplicated
    word ``n``-gram run survives at exactly ONE place (its first
    occurrence in ``(id, position)`` order); every other occurrence is
    removed and the documents are reassembled from their surviving
    tokens. :func:`dup_span_stats` is the measurement; this is the
    surgery. :func:`line_dedup` is the line-granularity special case.

    Semantics, precisely: an ``n``-gram occurrence at ``(doc, p)`` is
    *removable* when the same gram occurs elsewhere in the corpus AND
    this occurrence is not the globally first one. A token is removed
    when ANY removable occurrence covers it (i.e. some removable gram
    starts within the ``n`` positions ending at the token). Keep-first
    guarantees the duplicated text still exists somewhere, so no
    information leaves the corpus — only repetition.

    Returns ``(id, text, n_tokens_kept, n_tokens_removed)``; documents
    whose every token is covered (pure boilerplate) disappear, and
    documents with no tokens are dropped.

    Scale plan (all linear, nothing pairwise):

    - ONE tokenize pass builds the token array and the gram-at-position
      array together; one ``posexplode`` of their zip yields the only
      per-token frame.
    - The first-occurrence choice is one ``row_number`` window keyed on
      the gram. Positions where no gram starts (the last ``n-1`` of
      each doc) get a per-row unique sentinel key instead of landing in
      a shared NULL partition — singleton windows, no skew magnet.
      ``hash_grams=True`` is the corpus-scale path: the ranking key
      becomes ``xxhash64`` of the gram and the gram STRING is dropped
      before the shuffle, so the heavy exchange carries an 8-byte key
      per occurrence instead of ~n words of text (identical output up
      to 2^-64 hash collisions; parity is pinned by a test). The
      default keeps the string so the DuckDB oracle reproduces the
      choice bit-for-bit. A pathologically hot gram (one string
      repeated 10^8 times — at 100 TB of web text, boilerplate grams
      ARE that regime) skews this window: every occurrence of the hot
      gram lands in ONE window partition that must be sorted by one
      task. ``skew_guard=True`` is the fix: the rank window is replaced
      by a ``min(struct(id, pos))`` aggregate per gram — an aggregation
      is map-side combinable where a window is not, so the hot gram
      collapses to one row per map task before the exchange — followed
      by a gram-keyed join flagging each occurrence against its gram's
      global first; only duplicated grams (count ≥ 2) enter the winner
      table, so unique grams flag 0 via the left-join miss and the
      build side carries the duplicated fraction only. Output is
      identical (parity-pinned on a planted hot-gram corpus); the
      guard re-derives the occurrence frame for the winner branch (a
      second scan), which measures ~1.5x slower than the window at
      harness scale (2.2s vs 1.5s, sf0.1, hashed keys) — it's the
      plan for the hot-boilerplate regime, not the default.
    - Coverage is a ``max`` over a ROWS window of width ``n`` per doc —
      no self-join of token rows against span rows.
    - Reassembly is the same shuffle as the coverage window (same key,
      one exchange): ``groupBy(id)`` of ``(position, token)`` structs.
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col).alias("_id"), tokens_col(F.col(text_col)).alias("_toks")
    ).filter(F.size("_toks") > 0)
    # gram starting at 1-based position i, NULL where no full gram fits
    gram_at = F.transform(
        F.sequence(F.lit(1), F.size("_toks")),
        lambda i: F.when(
            i + F.lit(n - 1) <= F.size("_toks"),
            F.array_join(F.slice(F.col("_toks"), i, n), " "),
        ),
    )
    ex = base.select(
        "_id",
        F.posexplode(F.arrays_zip(F.col("_toks"), gram_at.alias("_grams"))).alias(
            "_pos", "_z"
        ),
    ).select(
        "_id",
        "_pos",
        F.col("_z._toks").alias("_tok"),
        F.col("_z._grams").alias("_gram"),
    )
    # tokens are [a-z0-9]+ so a NUL-prefixed key can never collide with
    # a real gram; tail positions rank alone instead of forming one
    # giant NULL partition
    gkey = F.coalesce(
        F.col("_gram"),
        F.concat_ws(":", F.lit("\x00"), F.col("_id").cast("string"),
                    F.col("_pos").cast("string")),
    )
    if hash_grams:
        gkey = F.xxhash64(gkey)
    # project the gram string away BEFORE the ranking shuffle: only the
    # key and a has-gram bit cross the wire
    keyed = ex.select(
        "_id", "_pos", "_tok",
        F.col("_gram").isNotNull().alias("_hasg"),
        gkey.alias("_gk"),
    )
    if skew_guard:
        # hot-gram-safe first-occurrence choice: min(struct) aggregates
        # combine map-side (partial rows per (gram, map task)), so no
        # reducer ever sorts a hot gram's full occurrence list; struct
        # comparison is lexicographic (_id, _pos) — the same total
        # order the rank window uses. Only DUPLICATED grams (count ≥ 2)
        # enter the winner table: a unique gram's occurrence is its own
        # first and flags 0 via the left-join miss, so the build side
        # shrinks to the duplicated-gram fraction of the vocabulary —
        # small enough that AQE picks a broadcast join at test scale,
        # removing the gram-keyed shuffle of the occurrence frame
        # entirely (at 100 TB it degrades gracefully to a shuffle join
        # with a build side that only carries duplicated grams).
        winners = (
            keyed.filter(F.col("_hasg"))
            .groupBy("_gk")
            .agg(
                F.min(
                    F.struct(F.col("_id").alias("i"), F.col("_pos").alias("p"))
                ).alias("_w"),
                F.count(F.lit(1)).alias("_wn"),
            )
            .filter(F.col("_wn") >= 2)
            .drop("_wn")
        )
        flagged = (
            keyed.join(winners, "_gk", "left")
            .withColumn(
                "_ds",
                F.when(
                    F.col("_hasg")
                    & F.col("_w").isNotNull()
                    & ~(
                        (F.col("_w.i") == F.col("_id"))
                        & (F.col("_w.p") == F.col("_pos"))
                    ),
                    1,
                ).otherwise(0),
            )
            .drop("_w")
        )
    else:
        rn = F.row_number().over(
            Window.partitionBy("_gk").orderBy("_id", "_pos")
        )
        flagged = keyed.withColumn(
            "_ds", F.when(F.col("_hasg") & (rn >= 2), 1).otherwise(0)
        )
    cover = Window.partitionBy("_id").orderBy("_pos").rowsBetween(-(n - 1), 0)
    covered = flagged.withColumn("_cov", F.max("_ds").over(cover))
    per_doc = (
        covered.groupBy("_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("_cov") == 0,
                        F.struct(F.col("_pos"), F.col("_tok")),
                    )
                )
            ).alias("_kept"),
            F.sum("_cov").cast("bigint").alias("n_tokens_removed"),
        )
        .filter(F.size("_kept") > 0)
    )
    return per_doc.select(
        F.col("_id").alias(id_col),
        F.array_join(
            F.transform(F.col("_kept"), lambda s: s["_tok"]), " "
        ).alias(text_col),
        F.size("_kept").cast("bigint").alias("n_tokens_kept"),
        "n_tokens_removed",
    )


def bigram_lm_bits(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.5,
    keep_cols: tuple = (),
    skew_guard: bool = False,
    salt: int = 8,
) -> DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al. 2020):
    train an add-``k``-smoothed word-BIGRAM language model on the
    corpus and score every document by its cross-entropy under that
    model, in bits per token —
    ``H(d) = -avg over bigrams (w1,w2) of log2 P(w2|w1)`` with
    ``P(w2|w1) = (C(w1,w2) + k) / (C(w1) + k·V)``. Low bits ≈ fluent,
    in-distribution text; high bits ≈ noise, boilerplate soup, or
    wrong-language content. CCNet proper scores against a KenLM model
    trained on Wikipedia and buckets the corpus into head/middle/tail
    by perplexity percentile — the bucketing lives in the workload
    query; this operator is the scoring engine, self-trained so the
    whole computation is reproducible from the corpus alone (an
    external LM is the same join against a different count table).

    Returns ``(id_col, *keep_cols, bits_per_token)``; documents with
    fewer than 2 tokens carry no bigrams and are excluded.

    Cross-engine determinism: ``log2`` differs from DuckDB's in the
    final ulp for ~1% of inputs, and float SUM is order-sensitive — so
    each bigram's log-probability is rounded to integer NANO-bits
    (``round(lp·1e9)``: boundary hits on an irrational log have
    measure zero) and summed as BIGINT (exact, order-insensitive); the
    per-token average is then a pure INTEGER division rounded
    half-away (see :func:`_micro_per_token`) — no float division whose
    exact-rational result could land on a rounding boundary and flip
    the last digit between engines (observed once at sf0.01 with the
    naive ``round(sum/n, 6)``). Output lands on the same 1e-6 grid.

    Scale: the corpus is scanned exactly TWICE — once to build the
    bigram count table C(w1,w2) (one map-side combinable aggregation),
    once to score. Everything else derives from the vocabulary-bounded
    C(w1,w2) itself (Zipf: ≪ corpus): the context table C(w1) is its
    per-w1 sum, and the LM vocabulary V — the distinct words
    participating in any bigram, i.e. the model's event space — is a
    distinct-count over its two word columns. The context table
    broadcasts; C(w1,w2) joins on its natural (w1,w2) key — the single
    heavy shuffle. V is a driver-side scalar (the tfidf n_docs
    pattern). At 100 TB you'd prune the LM to a top-V vocabulary with
    an OOV bucket, making C(w1,w2) broadcastable too; the join shape
    is unchanged.

    Hot-bigram skew (``skew_guard``): natural text has hot bigrams
    ("of the") that magnet one reducer of the scoring join. AQE's
    OptimizeSkewedJoin CANNOT split this particular join: the count
    table is persisted already hash-partitioned on (w1,w2), so its
    side of the join has no shuffle stage for AQE to re-plan (both
    children must be shuffle reads to split one and replicate the
    other — verified empirically in ``tests/test_textan.py``).
    ``skew_guard=True`` routes the scoring join through
    :func:`~moisturizer_spark.operators.skew.salted_join` — the probe
    side salts round-robin, the 1-row-per-key build side replicates
    ``salt``× — spreading each hot bigram over ``salt`` reducers.
    Bit-identical output (parity-pinned); costs a ``salt``× build-side
    shuffle, so flip it for hot-key corpora, not by default.
    """
    from moisturizer_spark.operators.skew import salted_join

    pairs = _bigram_pairs(df, id_col, text_col, keep_cols)
    c2, c1, vocab = _bigram_lm(pairs)
    lp = F.log2(
        (F.col("_n2") + F.lit(float(k)))
        / (F.col("_n1") + F.lit(float(k) * vocab))
    )
    scored = (
        salted_join(pairs, c2, ["_w1", "_w2"], salt=salt)
        if skew_guard
        else pairs.join(c2, ["_w1", "_w2"])
    )
    return (
        scored
        .join(F.broadcast(c1), "_w1")
        .groupBy("_id", *keep_cols)
        .agg(
            F.sum(_nano(lp)).alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        )
        # lp < 0 strictly (smoothed P < 1), so -_s is the positive sum
        .withColumn("_micro", _micro_per_token("-_s"))
        .select(
            F.col("_id").alias(id_col),
            *keep_cols,
            (F.col("_micro").cast("double") / F.lit(1e6)).alias(
                "bits_per_token"
            ),
        )
    )


def _nano(lp) -> "Column":
    """An irrational log-probability as integer nano-bits (exact to
    sum in any order, in any engine).

    Overflow bound: a smoothed bigram log2-prob is at most ~64 bits in
    magnitude (P ≥ k/(C+kV) can't go below ~2^-64 until the corpus
    exceeds ~10^19 bigrams), so each term is ≤ 6.4e10 nano-bits and the
    per-document BIGINT sum stays inside int64 up to ~1.4e8 bigrams in
    a SINGLE document — a ~500 MB single text field, 2.5× parquet's
    hard field limit, so unreachable through any supported source.
    Documents, not the corpus, bound the sum: the aggregation is per
    doc_id."""
    return F.round(lp * F.lit(1e9)).cast("bigint")


def _micro_per_token(sum_nano_sql: str, n_sql: str = "_n") -> "Column":
    """``sum_nano / (1000·n)`` rounded half-away-from-zero, in PURE
    integer arithmetic (``DIV``) — engine-exact even when the rational
    lands exactly on a rounding boundary, where float round(x, 6)
    implementations disagree. ``sum_nano_sql`` must be a SQL expression
    over the aggregated columns yielding a non-negative BIGINT;
    ``n_sql`` names the (positive BIGINT) count expression — an
    explicit parameter, so a caller whose aggregate uses a different
    alias fails here loudly instead of at analysis time with an
    opaque unresolved ``_n``."""
    return F.expr(
        f"(2 * ({sum_nano_sql}) + 1000 * ({n_sql})) DIV (2000 * ({n_sql}))"
    )


def _bigram_pairs(
    df: DataFrame, id_col: str, text_col: str, keep_cols: tuple = ()
) -> DataFrame:
    """One tokenize pass → the (doc, w1, w2) bigram-occurrence frame.

    The input fans out first (:func:`~moisturizer_spark.operators.
    common.fan_out`): the tokenize + bigram explode + map-side count
    partials are the LM scorers' CPU, and a single-file local table
    would otherwise run them at file parallelism — one core. No-op on
    many-partition cluster reads."""
    from moisturizer_spark.operators.common import fan_out

    toks = fan_out(df).select(
        F.col(id_col).alias("_id"),
        *[F.col(c) for c in keep_cols],
        tokens_col(F.col(text_col)).alias("_w"),
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("_w") - 1),
        lambda i: F.struct(
            F.element_at(F.col("_w"), i).alias("w1"),
            F.element_at(F.col("_w"), i + 1).alias("w2"),
        ),
    )
    return (
        toks.filter(F.size("_w") >= 2)
        .select("_id", *keep_cols, F.explode(grams).alias("_g"))
        .select(
            "_id",
            *keep_cols,
            F.col("_g.w1").alias("_w1"),
            F.col("_g.w2").alias("_w2"),
        )
    )


def _bigram_lm(pairs: DataFrame) -> tuple:
    """Bigram LM from an occurrence frame: the persisted count table
    C(w1,w2), its derived context table C(w1), and the vocabulary size
    (distinct words participating in bigrams — the model's event
    space). The count table is vocabulary-bounded and persisted so the
    vocab action, the context derivation, and the scoring join all
    read it without re-scanning the corpus (ReuseExchange won't fire
    across them)."""
    c2 = materialize(
        pairs.groupBy("_w1", "_w2").agg(F.count(F.lit(1)).alias("_n2"))
    )
    c1 = c2.groupBy("_w1").agg(F.sum("_n2").alias("_n1"))
    vocab = (
        c2.select(F.col("_w1").alias("_t"))
        .union(c2.select(F.col("_w2").alias("_t")))
        .agg(F.countDistinct("_t"))
        .first()[0]
    )
    return c2, c1, vocab


def dsir_log_ratio(
    df: DataFrame,
    target: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.5,
    keep_cols: tuple = (),
    target_pred=None,
    skew_guard: bool = False,
    salt: int = 8,
) -> DataFrame:
    """DSIR-style importance scoring ("Data Selection for Language
    Models via Importance Resampling", Xie et al. 2023): score every
    raw document by how much more likely it is under a TARGET-domain
    language model than under the raw-corpus model —
    ``log2_ratio = bits_raw − bits_target`` per token, i.e. the
    normalized log importance weight ``(1/n)·log2 (p_target/p_raw)``.
    Positive = target-like; selection is "keep the highest-ratio docs"
    (DSIR proper resamples proportionally — rank-and-take is its
    deterministic, oracle-checkable cousin; both orders agree).

    DSIR hashes n-gram features into buckets; word bigrams are the
    un-hashed special case — at 100 TB you'd swap the bigram key for
    ``xxhash64(bigram) % n_buckets``, shrinking both LM tables to a
    fixed size with zero plan-shape change (the remove_dup_spans
    ``hash_grams`` move).

    Out-of-target bigrams: a raw bigram absent from the target LM
    scores ``P = k/(C(w1)+k·V_t)`` (or ``k/(k·V_t)`` for an unseen
    context) via the same add-k smoothing, so no join row is lost —
    the target side joins LEFT, the raw side INNER (the raw LM trained
    on the scored corpus always contains its own bigrams).

    Target spec: pass EITHER ``target`` (a separate exemplar corpus —
    the Wikipedia-LM shape; scored with its own scan) OR
    ``target_pred`` (a boolean Column over ``df`` marking the target
    slice — the labeled-subset shape). The predicate form is the fast
    path: BOTH models come from ONE aggregation — the bigram table
    carries a raw count and a conditional target count side by side —
    so the whole computation is two corpus scans (fused LM build +
    scoring) instead of three. Identical scores where both forms
    apply (parity-pinned).

    Scale: ≤3 corpus scans total; the scoring join carries BOTH models
    in one pass — each is a vocabulary-bounded (w1,w2,counts) table
    joined on its natural key, context tables broadcast.
    Cross-engine determinism: the bigram_lm_bits recipe (integer
    nano-bit terms, BIGINT sums, integer half-away division — see
    :func:`_micro_per_token`; the ratio can be either sign, so the
    division branches on it).

    ``skew_guard``: same hot-bigram story and same fix as
    :func:`bigram_lm_bits` — AQE cannot split these joins (the cached
    count table is pre-partitioned on the join key, leaving no shuffle
    stage to re-plan), so the guard salts BOTH bigram-keyed scoring
    joins (the raw inner and the target left — both shapes
    ``salted_join`` supports); parity-pinned bit-identical.
    """
    from moisturizer_spark.operators.skew import salted_join
    if (target is None) == (target_pred is None):
        raise ValueError("pass exactly one of target / target_pred")
    if target_pred is not None:
        flagged = df.withColumn("_tflag", target_pred.cast("int"))
        pairs = _bigram_pairs(
            flagged, id_col, text_col, tuple(keep_cols) + ("_tflag",)
        )
        # ONE aggregation yields both models: raw count + target count
        c = materialize(
            pairs.groupBy("_w1", "_w2").agg(
                F.count(F.lit(1)).alias("_n2"),
                F.sum("_tflag").alias("_tn2"),
            )
        )
        rc2 = c.select("_w1", "_w2", "_n2")
        rc1 = c.groupBy("_w1").agg(F.sum("_n2").alias("_n1"))
        tonly = c.filter(F.col("_tn2") > 0)
        t_bigrams = tonly.select("_w1", "_w2", "_tn2")
        t_contexts = tonly.groupBy("_w1").agg(F.sum("_tn2").alias("_tn1"))
        # BOTH vocabulary sizes in ONE driver job over the cached table
        words = c.select(F.col("_w1").alias("_t"), "_tn2").union(
            c.select(F.col("_w2").alias("_t"), "_tn2")
        )
        rvocab, tvocab = words.agg(
            F.countDistinct("_t"),
            F.countDistinct(F.when(F.col("_tn2") > 0, F.col("_t"))),
        ).first()
    else:
        pairs = _bigram_pairs(df, id_col, text_col, keep_cols)
        tpairs = _bigram_pairs(target, id_col, text_col)
        rc2, rc1, rvocab = _bigram_lm(pairs)
        tc2, tc1, tvocab = _bigram_lm(tpairs)
        # the two target tables join SEPARATELY: an unseen bigram under
        # a seen context must still smooth against that context's count
        # C_t(w1) — only a fully-unseen context degrades to P = k/(k·V_t)
        t_bigrams = tc2.select("_w1", "_w2", F.col("_n2").alias("_tn2"))
        t_contexts = tc1.select("_w1", F.col("_n1").alias("_tn1"))
    if not tvocab:
        raise ValueError("target corpus has no bigrams to train on")
    lp_t = F.log2(
        (F.coalesce(F.col("_tn2"), F.lit(0)) + F.lit(float(k)))
        / (F.coalesce(F.col("_tn1"), F.lit(0)) + F.lit(float(k) * tvocab))
    )
    lp_r = F.log2(
        (F.col("_n2") + F.lit(float(k)))
        / (F.col("_n1") + F.lit(float(k) * rvocab))
    )
    # same join shape as bigram_lm_bits: bigram table on its natural
    # key, context table broadcast — no pre-join of the two raw tables
    # (that would shuffle the full C(w1,w2) frame on _w1 first)
    if skew_guard:
        scored = salted_join(pairs, rc2, ["_w1", "_w2"], salt=salt)
        scored = salted_join(
            scored, t_bigrams, ["_w1", "_w2"], how="left", salt=salt
        )
    else:
        scored = pairs.join(rc2, ["_w1", "_w2"]).join(
            t_bigrams, ["_w1", "_w2"], "left"
        )
    return (
        scored
        .join(F.broadcast(rc1), "_w1")
        .join(F.broadcast(t_contexts), ["_w1"], "left")
        .groupBy("_id", *keep_cols)
        .agg(
            F.sum(_nano(lp_t)).alias("_st"),
            F.sum(_nano(lp_r)).alias("_sr"),
            F.count(F.lit(1)).alias("_n"),
        )
        .withColumn(
            "_micro",
            F.when(
                F.col("_st") >= F.col("_sr"),
                _micro_per_token("_st - _sr"),
            ).otherwise(-_micro_per_token("_sr - _st")),
        )
        .select(
            F.col("_id").alias(id_col),
            *keep_cols,
            (F.col("_micro").cast("double") / F.lit(1e6)).alias(
                "log2_ratio_per_token"
            ),
        )
    )


def importance_resample(
    scored: DataFrame,
    n_target: int,
    weight_col: str = "log2_ratio_per_token",
    id_col: str = "doc_id",
    salt: str = "dsirprop:",
    ratio_clamp: float = 20.0,
    bound_bits: int = 62,
) -> DataFrame:
    """DSIR's actual selection rule — importance-PROPORTIONAL sampling
    (Xie et al. 2023 resample docs with probability ∝ importance
    weight; :func:`dsir_log_ratio`'s rank-and-take is the deterministic
    top-k cousin). Poisson sampling with per-doc inclusion probability
    ``p_i = min(1, n_target · w_i / Σw)`` against an md5-uniform draw —
    the ``expand_epochs`` fractional-draw trick, so the pick is
    deterministic AND oracle-replayable. E[|sample|] ≈ n_target (exact
    up to the caps and md5 uniformity; pinned statistically in tests).

    Determinism recipe: the per-token log ratio lives on a 1e-6 grid,
    so ``w_i = round(2^ratio · 1e6)`` is a BIGINT both engines derive
    from identical doubles (pow is irrational off the trivial points —
    grid-boundary hits have measure zero, the ``_nano`` argument);
    Σw is an exact integer sum; ``n_target·w_i`` stays integer; the
    single double division of two exact integers is IEEE-identical;
    the draw compares against a 32-bit md5 fraction
    (:func:`~moisturizer_spark.operators.sampling.hash_fraction`).
    Negative ratios quantizing to w=0 are deterministically excluded
    (they'd also never win a proportional draw at this resolution).

    Scale: weight projection is map-side; the weighted frame is
    PERSISTED once (it feeds two actions — the Σw aggregate and the
    returned filter — and without the persist the whole upstream
    scoring pipeline would execute twice); Σw is ONE scalar aggregate
    broadcast back as a literal 1-row frame (the q22/tfidf pattern —
    NOT a global window, which would funnel every row through one
    partition); the draw is a pure projection. Zero extra shuffles at
    any corpus size.

    Integer headroom: the per-token ratio is CLAMPED at
    ``ratio_clamp`` (default 20 — such a doc is a certain pick at any
    plausible n_target anyway) before exponentiation, identically in
    the SQL oracle. Without the clamp, Spark's non-ANSI BIGINT cast
    would silently saturate an extreme weight at Long.MAX while DuckDB
    raises — an engine divergence; with it, w ≤ 2^20·10^6 ≈ 1.05e12
    and ``n_target·w`` stays exact under 2^53. Σw alone would still
    wrap SILENTLY past ~8·10^6 docs (Spark's non-ANSI sum), so the
    micro-weights AUTO-RESCALE before summing: one 1-row aggregate
    reads ``(max w, count)`` and derives the shift
    ``s = max(0, bitlen(max w) + bitlen(count) − bound_bits)`` — pure
    integer bit-length arithmetic (``length(bin(x))``, identical in
    DuckDB), no float log2 at the boundary — then every weight drops
    to ``w >> s`` (truncating ``div``, w ≥ 0) and
    ``Σ(w>>s) ≤ count·max(w)/2^s < 2^bound_bits`` by construction.
    The draw compares ``u < n_target·w′/Σw′`` — scale-invariant up to
    the shared truncation, which both engines replay bit-identically;
    below the bound s = 0 and the behavior is unchanged. Weights
    truncating to 0 under a live shift are deterministically excluded
    (their untruncated pick probability is ≤ n_target·2^s/Σw — already
    negligible when the corpus is large enough to force a shift).
    ``bound_bits`` exists for tests to force the rescale on small
    corpora; production uses the int64-safe default.

    Returns the selected rows of ``scored`` unchanged (plus nothing):
    filter, not transform."""
    from moisturizer_spark.operators.common import materialize
    from moisturizer_spark.operators.sampling import hash_fraction

    w_micro = F.round(
        F.pow(F.lit(2.0), F.least(F.col(weight_col), F.lit(ratio_clamp)))
        * F.lit(1e6)
    ).cast("bigint")
    weighted = materialize(scored.withColumn("_w", w_micro))
    # 1-row header: shift amount from exact bit lengths (never the sum,
    # which is the quantity that can overflow). GREATEST skips the NULL
    # max on an empty frame in both engines -> s = 0 there.
    hdr = weighted.agg(
        F.max("_w").alias("_wmax"), F.count(F.lit(1)).alias("_cnt")
    ).select(
        F.greatest(
            F.lit(0),
            (
                F.length(F.bin(F.col("_wmax")))
                + F.length(F.bin(F.col("_cnt")))
                - F.lit(bound_bits)
            ).cast("int"),
        ).alias("_s")
    )
    shifted = materialize(
        weighted.crossJoin(F.broadcast(hdr)).withColumn(
            "_ws", F.expr("_w div shiftleft(CAST(1 AS BIGINT), _s)")
        )
    )
    tot = shifted.agg(F.sum("_ws").alias("_tw"))
    u = hash_fraction(F.col(id_col), salt)
    p = F.least(
        F.lit(1.0),
        (F.lit(n_target) * F.col("_ws")).cast("double")
        / F.col("_tw").cast("double"),
    )
    return (
        shifted.crossJoin(F.broadcast(tot))
        .filter(u < p)
        .drop("_w", "_ws", "_s", "_tw")
    )


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-level line deduplication (the C4/RefinedWeb preprocessing
    step): every distinct line is kept exactly once across the WHOLE
    corpus — at its first occurrence in ``(id, position)`` order — and
    each document is reassembled from its surviving lines. Documents
    whose lines all occur earlier elsewhere disappear entirely.

    Returns ``(id, text, n_lines_kept, n_lines_dropped)``.

    Scale plan: ``posexplode`` keeps line provenance without a join; the
    first-occurrence choice is one ``row_number`` window keyed on the
    line content (the only heavy shuffle, and its payload is the line
    itself — which the reassembly needs anyway); reassembly is a
    ``groupBy(id)`` of ``(position, line)`` structs. Both shuffles are
    map-combinable or single-pass; nothing is quadratic in corpus size.
    """
    from pyspark.sql import Window

    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), F.lit(sep), -1)).alias(
            "_pos", "_line"
        ),
    )
    first = Window.partitionBy("_line").orderBy("_id", "_pos")
    kept = lines.withColumn("_rn", F.row_number().over(first))
    per_doc = (
        kept.groupBy("_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("_rn") == 1,
                        F.struct(F.col("_pos"), F.col("_line")),
                    )
                )
            ).alias("_kept"),
            F.sum(F.when(F.col("_rn") != 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_lines_dropped"),
        )
        .filter(F.size("_kept") > 0)
    )
    return per_doc.select(
        F.col("_id").alias(id_col),
        F.array_join(
            F.transform(F.col("_kept"), lambda s: s["_line"]), sep
        ).alias(text_col),
        F.size("_kept").cast("bigint").alias("n_lines_kept"),
        "n_lines_dropped",
    )


def _signed_micro_per_token(sum_nano_sql: str, n_sql: str = "_n") -> Column:
    """Sign-aware :func:`_micro_per_token`: half-away-from-zero
    ``sum_nano / (1000·n)`` in pure integer arithmetic for a BIGINT sum
    of EITHER sign (``DIV`` truncates toward zero, so the half-away
    adjustment must be applied to the magnitude) — the same CASE shape
    the DSIR oracle SQL replays."""
    s, n = f"({sum_nano_sql})", f"({n_sql})"
    return F.expr(
        f"CASE WHEN {s} >= 0"
        f" THEN (2 * {s} + 1000 * {n}) DIV (2000 * {n})"
        f" ELSE -((2 * (-{s}) + 1000 * {n}) DIV (2000 * {n})) END"
    )


def nb_log_odds(
    df: DataFrame,
    label_col: str = "label",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.5,
    keep_cols: tuple = (),
) -> DataFrame:
    """Model-based quality filtering via a multinomial Naive-Bayes
    token classifier — the discriminative sibling of the generative LM
    scorers (:func:`bigram_lm_bits` / :func:`dsir_log_ratio`), i.e. the
    GPT-3 / CCNet-lineage "train a classifier on curated-vs-crawl seed
    text, keep what it likes" recipe (Brown et al. 2020 §A; Wenzek et
    al. 2020 use fastText — NB is its exchangeable bag-of-words core,
    and the one whose training is a single exact aggregation).

    ``label_col`` carries the seed labels on the corpus frame itself:
    1 = curated exemplar, 0 = negative exemplar, NULL = unlabeled.
    Training uses only labeled rows; scoring covers EVERY row with ≥1
    token (tokenless docs carry no evidence and are excluded, matching
    the ≥2-token exclusion of the bigram scorers). Both seed classes
    must be non-empty in docs and tokens, else ValueError.

    Per document: ``log_odds = log2 P(curated|d) − log2 P(crawl|d)
    = log2(D1/D0) + Σ_w [log2 P(w|1) − log2 P(w|0)]`` with add-``k``
    class-conditional token models ``P(w|y) = (C(w,y)+k)/(N(y)+k·V)``
    over the seed vocabulary ``V`` (out-of-vocabulary tokens take the
    ``C=0`` ratio — a constant). Returns ``(id_col, *keep_cols,
    log_odds_per_token, is_curated)``: the length-normalized margin on
    the 1e-6 grid and the sign of the TOTAL log-odds as 1/0 (``n > 0``,
    so total and per-token sign agree; an exact 0 scores not-curated).

    Cross-engine determinism: the :func:`bigram_lm_bits` nano-bit
    recipe — each of the two log2 terms rounds to integer nano-bits
    before the (exact BIGINT) difference and per-doc sum; the class
    totals N(y), vocabulary V, and seed doc counts D(y) are exact
    integers inlined as literals, so numerators/denominators are
    identical doubles in both engines and only the measure-zero
    log2-rounding boundary could ever diverge. The final per-token
    average is sign-aware pure-integer division
    (:func:`_signed_micro_per_token`).

    Scale: the corpus is scanned twice — once to train (the label
    filter prunes to the seed slice AT THE SCAN: predicate pushdown on
    whatever column derives the label), once to score. The only big
    shuffle is the per-doc aggregation keyed on ``id_col``; the token
    count table C(w,·) is vocabulary-bounded (map-side combinable
    aggregation, persisted so totals/vocab/scoring read it without
    re-scanning the seeds) and the per-word log-ratio table derived
    from it BROADCASTS to the scoring scan. At 100 TB you'd prune to a
    top-V vocabulary exactly as the LM scorers document — the OOV
    constant is already the fallback path. Driver-side actions are two
    1-row aggregates (totals, doc counts) — bounded.
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_y"),
        *[F.col(c) for c in keep_cols],
        F.explode(tokens_col(F.col(text_col))).alias("_w"),
    )
    cw = materialize(
        toks.filter(F.col("_y").isNotNull())
        .groupBy("_w")
        .agg(
            F.sum(F.when(F.col("_y") == 1, 1).otherwise(0)).alias("_c1"),
            F.sum(F.when(F.col("_y") == 0, 1).otherwise(0)).alias("_c0"),
        )
    )
    tot = cw.agg(
        F.sum("_c1"), F.sum("_c0"), F.count(F.lit(1))
    ).first()
    n1, n0, vocab = int(tot[0] or 0), int(tot[1] or 0), int(tot[2])
    dc = df.agg(
        F.count(F.when(F.col(label_col) == 1, F.lit(1))),
        F.count(F.when(F.col(label_col) == 0, F.lit(1))),
        F.count(
            F.when(
                F.col(label_col).isNotNull()
                & ~F.col(label_col).isin(0, 1),
                F.lit(1),
            )
        ),
    ).first()
    d1, d0, bad = int(dc[0]), int(dc[1]), int(dc[2])
    if bad:
        # a stray label value would silently count its tokens into
        # NEITHER class while still inflating the vocabulary V —
        # corrupting every smoothed probability; fail loudly instead
        raise ValueError(
            f"nb_log_odds labels must be 1, 0, or NULL; {bad} rows "
            "carry other values"
        )
    if min(n1, n0, d1, d0) == 0:
        raise ValueError(
            "nb_log_odds needs both seed classes non-empty (docs and "
            f"tokens); got docs 1/0 = {d1}/{d0}, tokens 1/0 = {n1}/{n0}"
        )
    kf = float(k)
    den1, den0 = n1 + kf * vocab, n0 + kf * vocab
    llr = cw.select(
        "_w",
        (
            _nano(F.log2((F.col("_c1") + F.lit(kf)) / F.lit(den1)))
            - _nano(F.log2((F.col("_c0") + F.lit(kf)) / F.lit(den0)))
        ).alias("_lw"),
    )
    oov = _nano(F.log2(F.lit(kf / den1))) - _nano(F.log2(F.lit(kf / den0)))
    prior = _nano(F.log2(F.lit(d1 / d0)))
    return (
        toks.join(F.broadcast(llr), "_w", "left")
        .groupBy("_id", *keep_cols)
        .agg(
            F.sum(F.coalesce(F.col("_lw"), oov)).alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        )
        .withColumn("_t", F.col("_s") + prior)
        .withColumn("_micro", _signed_micro_per_token("_t"))
        .select(
            F.col("_id").alias(id_col),
            *keep_cols,
            (F.col("_micro").cast("double") / F.lit(1e6)).alias(
                "log_odds_per_token"
            ),
            (F.col("_t") > 0).cast("bigint").alias("is_curated"),
        )
    )


def token_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple = (),
) -> DataFrame:
    """Per-document Shannon entropy of the unigram token distribution,
    in integer micro-bits per token — the information-density quality
    signal the ratio heuristics (:func:`quality_features`) and
    repetition counters (:func:`repetition_features`) both miss: a doc
    that cycles a handful of tokens scores low however long it is,
    while natural prose sits near the corpus ceiling. (The classic
    compression-ratio proxy without a codec dependency: H bounds the
    per-token bits any entropy coder can reach.)

    Identity used: ``H = log2(n) − (Σ c·log2 c)/n`` over the per-doc
    term counts ``c`` (n = Σc), so the per-term work needs only ``c``
    — no second pass once ``n`` is known. Cross-engine determinism is
    the :func:`bigram_lm_bits` nano-bit recipe: each ``c·log2(c)`` term
    rounds to integer nano-bits (``log2`` of an exact BIGINT — both
    engines see the identical double), the per-doc sum is an exact
    BIGINT, the division is :func:`_micro_per_token`'s half-away
    integer form, and ``log2(n)`` rounds straight to micro-bits.
    ``GREATEST(·, 0)`` absorbs the one pathological −1-micro rounding
    tie of a single-term doc. Overflow: Σ c·log2(c) ≤ n·log2(n), inside
    int64 nano-bits up to ~2×10⁸ tokens in a SINGLE document — beyond
    parquet's field limit, and the sum is per-doc, so corpus size is
    irrelevant (the :func:`_nano` argument).

    Returns ``(id_col, *keep_cols, n_tokens, entropy_micro)`` — micro-
    bits/token as BIGINT; tokenless docs are excluded (no distribution
    to measure, matching the LM scorers' exclusion rule).

    Scale: one tokenize scan → one (doc, term)-keyed exact aggregation
    → one doc-keyed aggregation. Both are map-side combinable; nothing
    touches the driver; no joins, no broadcast state, no skew surface
    beyond the corpus's own doc-size distribution (one giant doc costs
    its own token count, linearly).
    """
    cnts = (
        df.select(
            F.col(id_col).alias("_id"),
            *[F.col(c) for c in keep_cols],
            F.explode(tokens_col(F.col(text_col))).alias("_w"),
        )
        .groupBy("_id", *keep_cols, "_w")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    per_doc = cnts.groupBy("_id", *keep_cols).agg(
        F.sum("_c").alias("_n"),
        F.sum(F.col("_c") * _nano(F.log2(F.col("_c").cast("double")))).alias(
            "_s"
        ),
    )
    h = (
        F.round(F.log2(F.col("_n").cast("double")) * F.lit(1e6)).cast("bigint")
        - _micro_per_token("_s", "_n")
    )
    return per_doc.select(
        F.col("_id").alias(id_col),
        *keep_cols,
        F.col("_n").alias("n_tokens"),
        F.greatest(h, F.lit(0)).alias("entropy_micro"),
    )


def bm25_topk(
    df: DataFrame,
    terms: tuple,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1_tenths: int = 12,
    b_quarters: int = 3,
) -> DataFrame:
    """Keyword retrieval: the top-``k`` documents for a bag-of-terms
    query under BM25 (Robertson–Spärck Jones) — the ranked-search
    primitive :func:`tfidf_top_terms` (per-doc term EXTRACTION) does
    not provide. ``score(d) = Σ_{t∈q} idf(t) ·
    tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))`` with the standard
    ``idf = ln(1 + (N−df+0.5)/(df+0.5))``, k1 = ``k1_tenths``/10
    (default 1.2), b = ``b_quarters``/4 (default 0.75).

    Cross-engine determinism: every input to the two IEEE operations
    is an EXACT integer. ``idf = ln(2(N+1)/(2df+1))`` — one division
    of exact ints, one ``ln``; the tf part clears denominators against
    avgdl = L/N (L = total corpus tokens): ``22·tf·L / (10·tf·L + 3·L
    + 9·dl·N)`` — exact BIGINT numerator/denominator, one division.
    The per-(doc,term) product rounds to integer micro (the suite's
    6-digit contract, as :func:`~moisturizer_spark.workload`'s tfidf
    row documents for ``ln``), and per-doc totals are exact BIGINT
    sums of ≤ |terms| micros. Bounds: the cleared numerator
    ``4(k1_tenths+10)·tf·L < 2⁶³`` needs ``tf·L < 10¹⁷`` (a 10¹³-token
    corpus allows per-doc tf up to 10⁴), and BIGINT→double conversion
    is exact below 2⁵³ — both fail loudly under ANSI rather than wrap.

    Scale: ``dl`` comes from ``size(tokens)`` on the ROW — no explode;
    only query-term postings explode survive the ``isin`` filter, so
    the tf/df aggregations are posting-list-sized. ``df`` collapses to
    ≤ |terms| rows and BROADCASTS; N is a metadata-cheap count and L a
    1-row scalar — both inlined as literals so the plan has no 1-row
    nested-loop join. Final top-k is ``orderBy().limit(k)`` — a
    distributed TakeOrderedAndProject, never a single-partition window.

    Returns ``(id_col, n_terms, score_micro)`` ordered by
    ``(score_micro DESC, id)`` — a total order, so the k-boundary is
    deterministic.
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens_col(F.col(text_col))).alias("_w"),
    )
    dl = df.select(
        F.col(id_col).alias("_id"),
        F.size(tokens_col(F.col(text_col))).cast("bigint").alias("_dl"),
    )
    tot = dl.agg(F.count(F.lit(1)), F.sum("_dl")).first()
    n_docs, total_len = int(tot[0]), int(tot[1] or 0)
    if total_len == 0:
        raise ValueError("bm25_topk: corpus has no tokens")
    qt = toks.filter(F.col("_w").isin(*[str(t) for t in terms]))
    tf = qt.groupBy("_id", "_w").agg(F.count(F.lit(1)).alias("_tf"))
    dfreq = qt.groupBy("_w").agg(F.count_distinct("_id").alias("_df"))
    idf = F.log(
        F.lit(2.0 * (n_docs + 1)) / (2 * F.col("_df") + 1).cast("double")
    )
    # tf·(k1+1)/(tf + k1(1−b) + k1·b·dl/avgdl), cleared against
    # avgdl = L/N and the tenths/quarters grids by multiplying num and
    # den through by 40·L: numerator 4L·(k1_tenths+10)·tf, denominator
    # 40L·tf + k1_tenths·(4−b_q)·L + k1_tenths·b_q·N·dl (defaults:
    # 88L·tf over 40L·tf + 12L + 36N·dl ≡ 22tf·L/(10tf·L + 3L + 9dl·N))
    num = F.lit(4 * total_len * (k1_tenths + 10)) * F.col("_tf")
    den = (
        F.lit(40 * total_len) * F.col("_tf")
        + F.lit(k1_tenths * (4 - b_quarters) * total_len)
        + F.lit(k1_tenths * b_quarters * n_docs) * F.col("_dl")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "_w")
        .join(dl, "_id")
        .select(
            "_id",
            F.round(
                (idf * (num.cast("double") / den.cast("double")))
                * F.lit(1e6)
            )
            .cast("bigint")
            .alias("_m"),
        )
    )
    return (
        scored.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("_m").alias("score_micro"),
        )
        .orderBy(F.col("score_micro").desc(), F.col("_id"))
        .limit(int(k))
        .select(F.col("_id").alias(id_col), "n_terms", "score_micro")
    )


def unigram_kl(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group KL divergence ``D(P_g ‖ P_corpus)`` of the unigram
    token distribution, in integer micro-bits per token — the TEXT leg
    of the drift family (PSI/KS/χ² watch numeric and categorical
    columns; this watches what a source actually SAYS): a source whose
    vocabulary usage diverges from the corpus mix scores high, a
    representative source scores near zero.

    Determinism without magnitude risk: per (group, term) the log
    ratio ``log2(c_gt·N / (n_g·c_t))`` assembles from four nano-bit
    ``log2`` terms of EXACT integers (:func:`_nano` — both engines see
    identical doubles), and the per-term contribution
    ``c_gt·r_nano/(1000·n_g)`` evaluates in DOUBLE (exact inputs <
    2⁵³, identical IEEE operations) before half-away rounding to
    integer micro-bits. The per-group SUM of those micros is bounded
    by ``max|r|/1000 ≈ 6·10⁷`` — because Σc_gt = n_g, the weights are
    a probability distribution — so the BIGINT total cannot overflow
    at ANY corpus size; no decimal widening, no rescale header needed.

    Scale: one tokenize scan → (group, term) exact counts; corpus term
    counts re-aggregate THAT frame (never the corpus); the join back
    shuffles on the term key; per-group token totals come from a slim
    ``size(tokens)`` scan (no explode) and broadcast. N inlines as a
    plan literal (1-row scalar, the bm25_topk pattern).

    Returns ``(group_col, n_tokens, n_terms, kl_micro)``.
    """
    from moisturizer_spark.operators.common import fan_out

    toks = fan_out(df.select(F.col(group_col).alias("_g"), F.col(text_col)))
    st = (
        toks.select("_g", F.explode(tokens_col(F.col(text_col))).alias("_w"))
        .groupBy("_g", "_w")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    ct = st.groupBy("_w").agg(F.sum("_c").alias("_cw"))
    ng = (
        df.select(
            F.col(group_col).alias("_g"),
            F.size(tokens_col(F.col(text_col))).alias("_l"),
        )
        .groupBy("_g")
        .agg(F.sum("_l").cast("bigint").alias("_n"))
    )
    n_total_row = df.select(
        F.sum(F.size(tokens_col(F.col(text_col)))).cast("bigint").alias("n")
    ).first()
    n_total = n_total_row["n"] if n_total_row is not None else None
    if not n_total:  # None (no rows) or 0 (all texts tokenize empty)
        raise ValueError(
            "unigram_kl: the corpus has no tokens (empty input or every "
            f"'{text_col}' tokenizes to nothing) — there is no reference "
            "distribution to diverge from; check the upstream feed"
        )
    # half-away like F.round / DuckDB ROUND — Python round() is
    # half-EVEN and would diverge on an exact .5 boundary
    nano_log_n_total = int(math.floor(math.log2(n_total) * 1e9 + 0.5))
    r_nano = (
        _nano(F.log2(F.col("_c").cast("double")))
        + F.lit(nano_log_n_total)
        - _nano(F.log2(F.col("_n").cast("double")))
        - _nano(F.log2(F.col("_cw").cast("double")))
    )
    m = F.round(
        F.col("_c").cast("double")
        * r_nano.cast("double")
        / (F.lit(1000.0) * F.col("_n").cast("double"))
    ).cast("bigint")
    return (
        st.join(ct, "_w")
        .join(F.broadcast(ng), "_g")
        .select("_g", m.alias("_m"))
        .groupBy("_g")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("_m").alias("kl_micro"),
        )
        .join(F.broadcast(ng), "_g")
        .select(
            F.col("_g").alias(group_col),
            F.col("_n").alias("n_tokens"),
            "n_terms",
            "kl_micro",
        )
    )
