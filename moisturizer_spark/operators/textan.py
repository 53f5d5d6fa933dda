"""Text analysis operators: tokens, quality features, language ID.

All pure column expressions (split / regexp / length / array functions) —
whole-stage-codegen-friendly, no UDFs, linear scans with no shuffle until
the caller aggregates. The expressions are deliberately reproducible in
ANSI SQL so the DuckDB oracle can verify them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

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
    """Whitespace tokenization after punctuation-stripping.

    ``filter(x -> x != '')`` guards empty strings from leading/trailing
    separators so token counts match ``len(text.split())`` semantics.
    """
    cleaned = F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", " ")
    return F.filter(F.split(cleaned, r"\s+"), lambda t: t != "")


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


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-voting language ID across {en, de, fr, es}; 'other' if no hit.

    Score per language = count of that language's stopwords among the
    document's tokens; argmax with deterministic (score desc, lang asc)
    tie-break. A real pipeline would use fastText — this is the built-in,
    dependency-free heuristic, and it is fully expressible in SQL for the
    oracle.
    """
    toks = tokens_col(F.col(text_col))
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
    return df.withColumn(out_col, pred)
