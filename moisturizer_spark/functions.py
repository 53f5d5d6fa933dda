"""Scalar/column function namespace — the engine's reusable expressions.

One flat import point (``from moisturizer_spark import functions as MF``)
for the column-level building blocks the operators are made of. Everything
here is a pure Catalyst expression (JVM-side, codegen-friendly, no UDFs),
usable in any DataFrame pipeline, not just the packaged operators.

The reference has no user-facing function surface (SURVEY.md §2c:
"UDF/UDAF surface: none exposed") — this is part of the analytics
extension, organized the way `pyspark.sql.functions` is.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F

from moisturizer_spark.operators.similarity import cosine_similarity_col
from moisturizer_spark.operators.textan import (
    BPE_PATTERN,
    bpe_tokens_col,
    tokens_col,
)

__all__ = [
    "BPE_PATTERN",
    "bpe_tokens_col",
    "content_sha",
    "cosine_similarity_col",
    "ngrams_col",
    "row_fingerprint",
    "term_counts_udtf",
    "tokens_col",
]


def content_sha(content: Column, bits: int = 256) -> Column:
    """Content address of a binary/string payload (hex sha2)."""
    return F.sha2(content, bits)


def row_fingerprint(*cols: Column | str) -> Column:
    """Order-insensitive-schema row fingerprint: 64-bit xxhash of the
    named columns — the exact-dedup / change-detection key. Collision
    odds at 100 TB row counts: ~n²/2⁶⁵; use :func:`content_sha` when a
    cryptographic guarantee matters."""
    return F.xxhash64(*cols)


def median_udaf() -> Column:
    """Grouped-aggregate pandas UDAF: exact interpolated median.

    The engine's UDAF extension point demonstrated end-to-end: Arrow
    ships each group's column to the Python worker as one batch,
    numpy computes, one scalar returns per group. Built-in
    ``percentile``/``median`` cover this case JVM-side — use them in
    production; this exists so user-defined aggregates have a tested
    template (true UDAF semantics: partial aggregation is NOT available
    to pandas UDAFs, so every group's values ship — budget the shuffle
    accordingly at scale, or redesign as algebraic agg + finalizer).
    """
    @F.pandas_udf("double")
    def _median(v: pd.Series) -> float:  # Series→scalar hint = GROUPED_AGG
        return float(np.median(v)) if len(v) else float("nan")

    return _median


def ngrams_col(text: Column, n: int = 3) -> Column:
    """Distinct character n-grams of the whitespace-normalized text.

    The normalized string is bound as a lambda variable (single-element
    ``transform``) so the regexp runs once per row, not once per gram —
    see operators.dedup.shingles for the per-element re-evaluation
    pitfall this avoids."""
    normalized = F.regexp_replace(F.lower(text), r"\s+", " ")

    def grams(t: Column) -> Column:
        idx = F.sequence(F.lit(1), F.greatest(F.length(t) - F.lit(n - 1), F.lit(1)))
        return F.array_distinct(F.transform(idx, lambda i: t.substr(i, F.lit(n))))

    return F.transform(F.array(normalized), grams).getItem(0)


def term_counts_udtf():
    """User-defined TABLE function (Python UDTF, Spark 3.5+ surface):
    ``(doc_id, text) → (doc_id, term, n)`` rows, one per distinct
    whitespace token after the same punctuation-strip normalization as
    :func:`tokens_col`.

    This is the engine's UDTF extension template — lateral row
    expansion with user Python logic — registered per-session via
    ``spark.udtf.register``. The built-in equivalent (``explode`` over
    :func:`tokens_col` + groupBy) stays JVM-side and is what the
    packaged operators use; a real UDTF earns its Python-worker cost
    only when the expansion logic can't be expressed in Catalyst
    expressions (custom parsers, stateful tokenizers). Semantics are
    deliberately oracle-reproducible so correctness of the UDTF path
    itself is hash-checked against DuckDB.
    """
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, term: string, n: bigint")
    class TermCounts:
        def eval(self, doc_id: int, text: str):
            toks = [
                t
                for t in re.sub(r"[^a-z0-9\s]", " ", (text or "").lower()).split()
                if t
            ]
            counts: dict[str, int] = {}
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
            for term in sorted(counts):
                yield (doc_id, term, counts[term])

    return TermCounts
