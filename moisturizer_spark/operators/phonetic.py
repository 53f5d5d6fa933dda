"""Phonetic encoding for fuzzy-match blocking — American Soundex.

The blocking-key generator for the record-linkage family: candidate
pairs for :func:`~moisturizer_spark.operators.dedup.fs_match_scores` /
``levenshtein_pairs`` need a cheap equivalence class that survives
spelling variation, and Soundex (Russell & Odell 1918; the algorithm
standardized by the U.S. National Archives and shipped by every major
SQL engine) is the canonical one: ``robert`` and ``rupert`` both key to
``R163``, so the quadratic edit-distance work runs only inside a block.

No UDF and no engine builtin: the code is a pure string-expression
chain (``translate`` → transparent-letter removal → per-digit run
collapse → vowel-separator removal) GENERATED from one rule table for
both engines (the ``urls.py`` design) — DuckDB has no ``soundex`` and
Spark's lives in a different dialect corner, so generating both
renderings from the same constants is what makes the oracle a real
cross-check rather than a reimplementation that can drift. The run
collapse is six literal ``[1-6]+`` replaces because RE2 (DuckDB) has no
backreferences.

Algorithm (the National Archives rules, exactly):

1. keep the first letter;
2. map letters to codes — b f p v → 1, c g j k q s x z → 2, d t → 3,
   l → 4, m n → 5, r → 6; vowels (a e i o u y) become a SEPARATOR that
   survives until after run collapse (same codes across a vowel do NOT
   merge); h and w are TRANSPARENT (removed before collapse, so same
   codes across h/w DO merge — the ``ashcraft → A261`` rule);
3. collapse runs of the same digit;
4. if the first letter is itself digit-coded, its (possibly merged) run
   representative is dropped — adjacent same-code letters after the
   first letter produce nothing;
5. strip separators, take three code digits, zero-pad.

Scale: one ``translate`` + seven ``regexp_replace``/``replace`` calls
per row, all inside whole-stage codegen — the same cost class as the
URL canonicalizer.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_ALPHA = "abcdefghijklmnopqrstuvwxyz"
# letter -> soundex code; 'a' marks a vowel separator, 'h' a transparent
# letter (h/w). One string, positionally aligned with _ALPHA.
_CODES = "a123a12ha22455a12623a1h2a2"
assert len(_CODES) == len(_ALPHA)


def _soundex_steps(c: str, g: str) -> str:
    """The shared expression chain; ``g`` is the global-flag suffix
    DuckDB's regexp_replace needs (Spark's replaces all matches with no
    flag — the ONLY dialect difference)."""
    s = f"translate({c}, '{_ALPHA}', '{_CODES}')"
    s = f"replace({s}, 'h', '')"  # h/w transparent: merge across them
    for d in "123456":
        s = f"regexp_replace({s}, '{d}+', '{d}'{g})"  # RE2: no backrefs
    first = f"translate(substr({c}, 1, 1), '{_ALPHA}', '{_CODES}')"
    body = (
        f"CASE WHEN {first} BETWEEN '1' AND '6' "
        f"THEN substr({s}, 2) ELSE {s} END"
    )
    return (
        f"upper(substr({c}, 1, 1)) || "
        f"substr(replace({body}, 'a', '') || '000', 1, 3)"
    )


def soundex_sql(col_sql: str) -> str:
    """DuckDB rendering over a lowercase ``[a-z]+`` expression."""
    return _soundex_steps(col_sql, ", 'g'")


def soundex_expr(col_sql: str) -> str:
    """Spark-SQL rendering over a lowercase ``[a-z]+`` expression."""
    return _soundex_steps(col_sql, "")


def soundex_col(col_name: str) -> Column:
    return F.expr(soundex_expr(col_name))
