"""Text-analysis operator tests: winnowing vs a pure-Python reference."""

from __future__ import annotations

import re

from pyspark.sql import Row

from moisturizer_spark.operators.textan import (
    winnowing_fingerprints,
    winnowing_near_duplicates,
)


def _xxhash64_ref(spark, texts: list[str]) -> dict[str, int]:
    """Ground-truth xxhash64 values straight from the engine (the Python
    stdlib has no xxhash); the REFERENCE algorithm below is pure Python."""
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    rows = df.selectExpr("s", "xxhash64(s) AS h").collect()
    return {r["s"]: r["h"] for r in rows}


def _winnow_ref(spark, text: str, k: int, window: int) -> set[int]:
    norm = re.sub(r"\s+", " ", text.lower()).strip()
    n = max(len(norm) - k + 1, 1)
    grams = [norm[i : i + k] for i in range(n)]
    hashes = _xxhash64_ref(spark, list(set(grams)))
    hseq = [hashes[g] for g in grams]
    n_win = max(len(hseq) - window + 1, 1)
    return {min(hseq[j : j + window]) for j in range(n_win)}


def test_winnowing_matches_python_reference(spark):
    texts = [
        "The quick brown fox jumps over the lazy dog",
        "pack   my box with FIVE dozen liquor jugs!",
        "ab",  # shorter than k: degenerate single-gram path
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = {
        r["doc_id"]: set(r["fingerprints"])
        for r in winnowing_fingerprints(df, k=5, window=4).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _winnow_ref(spark, t, 5, 4), f"doc {i}"


def test_winnowing_shared_substring_guarantee(spark):
    # any shared substring of length >= k + window - 1 must contribute at
    # least one common fingerprint (the winnowing paper's core guarantee)
    shared = "a very distinctive shared passage of text"
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text=f"prefix one {shared} suffix alpha"),
            Row(doc_id=1, text=f"totally different start {shared} other end"),
            # no 5-gram in common with the other docs (disjoint alphabet)
            Row(doc_id=2, text="zzzzq xqjvw kkkpp qqwwz mmnnb vvccx"),
        ]
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in winnowing_near_duplicates(df, min_common=1).collect()
    }
    assert (0, 1) in pairs
    assert not any(2 in p for p in pairs)
