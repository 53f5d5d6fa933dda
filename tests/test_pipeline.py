"""Curation-pipeline funnel semantics on a planted corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from moisturizer_spark.operators.pipeline import curation_report

GOOD = (
    "the quick brown fox jumps over the lazy dog while many other "
    "animals watch the scene with great interest and some measure of "
    "genuine amusement under the warm afternoon sun"
)
# enough short words that the mean-token-length rule (alnum <= 5*words)
# passes — this doc must fail ONLY at the decontamination stage
CONTAMINATED = (
    "students answered the benchmark question about the capital of "
    "france and the assembled graders reviewed every submitted answer "
    "carefully before scoring it against the rubric criteria and it "
    "was all very fair to see in the end so we all got to go on and "
    "on a bit more"
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, len(t)) for i, t in rows], "doc_id long, text string, n_chars long"
    )


def test_funnel_stages_nest_and_attribute(spark):
    train = _docs(
        spark,
        [
            (1, GOOD),                  # survives everything
            (2, "too short"),           # fails quality
            (3, GOOD),                  # exact duplicate of 1 -> dropped at dedup
            (4, CONTAMINATED),          # quality-ok, unique, but contaminated
        ],
    )
    ev = _docs(spark, [(100, CONTAMINATED)])
    rows = {r["stage"]: r for r in curation_report(train, ev, n=3).collect()}
    assert rows["input"]["n_docs"] == 4
    assert rows["quality"]["n_docs"] == 3          # doc 2 out
    assert rows["exact_dedup"]["n_docs"] == 2      # doc 3 out (dup of 1)
    assert rows["decontaminated"]["n_docs"] == 1   # doc 4 out (eval overlap)
    # funnel invariants: counts and chars never increase
    by_idx = sorted(rows.values(), key=lambda r: r["stage_idx"])
    for a, b in zip(by_idx, by_idx[1:]):
        assert b["n_docs"] <= a["n_docs"]
        assert b["n_chars"] <= a["n_chars"]
    # char accounting matches the surviving docs exactly
    assert rows["decontaminated"]["n_chars"] == len(GOOD)


def test_funnel_dedup_keeps_first_occurrence(spark):
    # duplicate content: lower doc_id wins, regardless of insert order
    train = _docs(spark, [(7, GOOD), (2, GOOD)])
    ev = _docs(spark, [(100, "completely unrelated benchmark text here")])
    rows = {r["stage"]: r for r in curation_report(train, ev).collect()}
    assert rows["exact_dedup"]["n_docs"] == 1
    assert rows["decontaminated"]["n_docs"] == 1


def test_funnel_quality_failures_do_not_shadow_duplicates(spark):
    # a quality-FAILING doc with the same fingerprint must not consume
    # the rn=1 slot of a quality-passing duplicate
    short = "tiny"
    train = _docs(spark, [(1, short), (5, GOOD)])
    # doc 1 fails quality; doc 5 must still be uniq (its own fp window)
    ev = _docs(spark, [(100, "unrelated eval material for the probe")])
    rows = {r["stage"]: r for r in curation_report(train, ev).collect()}
    assert rows["quality"]["n_docs"] == 1
    assert rows["exact_dedup"]["n_docs"] == 1
