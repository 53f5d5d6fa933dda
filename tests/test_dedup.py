

def test_golden_records_rules_and_determinism(spark):
    """Each survivorship rule produces its documented pick, the
    longest-rule tie-break is the struct total order (never an
    arbitrary arg_max), and unknown rules fail loudly."""
    import pytest
    from pyspark.sql import functions as F

    from moisturizer_spark.operators.dedup import golden_records

    rows = [
        # cluster 1: names tie on length -> lexicographically largest
        (1, 10, "zz-aa", 5.0, "B"),
        (1, 11, "ab-cd", 7.0, "A"),
        (1, 12, "abc", 1.0, "C"),
        # cluster 2: singleton
        (2, 20, "solo", 2.5, "Z"),
    ]
    df = spark.createDataFrame(
        rows, "cl long, id long, name string, bal double, seg string"
    )
    got = {
        r["cl"]: r.asDict()
        for r in golden_records(
            df, "cl", "id",
            rules={"name": "longest", "bal": "sum", "seg": "min"},
        ).collect()
    }
    assert got[1]["canonical_id"] == 10 and got[1]["n_members"] == 3
    assert got[1]["name"] == "zz-aa"  # len tie vs ab-cd -> larger wins
    assert got[1]["bal"] == 13.0 and got[1]["seg"] == "A"
    assert got[2]["n_members"] == 1 and got[2]["name"] == "solo"
    with pytest.raises(ValueError, match="unknown survivorship rule"):
        golden_records(df, "cl", "id", rules={"name": "mode"})


def test_minhash_estimate_audit_planted(spark):
    """Planted corpus: a near-identical pair plus an unrelated doc.
    The audit's exact score for the pair must sit at the true Jaccard,
    and a perfect-agreement pair (identical text would dedup upstream,
    so use a high-overlap pair) shows est != exact without the verify
    stage catching fire."""
    from moisturizer_spark.operators.dedup import minhash_estimate_audit

    base = (
        "the quick brown fox jumps over the lazy dog while other "
        "animals watch with great interest under the afternoon sun"
    )
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base.replace("lazy", "idle")),
            (3, "completely different words about harbor cranes at night"),
        ],
        "doc_id long, text string",
    )
    row = minhash_estimate_audit(df, num_hashes=16, threshold=0.6, det=True).first()
    assert row["n_candidates"] >= 1
    # the near pair passes exactly; disagreement count is bounded by
    # candidates and the mean error is a sane micro value
    assert row["n_exact_pass"] >= 1
    assert 0 <= row["n_disagree"] <= row["n_candidates"]
    assert 0 <= row["mean_abs_err_micro"] <= 1_000_000
    assert row["max_abs_err_micro"] >= row["mean_abs_err_micro"]


def test_minhash_estimate_audit_identical_docs_zero_error(spark):
    """Two docs with IDENTICAL shingle sets: every signature component
    agrees and exact Jaccard is 1 — both scores 1e6, error 0."""
    from moisturizer_spark.operators.dedup import minhash_estimate_audit

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    row = minhash_estimate_audit(df, num_hashes=16, threshold=0.6, det=True).first()
    assert row["n_candidates"] == 1
    assert row["n_exact_pass"] == 1 and row["n_est_pass"] == 1
    assert row["n_disagree"] == 0
    assert row["mean_abs_err_micro"] == 0 and row["max_abs_err_micro"] == 0
