

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
