"""Function-namespace sanity: expressions compute and agree with Python."""

from __future__ import annotations

from pyspark.sql import Row

from moisturizer_spark import functions as MF


def test_ngrams_and_tokens(spark):
    df = spark.createDataFrame([Row(text="Ab  cd")])
    row = df.select(
        MF.ngrams_col(df.text, 2).alias("g"),
        MF.tokens_col(df.text).alias("t"),
        MF.bpe_tokens_col(df.text).alias("b"),
    ).first()
    assert set(row["g"]) == {"ab", "b ", " c", "cd"}
    assert row["t"] == ["ab", "cd"]
    assert row["b"] == ["ab", " cd"]


def test_row_fingerprint(spark):
    df = spark.createDataFrame([Row(a="x", b=1), Row(a="x", b=1), Row(a="y", b=2)])
    fps = [r[0] for r in df.select(MF.row_fingerprint("a", "b")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_content_sha_matches_hashlib(spark):
    import hashlib

    df = spark.createDataFrame([Row(c="hello")])
    got = df.select(MF.content_sha(df.c).alias("h")).first()["h"]
    assert got == hashlib.sha256(b"hello").hexdigest()


def test_cosine_similarity(spark):
    df = spark.createDataFrame(
        [Row(a=[1.0, 0.0], b=[1.0, 0.0]), Row(a=[1.0, 0.0], b=[0.0, 1.0])]
    )
    sims = [r[0] for r in df.select(MF.cosine_similarity_col(df.a, df.b)).collect()]
    assert abs(sims[0] - 1.0) < 1e-12 and abs(sims[1]) < 1e-12


def test_median_udaf_template_matches_builtin(spark):
    # the UDAF extension-point template must agree with the JVM median
    import pyspark.sql.functions as F

    from moisturizer_spark.functions import median_udaf

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 9), ("b", 4), ("b", 6)], "k string, v long"
    )
    got = {
        r["k"]: r["m"]
        for r in df.groupBy("k").agg(median_udaf()(F.col("v")).alias("m")).collect()
    }
    assert got == {"a": 2.0, "b": 5.0}


def test_term_counts_udtf_lateral_expansion(spark):
    from moisturizer_spark.functions import term_counts_udtf

    spark.udtf.register("term_counts_t", term_counts_udtf())
    spark.createDataFrame(
        [(1, "Red red BLUE!"), (2, ""), (3, None)],
        "doc_id long, text string",
    ).createOrReplaceTempView("_udtf_t_docs")
    rows = spark.sql(
        "SELECT t.* FROM _udtf_t_docs d, "
        "LATERAL term_counts_t(d.doc_id, d.text) t ORDER BY doc_id, term"
    ).collect()
    assert [(r["doc_id"], r["term"], r["n"]) for r in rows] == [
        (1, "blue", 1),
        (1, "red", 2),
    ]  # empty/null docs expand to zero rows; punctuation stripped


# -- American Soundex (operators/phonetic.py) ---------------------------------


def test_soundex_nara_vectors_both_engines(spark):
    """The National Archives' published test vectors — including the
    h/w-transparency cases (ashcraft), the first-letter-run drop
    (pfister), and the vowel-separator rule (tymczak) — must hold in
    BOTH renderings generated from the shared rule table."""
    import duckdb

    from moisturizer_spark.operators.phonetic import (
        soundex_col,
        soundex_sql,
    )

    vectors = {
        "robert": "R163", "rupert": "R163", "ashcraft": "A261",
        "ashcroft": "A261", "tymczak": "T522", "pfister": "P236",
        "honeyman": "H555", "jackson": "J250", "washington": "W252",
        "lee": "L000", "gutierrez": "G362", "vandeusen": "V532",
    }
    df = spark.createDataFrame([(w,) for w in vectors], "w string")
    got_spark = dict(
        df.select("w", soundex_col("w").alias("c")).collect()
    )
    assert got_spark == vectors
    con = duckdb.connect()
    for w, want in vectors.items():
        got = con.execute(f"SELECT {soundex_sql(repr(w))}").fetchone()[0]
        assert got == want, (w, got, want)
