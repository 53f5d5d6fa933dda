"""Data-quality expectations engine: exact violation counting."""

from __future__ import annotations

from pyspark.sql import functions as F

from moisturizer_spark.operators import expectations as X


def _report(df, rules):
    return {r["rule"]: r["violations"] for r in X.check(df, rules).collect()}


def test_all_rule_kinds_count_exactly(spark):
    df = spark.createDataFrame(
        [
            (1, 10, "A", 1),
            (2, 99, "A", 1),      # out of range
            (None, 10, "B", 2),   # null id, bad domain
            (4, None, "A", 2),    # null qty -> range violation
            (5, 10, "A", 3),      # orphan ref
            (5, 10, "A", 3),      # duplicate id 5 (x2) + orphan
        ],
        "id long, qty long, flag string, ref long",
    )
    ref = spark.createDataFrame([(1,), (2,)], "key long")
    got = _report(
        df,
        [
            X.not_null("id"),
            X.in_range("qty", 1, 50),
            X.accepted_values("flag", "A"),
            X.predicate("qty_lt_ref_times_50", F.col("qty") <= F.col("ref") * 50),
            X.unique("id"),
            X.foreign_key("ref", ref, "key"),
        ],
    )
    assert got["not_null(id)"] == 1
    assert got["in_range(qty,1,50)"] == 2  # 99 and NULL
    assert got["accepted_values(flag)"] == 1
    # NULL qty fails (unknown → violation) and 99 > 1*50 fails
    assert got["qty_lt_ref_times_50"] == 2
    assert got["unique(id)"] == 2  # both rows of the duplicated key count
    assert got["foreign_key(ref)"] == 2  # two rows with ref=3


def test_clean_table_reports_zeroes(spark):
    df = spark.createDataFrame([(1, 5), (2, 6)], "id long, v long")
    got = _report(df, [X.not_null("id"), X.in_range("v", 0, 10), X.unique("id")])
    assert set(got.values()) == {0}


def test_report_preserves_declaration_order(spark):
    df = spark.createDataFrame([(1,)], "id long")
    rules = [X.unique("id"), X.not_null("id")]
    names = [r["rule"] for r in X.check(df, rules).collect()]
    assert names == ["unique(id)", "not_null(id)"]


def test_profile_numeric_stats(spark):
    from pyspark.sql import functions as F

    from moisturizer_spark.operators.expectations import profile_numeric

    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, None), (2.0, 30.0), (None, 10.0)],
        "a double, b double",
    )
    got = {r["column"]: r.asDict() for r in profile_numeric(df, ["a", "b"]).collect()}
    assert got["a"]["n_rows"] == 4 and got["a"]["n_filled"] == 3
    assert got["a"]["ndv"] == 2 and got["a"]["min_value"] == 1.0
    assert got["a"]["max_value"] == 2.0 and got["a"]["sum_value"] == 5.0
    assert got["b"]["ndv"] == 2 and got["b"]["sum_value"] == 50.0
    # one aggregation job regardless of column count: single Exchange
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        profile_numeric(df, ["a", "b"]).explain("formatted")
    import re

    n = sum(
        1
        for m in re.finditer(r"^\(\d+\) (ReusedExchange|Exchange)", buf.getvalue(), re.M)
        if m.group(1) == "Exchange"
    )
    assert n <= 3


def test_profile_numeric_overflow_raises_loudly(spark):
    """A value outside the decimal range must FAIL, never silently
    skew the stats: under ANSI the cast itself raises; with ANSI off
    (the non-ANSI deployment the r6 ADVICE flagged) the raw-vs-cast
    count guard raises instead. Either way: loud."""
    import pytest

    from moisturizer_spark.operators.expectations import (
        profile_numeric,
        profile_numeric_approx,
    )

    bad = spark.createDataFrame([(1.0,), (1e14,)], "x double")
    for fn in (profile_numeric, profile_numeric_approx):
        with pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE"):
            fn(bad, ["x"]).collect()
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        for fn in (profile_numeric, profile_numeric_approx):
            with pytest.raises(Exception, match="widen the decimal"):
                fn(bad, ["x"]).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


def test_profile_numeric_approx_accuracy_and_parity(spark):
    """MinCount ndv estimate: within the estimator's statistical band
    (~1/sqrt(64) relative) of truth at two very different cardinalities,
    bit-identical to the DuckDB oracle rendering, and exact counts /
    min / max / sum agree with the exact profile."""
    import duckdb
    from pyspark.sql import functions as F

    from moisturizer_spark.operators.expectations import (
        profile_numeric,
        profile_numeric_approx,
        sql_ndv_est,
    )

    df = spark.range(20000).select(
        (F.col("id") % 5000).cast("double").alias("a"),
        (F.col("id") % 37).cast("double").alias("b"),
    )
    approx = {
        r["column"]: r.asDict()
        for r in profile_numeric_approx(df, ["a", "b"]).collect()
    }
    exact = {
        r["column"]: r.asDict()
        for r in profile_numeric(df, ["a", "b"]).collect()
    }
    for c, truth in (("a", 5000), ("b", 37)):
        assert abs(approx[c]["ndv_est"] - truth) <= 0.45 * truth, (
            c,
            approx[c]["ndv_est"],
        )
        for k in ("n_rows", "n_filled", "min_value", "max_value", "sum_value"):
            assert approx[c][k] == exact[c][k], (c, k)
    con = duckdb.connect()
    con.register("t", df.toPandas())
    for c in ("a", "b"):
        duck = con.execute(f"SELECT {sql_ndv_est(c)} FROM t").fetchone()[0]
        assert duck == approx[c]["ndv_est"], (c, duck)


def test_profile_numeric_approx_bounded_state(spark):
    """The approx profile's aggregation must carry NO distinct-expand:
    the plan has no 'distinct' aggregate expressions (the exact
    profile's count_distinct forces a two-phase expand) — the state is
    k doubles per column, which is what makes it the 100 TB path."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from moisturizer_spark.operators.expectations import (
        profile_numeric_approx,
    )

    df = spark.range(100).select((F.col("id") % 7).cast("double").alias("a"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        profile_numeric_approx(df, ["a"]).explain("formatted")
    plan = buf.getvalue()
    assert "Expand" not in plan
    assert "distinct" not in plan.lower().replace("count_distinct", "")


def test_psi_report_detects_planted_shift(spark):
    """A genuinely shifted current snapshot must trip the drift flag;
    an identically-distributed one must not — and the report is
    deterministic (exact re-run equality)."""
    from pyspark.sql import functions as F

    from moisturizer_spark.operators.expectations import psi_report

    ref = spark.range(5000).select(
        ((F.col("id") * 37 % 1000).cast("double") / 10).alias("x"),
        ((F.col("id") * 11 % 100).cast("double")).alias("y"),
    )
    same = spark.range(5000, 10000).select(
        ((F.col("id") * 37 % 1000).cast("double") / 10).alias("x"),
        ((F.col("id") * 11 % 100).cast("double")).alias("y"),
    )
    shifted = same.select(
        (F.col("x") + F.lit(60.0)).alias("x"), F.col("y")
    )
    calm = {r["column"]: r for r in psi_report(ref, same, ["x", "y"]).collect()}
    assert not calm["x"]["drift"] and not calm["y"]["drift"], calm
    hot = {r["column"]: r
           for r in psi_report(ref, shifted, ["x", "y"]).collect()}
    assert hot["x"]["drift"] and hot["x"]["psi"] > 1.0, hot["x"]
    assert not hot["y"]["drift"]
    again = {r["column"]: r
             for r in psi_report(ref, shifted, ["x", "y"]).collect()}
    assert {k: v.asDict() for k, v in hot.items()} == {
        k: v.asDict() for k, v in again.items()
    }


def test_ks_report_matches_scipy_style_replay(spark):
    import random
    from collections import Counter

    from moisturizer_spark.operators.expectations import ks_report

    rng = random.Random(7)
    a = [round(rng.gauss(0, 1), 2) for _ in range(300)]
    b = [round(rng.gauss(0.5, 1.2), 2) for _ in range(250)]
    ref = spark.createDataFrame([(v,) for v in a], "x double")
    cur = spark.createDataFrame([(v,) for v in b], "x double")
    r = ks_report(ref, cur, "x").collect()[0]

    # exact integer replay on the micro grid
    am = Counter(round(v * 1e6) for v in a)
    bm = Counter(round(v * 1e6) for v in b)
    vals = sorted(set(am) | set(bm))
    fr = fc = 0
    best = (-1, None)
    for v in vals:
        fr += am.get(v, 0)
        fc += bm.get(v, 0)
        d = abs(fr * len(b) - fc * len(a))
        if d >= best[0]:
            best = (d, v)
    assert (r["n_ref"], r["n_cur"]) == (300, 250)
    assert r["ks"] == round(best[0] / (300 * 250), 6)
    assert r["ks_at"] == best[1]
    # sanity: the shift is real
    assert r["ks"] > 0.1


def test_ks_report_identical_distributions_zero(spark):
    from moisturizer_spark.operators.expectations import ks_report

    df = spark.createDataFrame([(float(i % 7),) for i in range(70)], "x double")
    r = ks_report(df, df, "x").collect()[0]
    assert r["ks"] == 0.0


def test_ks_report_excludes_nulls(spark):
    """Planted NULLs (on one side only, to be maximally asymmetric):
    the statistic and side counts must equal the NULL-free computation —
    NULLs have no place on an empirical CDF, and Spark (NULLS FIRST)
    vs DuckDB (NULLS LAST) window ordering would otherwise make the
    documented oracle replay engine-dependent."""
    from moisturizer_spark.operators.expectations import ks_report

    a = [float(i % 5) for i in range(50)]
    b = [float(i % 7) for i in range(70)]
    ref = spark.createDataFrame([(v,) for v in a], "x double")
    cur_clean = spark.createDataFrame([(v,) for v in b], "x double")
    cur_nulls = spark.createDataFrame(
        [(v,) for v in b] + [(None,)] * 13, "x double"
    )
    clean = ks_report(ref, cur_clean, "x").collect()[0]
    dirty = ks_report(ref, cur_nulls, "x").collect()[0]
    assert dirty.asDict() == clean.asDict()
    assert (dirty["n_ref"], dirty["n_cur"]) == (50, 70)


def test_chi2_report_matches_python_replay(spark):
    import random
    from collections import Counter

    from moisturizer_spark.operators.expectations import chi2_report

    rng = random.Random(19)
    rows = [
        (f"a{rng.randrange(3)}", f"b{rng.randrange(4)}") for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi2_report(df, "a", "b").collect()[0]
    n = len(rows)
    ca, cb, co = Counter(), Counter(), Counter()
    for a, b in rows:
        ca[a] += 1
        cb[b] += 1
        co[(a, b)] += 1
    t_nano = sum(
        round((o * n - ca[a] * cb[b]) ** 2 / (n * ca[a] * cb[b]) * 1e9)
        for (a, b), o in co.items()
    )
    e_nano = sum(round(ca[a] * cb[b] / n * 1e9) for (a, b) in co)
    chi2 = round((t_nano + (n * 10**9 - e_nano)) / 1e9, 6)
    assert r["chi2"] == chi2
    assert (r["n_rows"], r["dof"]) == (500, 6)


def test_chi2_report_independent_grid_is_zero(spark):
    from moisturizer_spark.operators.expectations import chi2_report

    rows = [(a, b) for a in "xy" for b in "uv" for _ in range(25)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi2_report(df, "a", "b").collect()[0]
    assert r["chi2"] == 0.0 and r["dof"] == 1


def test_chi2_report_missing_cell_mass_counted(spark):
    """A structurally-empty cell (a2 never meets b2) must contribute its
    expected mass — scipy's chi2_contingency agrees on this grid."""
    from moisturizer_spark.operators.expectations import chi2_report

    rows = [("a1", "b1")] * 10 + [("a1", "b2")] * 10 + [("a2", "b1")] * 10
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi2_report(df, "a", "b").collect()[0]
    # marginals: a1=20,a2=10 ; b1=20,b2=10 ; N=30
    # e: (a1,b1)=13.33,(a1,b2)=6.67,(a2,b1)=6.67,(a2,b2)=3.33
    # chi2 = (10-13.33)^2/13.33 + (10-6.67)^2/6.67 + (10-6.67)^2/6.67
    #        + (0-3.33)^2/3.33 = 0.8333+1.6667+1.6667+3.3333 = 7.5
    assert abs(r["chi2"] - 7.5) < 1e-6


def test_fd_report_pass_fail_and_null_handling(spark):
    from moisturizer_spark.operators.expectations import fd_report

    df = spark.createDataFrame(
        [
            (1, "a"), (1, "a"),          # key 1: determined
            (2, "x"), (2, "y"), (2, "z"),  # key 2: 3 distinct values
            (3, None),                    # NULL dependent: ignored
        ],
        "k long, v string",
    )
    r = fd_report(df, "k", "v").first()
    # key 3 vanishes entirely (only a NULL dependent): 2 keys measured
    assert r["relation"] == "k->v"
    assert r["n_keys"] == 2
    assert r["n_violating_keys"] == 1
    assert r["max_distinct"] == 3
    assert r["violation_permille"] == 500

    clean = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    r2 = fd_report(clean, "k", "v", relation="pk").first()
    assert (r2["relation"], r2["n_violating_keys"], r2["violation_permille"]) == ("pk", 0, 0)
