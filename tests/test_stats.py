"""Poisson bootstrap: exact replay + statistical sanity."""

from __future__ import annotations

import hashlib
import math


def _replay(rows, n_replicates=64, alpha=0.05, salt="bs:"):
    """Unbounded-int Python replay of poisson_bootstrap_ci (global)."""
    from moisturizer_spark.operators.stats import _POIS_CUTOFFS, _bs_consts

    Q = (1 << 31) - 1
    ms = []
    micro = {k: int(math.floor(v * 1e6 + 0.5)) if v >= 0
             else -int(math.floor(-v * 1e6 + 0.5))
             for k, v in rows}
    hs = {}
    for k, _ in rows:
        h = hashlib.md5(f"{salt}{k}".encode()).hexdigest()
        hs[k] = (int(h[:8], 16), int(h[8:16], 16))
    for b in range(n_replicates):
        a, c, d = _bs_consts(b)
        ws = wn = 0
        for k, _ in rows:
            h1, h2 = hs[k]
            g = ((a * h1) % Q + (c * h2) % Q + d) % Q
            w = len(_POIS_CUTOFFS)
            for j, cut in enumerate(_POIS_CUTOFFS):
                if g < cut:
                    w = j
                    break
            ws += w * micro[k]
            wn += w
        ms.append(round(ws / wn / 1e6, 6))
    ms.sort()
    lo_i = int((alpha / 2) * n_replicates)
    return ms[lo_i], ms[n_replicates - 1 - lo_i]


def test_bootstrap_ci_matches_python_replay(spark):
    from moisturizer_spark.operators.stats import poisson_bootstrap_ci
    from pyspark.sql import functions as F

    df = spark.range(3000).select(
        F.col("id").alias("k"),
        ((F.col("id") * 37 % 997).cast("double") / 10).alias("x"),
    )
    rows = [(r["k"], r["x"]) for r in df.collect()]
    lo, hi = _replay(rows)
    got = poisson_bootstrap_ci(df, "k", "x").collect()[0]
    assert (got["ci_lo"], got["ci_hi"]) == (lo, hi)
    assert got["ci_lo"] <= got["mean"] <= got["ci_hi"]


def test_bootstrap_ci_width_shrinks_with_n(spark):
    """Statistical sanity: the CI narrows ~1/sqrt(n) and brackets the
    true mean at both sizes (deterministic draws — exact re-runs)."""
    from moisturizer_spark.operators.stats import poisson_bootstrap_ci
    from pyspark.sql import functions as F

    widths = {}
    for n in (1000, 16000):
        df = spark.range(n).select(
            F.col("id").alias("k"),
            ((F.col("id") % 100).cast("double")).alias("x"),
        )
        r = poisson_bootstrap_ci(df, "k", "x").collect()[0]
        assert r["ci_lo"] < 49.5 < r["ci_hi"] or abs(r["mean"] - 49.5) < 1
        widths[n] = r["ci_hi"] - r["ci_lo"]
    ratio = widths[1000] / widths[16000]
    assert 2.0 < ratio < 8.0, widths  # sqrt(16) = 4 expected


def _auc_ref(pairs):
    """Brute-force AUC over (score, label) pairs: P(s+ > s-) + ties/2."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    return (2 * wins + ties), len(pos), len(neg)


def test_auc_exact_matches_brute_force_with_ties(spark):
    import random

    from moisturizer_spark.operators.stats import auc_exact

    rng = random.Random(41)
    # coarse integer score grid => plenty of cross-class ties, the case
    # midranks exist for
    rows = [(rng.randrange(8) + (3 if rng.random() < 0.5 else 0),
             1 if rng.random() < 0.4 else 0) for _ in range(300)]
    df = spark.createDataFrame(rows, "score bigint, y int")
    got = auc_exact(df, "score", "y").collect()[0]
    u2, n1, n0 = _auc_ref(rows)
    assert (got["n_pos"], got["n_neg"], got["u2"]) == (n1, n0, u2)
    assert got["auc"] == round(u2 / (2 * n1 * n0), 6)


def test_auc_exact_grouped_and_degenerate(spark):
    from moisturizer_spark.operators.stats import auc_exact

    rows = [
        # group a: perfect separation -> AUC 1.0
        ("a", 10, 1), ("a", 9, 1), ("a", 1, 0), ("a", 2, 0),
        # group b: anti-separation -> AUC 0.0
        ("b", 1, 1), ("b", 9, 0),
        # group c: positives only -> NULL auc, counts still reported
        ("c", 5, 1), ("c", 6, 1),
    ]
    df = spark.createDataFrame(rows, "g string, score bigint, y int")
    got = {r["g"]: r for r in auc_exact(df, "score", "y", ["g"]).collect()}
    assert got["a"]["auc"] == 1.0
    assert got["b"]["auc"] == 0.0
    assert got["c"]["auc"] is None
    assert (got["c"]["n_pos"], got["c"]["n_neg"]) == (2, 0)


def test_auc_exact_all_ties_is_half(spark):
    from moisturizer_spark.operators.stats import auc_exact

    df = spark.createDataFrame(
        [(7, 1)] * 5 + [(7, 0)] * 3, "score bigint, y int"
    )
    got = auc_exact(df, "score", "y").collect()[0]
    assert got["auc"] == 0.5


def test_seasonal_naive_eval_planted(spark):
    from moisturizer_spark.operators.stats import seasonal_naive_eval

    rows = [(m, v) for m, v in enumerate([10, 20, 30, 12, 26, 0], start=1)]
    df = spark.createDataFrame(rows, "t int, v long")
    got = {
        r["t"]: (r["actual"], r["forecast"], r["err"], r["abs_err"], r["ape"])
        for r in seasonal_naive_eval(df, "t", "v", season=3).collect()
    }
    assert got == {
        4: (12, 10, 2, 2, round(2 / 12, 6)),
        5: (26, 20, 6, 6, round(6 / 26, 6)),
        6: (0, 30, -30, 30, None),  # zero actual -> NULL ape, stated
    }


def test_seasonal_naive_eval_grouped_independent_series(spark):
    from moisturizer_spark.operators.stats import seasonal_naive_eval

    rows = [("a", 1, 5), ("a", 2, 7), ("b", 1, 100), ("b", 2, 90)]
    df = spark.createDataFrame(rows, "g string, t int, v long")
    got = {
        (r["g"], r["t"]): r["forecast"]
        for r in seasonal_naive_eval(
            df, "t", "v", season=1, group_cols=["g"]
        ).collect()
    }
    assert got == {("a", 2): 5, ("b", 2): 100}


def test_pmi_table_matches_python_replay(spark):
    import math
    import random
    from collections import Counter

    from moisturizer_spark.operators.stats import pmi_table

    rng = random.Random(13)
    rows = [
        (f"s{rng.randrange(4)}", f"l{rng.randrange(3)}") for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "a string, b string")
    got = {
        (r["a"], r["b"]): (r["n_pairs"], r["pmi_bits"])
        for r in pmi_table(df, "a", "b").collect()
    }
    n = len(rows)
    ca, cb, cab = Counter(), Counter(), Counter()
    for a, b in rows:
        ca[a] += 1
        cb[b] += 1
        cab[(a, b)] += 1
    for (a, b), nab in cab.items():
        nano = round(math.log2(nab * n) * 1e9) - round(
            math.log2(ca[a] * cb[b]) * 1e9
        )
        assert got[(a, b)] == (nab, round(nano / 1e9, 6))


def test_pmi_table_independence_is_zero(spark):
    """A perfectly independent 2x2 grid has PMI exactly 0 in every cell."""
    from moisturizer_spark.operators.stats import pmi_table

    rows = [(a, b) for a in ("x", "y") for b in ("u", "v") for _ in range(5)]
    df = spark.createDataFrame(rows, "a string, b string")
    assert all(
        r["pmi_bits"] == 0.0 for r in pmi_table(df, "a", "b").collect()
    )


def test_quantile_normalize_dims_planted(spark):
    from moisturizer_spark.operators.stats import quantile_normalize_dims

    df = spark.createDataFrame(
        [(1, [10.0, 5.0]), (2, [30.0, 5.0]), (3, [20.0, 5.0]),
         (4, [40.0, 5.0])],
        "id bigint, v array<double>",
    )
    got = {
        (r["id"], r["dim"]): r["q"]
        for r in quantile_normalize_dims(df, "id", "v", 2).collect()
    }
    # dim 0 ranks: 10<20<30<40 -> ids 1,3,2,4 -> q = 1/8, 3/8, 5/8, 7/8
    assert got[(1, 0)] == 0.125 and got[(3, 0)] == 0.375
    assert got[(2, 0)] == 0.625 and got[(4, 0)] == 0.875
    # dim 1 all-ties: the (value, id) total order spreads them 1..4
    assert [got[(i, 1)] for i in (1, 2, 3, 4)] == [0.125, 0.375, 0.625, 0.875]


def test_quantile_normalize_dims_is_uniform(spark):
    """Any input distribution maps to the same uniform midrank grid."""
    import random

    from moisturizer_spark.operators.stats import quantile_normalize_dims

    rng = random.Random(3)
    df = spark.createDataFrame(
        [(i, [rng.expovariate(1.0)]) for i in range(50)],
        "id bigint, v array<double>",
    )
    qs = sorted(
        r["q"] for r in quantile_normalize_dims(df, "id", "v", 1).collect()
    )
    assert qs == [round((2 * k - 1) / 100, 6) for k in range(1, 51)]


def test_group_ols_exact_line(spark):
    from moisturizer_spark.operators.stats import group_ols

    # y = 3x + 7 exactly -> slope 3, intercept 7, r2 = 1
    rows = [("g", x, 3 * x + 7) for x in range(10)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    r = group_ols(df, ["g"], "x", "y").collect()[0]
    assert (r["slope"], r["intercept"], r["r2"]) == (3.0, 7.0, 1.0)
    assert r["n_rows"] == 10


def test_group_ols_matches_numpy(spark):
    import random

    import numpy as np

    from moisturizer_spark.operators.stats import group_ols

    rng = random.Random(11)
    rows = [("a", x, 2 * x + rng.randrange(-50, 50)) for x in range(50)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    r = group_ols(df, ["g"], "x", "y").collect()[0]
    xs = np.array([x for _, x, _ in rows], dtype=float)
    ys = np.array([y for _, _, y in rows], dtype=float)
    slope, intercept = np.polyfit(xs, ys, 1)
    corr = np.corrcoef(xs, ys)[0, 1]
    assert abs(r["slope"] - slope) < 1e-5
    assert abs(r["intercept"] - intercept) < 1e-4
    assert abs(r["r2"] - corr ** 2) < 1e-5


def test_group_ols_degenerate_groups_are_null(spark):
    from moisturizer_spark.operators.stats import group_ols

    rows = [("const_x", 5, 1), ("const_x", 5, 9), ("single", 1, 1)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r["g"]: r for r in group_ols(df, ["g"], "x", "y").collect()}
    for g in ("const_x", "single"):
        assert got[g]["slope"] is None and got[g]["r2"] is None


# -- Theil–Sen robust trend ---------------------------------------------------


def test_theil_sen_exact_line_and_lower_median(spark):
    from moisturizer_spark.operators.stats import theil_sen

    # y = 3x + 7 exactly: every pairwise slope is 3.0 → 3_000_000 micro
    rows = [("g", x, 3 * x + 7) for x in range(1, 9)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = theil_sen(df, ["g"], "x", "y").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_points"], r["n_pairs"], r["slope_micro"]) == (8, 28, 3_000_000)


def test_theil_sen_shrugs_off_outlier_where_ols_moves(spark):
    from moisturizer_spark.operators.stats import group_ols, theil_sen

    rows = [("g", x, 10 * x) for x in range(1, 12)]
    rows[10] = ("g", 11, 1_000_000)  # one wild month at the series end
    df = spark.createDataFrame(rows, "g string, x long, y long")
    ts = theil_sen(df, ["g"], "x", "y").first()
    ols = group_ols(df, ["g"], "x", "y").first()
    # the pairwise median stays on the clean trend (slope 10)
    assert ts["slope_micro"] == 10_000_000
    assert abs(ols["slope"] - 10) > 1000  # least squares is dragged away


def test_theil_sen_single_point_group_is_null(spark):
    from moisturizer_spark.operators.stats import theil_sen

    df = spark.createDataFrame(
        [("a", 1, 5), ("b", 1, 2), ("b", 3, 8)], "g string, x long, y long"
    )
    got = {r["g"]: r for r in theil_sen(df, ["g"], "x", "y").collect()}
    assert got["a"]["slope_micro"] is None and got["a"]["n_pairs"] is None
    assert got["b"]["slope_micro"] == 3_000_000


def test_theil_sen_negative_slope_half_away_rounding(spark):
    from moisturizer_spark.operators.stats import theil_sen

    # two points, dy = -1 over dx = 2: slope -0.5 → half-away = -500000
    df = spark.createDataFrame(
        [("g", 0, 1), ("g", 2, 0)], "g string, x long, y long"
    )
    assert theil_sen(df, ["g"], "x", "y").first()["slope_micro"] == -500_000


def test_theil_sen_refuses_unaggregated_series(spark):
    import pytest

    from moisturizer_spark.operators.stats import theil_sen

    df = spark.createDataFrame(
        [("g", i, i) for i in range(20)], "g string, x long, y long"
    )
    with pytest.raises(ValueError, match="quadratic"):
        theil_sen(df, ["g"], "x", "y", max_points=10)


def test_theil_sen_matches_python_replay(spark):
    from moisturizer_spark.operators.stats import theil_sen

    rows = [("g", x, (x * 37) % 11 + 2 * x) for x in range(1, 13)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = theil_sen(df, ["g"], "x", "y").first()

    def half_away(num, den):  # num any sign, den > 0
        if num >= 0:
            return (2 * num * 1_000_000 + den) // (2 * den)
        return -((2 * -num * 1_000_000 + den) // (2 * den))

    slopes = sorted(
        (half_away(y2 - y1, x2 - x1), x1, x2)
        for i, (_, x1, y1) in enumerate(rows)
        for (_, x2, y2) in rows[i + 1:]
    )
    n = len(slopes)
    assert got["n_pairs"] == n
    assert got["slope_micro"] == slopes[(n + 1) // 2 - 1][0]
