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
