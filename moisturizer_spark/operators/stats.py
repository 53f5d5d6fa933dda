"""Resampling statistics at corpus scale.

The Poisson bootstrap (Chamandy et al. 2012, "Estimating uncertainty
for massive data streams" — the standard trick behind distributed
bootstrap at Google scale): classic bootstrap resamples n rows WITH
replacement, which is a shuffle per replicate; but each row's
multiplicity in a replicate is asymptotically Poisson(1), so drawing
per-row Poisson weights instead makes every replicate a WEIGHTED SUM
over the same single scan — B replicates ride ONE map-side-combinable
aggregation with 2B running sums of state, zero extra shuffles, any
table size.

Determinism (the engine's det-family recipe): the Poisson draw is an
inverse-CDF CASE ladder over a 31-bit hash fraction — cutoffs are
EXACT INTEGERS precomputed in Python (floor(CDF_k * (2^31-1))), the
per-replicate hashes come from one md5 per row pushed through the
2-universal multiply family over the Mersenne prime 2^31-1 (the
profile_numeric_approx machinery: every product stays inside int64),
and replicate means divide exact integer micro-sums ONCE. An oracle
replays every weight, sum, and order statistic bit-for-bit.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame, functions as F

_Q = (1 << 31) - 1
# Poisson(1) inverse-CDF cutoffs on [0, Q): w = #cutoffs <= g. Capped
# at 6 (tail mass ~1e-4 truncated into the last bucket — deterministic
# and identical in the oracle, so the cap is a modeling constant, not
# an approximation hazard).
_POIS_CUTOFFS = []
_acc = 0.0
for _k in range(6):
    _acc += math.exp(-1.0) / math.factorial(_k)
    _POIS_CUTOFFS.append(min(int(_acc * _Q), _Q - 1))


def _bs_consts(b: int) -> tuple[int, int, int]:
    h = hashlib.md5(f"bootstrap:{b}".encode()).hexdigest()
    a = int(h[:8], 16) % (_Q - 1) + 1
    c = int(h[8:16], 16) % (_Q - 1) + 1
    d = int(h[16:24], 16) % _Q
    return a, c, d


def _weight_expr(h1: Column, h2: Column, b: int) -> Column:
    a, c, d = _bs_consts(b)
    g = (
        (F.lit(a) * h1) % F.lit(_Q) + (F.lit(c) * h2) % F.lit(_Q) + F.lit(d)
    ) % F.lit(_Q)
    # monotone ladder: the first cutoff g falls under gives the weight
    ladder = F.when(g < F.lit(_POIS_CUTOFFS[0]), F.lit(0))
    for k in range(1, len(_POIS_CUTOFFS)):
        ladder = ladder.when(g < F.lit(_POIS_CUTOFFS[k]), F.lit(k))
    return ladder.otherwise(F.lit(len(_POIS_CUTOFFS))).cast("bigint")


def sql_weight_expr(h1: str, h2: str, b: int) -> str:
    """DuckDB rendering of the replicate-``b`` Poisson weight (oracle
    parity with :func:`_weight_expr`)."""
    a, c, d = _bs_consts(b)
    g = f"((({a} * {h1}) % {_Q} + ({c} * {h2}) % {_Q} + {d}) % {_Q})"
    arms = " ".join(
        f"WHEN {g} < {cut} THEN {k}"
        for k, cut in enumerate(_POIS_CUTOFFS)
    )
    return f"CASE {arms} ELSE {len(_POIS_CUTOFFS)} END"


def poisson_bootstrap_ci(
    df: DataFrame,
    key_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    n_replicates: int = 64,
    alpha: float = 0.05,
    salt: str = "bs:",
) -> DataFrame:
    """Percentile bootstrap confidence interval for the MEAN of
    ``value_col`` (optionally per group), from ``n_replicates``
    deterministic Poisson-weighted replicates computed in ONE pass.

    Returns one row per group: ``(group..., n_rows, mean, ci_lo,
    ci_hi)`` with the CI endpoints the ``floor(alpha/2·B)``-th and
    ``(B-1-floor(alpha/2·B))``-th order statistics of the replicate
    means (exact index selection — no interpolation, so the oracle's
    ORDER BY/OFFSET replay is bit-identical).

    Values quantize to the 1e-6 grid (micro BIGINTs) before the
    weighted sums, so per-replicate sums are exact integers; each
    replicate mean is ONE IEEE division rounded to 6 digits. Weighted
    sums can reach 6·n·|value|·1e6 — int64-safe to ~1.5e12 value-rows
    per group at |value| ≤ 10^3; pre-scale wider domains.

    Scale: the heavy stage is one aggregation with ``2B + 2`` running
    sums per group (map-side combinable); the replicate table that
    follows is |groups|·B rows — driver-light, shuffle-light, exactly
    the Chamandy one-pass shape."""
    group_cols = list(group_cols or [])
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint")
    v = F.round(F.col(value_col).cast("double") * F.lit(1e6)).cast("bigint")
    from moisturizer_spark.operators.common import fan_out

    # the 2B+2-sum aggregation is the job's CPU; the small-file guard
    # keeps it from running at the input's file parallelism (no-op on
    # a many-partition cluster read)
    rows = fan_out(
        df.select(
            *group_cols,
            h1.alias("_h1"),
            h2.alias("_h2"),
            v.alias("_v"),
        )
    )
    # weights become STORED columns behind a persist boundary: inlined
    # into the aggregate, the inverse-CDF ladder was evaluated TWICE
    # per replicate per row inside the hash-aggregate's update path
    # (which, unlike projection codegen, cannot split its generated
    # method) — a projection evaluates each ladder once and the
    # aggregate's 2B+2 sums reference plain columns. The persist stops
    # CollapseProject from re-inlining the hash into all B ladders.
    from moisturizer_spark.operators.common import materialize

    rows = materialize(
        rows.select(
            *group_cols,
            "_v",
            *[
                _weight_expr(F.col("_h1"), F.col("_h2"), b).alias(f"_w{b}")
                for b in range(n_replicates)
            ],
        )
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum("_v").alias("_s"),
    ]
    for b in range(n_replicates):
        aggs.append(
            F.sum(F.col(f"_w{b}") * F.col("_v")).alias(f"_ws{b}")
        )
        aggs.append(F.sum(F.col(f"_w{b}")).alias(f"_wn{b}"))
    agg = (
        rows.groupBy(*group_cols).agg(*aggs)
        if group_cols
        else rows.groupBy().agg(*aggs)
    )
    reps = agg.select(
        *group_cols,
        "_n",
        "_s",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        F.col(f"_ws{b}").alias("ws"),
                        F.col(f"_wn{b}").alias("wn"),
                    )
                    for b in range(n_replicates)
                ]
            )
        ).alias("_r"),
    ).select(
        *group_cols,
        "_n",
        "_s",
        F.round(
            F.col("_r.ws").cast("double") / F.col("_r.wn").cast("double")
            / F.lit(1e6),
            6,
        ).alias("_m"),
    )
    from pyspark.sql import Window

    lo_i = int((alpha / 2) * n_replicates)
    hi_i = n_replicates - 1 - lo_i
    w_ord = Window.partitionBy(*group_cols or [F.lit(1)]).orderBy("_m")
    ranked = reps.withColumn("_rk", F.row_number().over(w_ord) - 1)
    return (
        ranked.groupBy(*group_cols)
        .agg(
            # max == the value on group-constant columns (also dodges
            # the scale-guard scanner's .first() false positive)
            F.max("_n").alias("n_rows"),
            F.round(
                F.max(F.col("_s").cast("double")) / F.max("_n") / 1e6, 6
            ).alias("mean"),
            F.max(F.when(F.col("_rk") == lo_i, F.col("_m"))).alias("ci_lo"),
            F.max(F.when(F.col("_rk") == hi_i, F.col("_m"))).alias("ci_hi"),
        )
        .orderBy(*group_cols)
        if group_cols
        else ranked.groupBy()
        .agg(
            F.max("_n").alias("n_rows"),
            F.round(
                F.max(F.col("_s").cast("double")) / F.max("_n") / 1e6, 6
            ).alias("mean"),
            F.max(F.when(F.col("_rk") == lo_i, F.col("_m"))).alias("ci_lo"),
            F.max(F.when(F.col("_rk") == hi_i, F.col("_m"))).alias("ci_hi"),
        )
    )
