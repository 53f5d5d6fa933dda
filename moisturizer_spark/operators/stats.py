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


def _weight_expr_sql(h1: str, h2: str, b: int) -> str:
    """Spark-SQL rendering of the replicate-``b`` Poisson weight.

    Semantically identical to the former Column-by-Column construction
    (same ``((a*h1) % Q + (c*h2) % Q + d) % Q`` hash and the same
    monotone CASE ladder); built as ONE string so plan construction is
    a single JVM parse instead of ~30 py4j round trips per replicate —
    at B=64 the old path spent multiple driver seconds just building
    the projection (optimization round; guide §4's "control how much
    crosses the Python boundary" applied to plan-build time).

    The ladder itself is single-sourced from :func:`sql_weight_expr`
    (ADVICE r10: the Spark and DuckDB renderings duplicated the
    identical g-hash + CASE string and could silently drift); the only
    Spark-side difference is the BIGINT cast the downstream integer
    sums require."""
    return f"CAST({sql_weight_expr(h1, h2, b)} AS BIGINT)"


def sql_weight_expr(h1: str, h2: str, b: int) -> str:
    """Engine-neutral SQL rendering of the replicate-``b`` Poisson
    weight — the single source of the g-hash + monotone CASE ladder,
    consumed verbatim by the DuckDB oracle and (BIGINT-cast) by the
    Spark plan via :func:`_weight_expr_sql`, so the two renderings
    cannot drift."""
    a, c, d = _bs_consts(b)
    g = f"((({a} * {h1}) % {_Q} + ({c} * {h2}) % {_Q} + {d}) % {_Q})"
    # monotone ladder: the first cutoff g falls under gives the weight
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

    gq = [f"`{c}`" for c in group_cols]
    rows = materialize(
        rows.selectExpr(
            *gq,
            "_v",
            *[
                f"{_weight_expr_sql('_h1', '_h2', b)} AS _w{b}"
                for b in range(n_replicates)
            ],
        )
    )
    aggs = [
        F.expr("CAST(COUNT(1) AS BIGINT) AS _n"),
        F.expr("SUM(_v) AS _s"),
    ]
    for b in range(n_replicates):
        aggs.append(F.expr(f"SUM(_w{b} * _v) AS _ws{b}"))
        aggs.append(F.expr(f"SUM(_w{b}) AS _wn{b}"))
    agg = (
        rows.groupBy(*group_cols).agg(*aggs)
        if group_cols
        else rows.groupBy().agg(*aggs)
    )
    rep_structs = ", ".join(
        f"struct({b} AS b, _ws{b} AS ws, _wn{b} AS wn)"
        for b in range(n_replicates)
    )
    reps = agg.selectExpr(
        *gq,
        "_n",
        "_s",
        f"explode(array({rep_structs})) AS _r",
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


def auc_exact(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """EXACT ROC-AUC via the Mann-Whitney rank-sum identity — model
    evaluation as one aggregation chain, no threshold sweep, no
    sampling: ``AUC = P(score_pos > score_neg) + P(score_pos =
    score_neg)/2`` over all positive×negative pairs, computed WITHOUT
    forming pairs. Per distinct score the positive/negative counts
    aggregate; a cumulative window over scores ascending gives each
    score the negatives strictly below it; then ``2U = Σ_scores
    np·(2·nn_below + nn_tied)`` — all exact integers (ties handled by
    the midrank convention exactly, not approximately) — and ``AUC =
    2U / (2·n1·n0)`` is one rounded IEEE division of exact integers,
    identical across engines. Oracle-replayable line by line.

    ``label_col`` must be 1 (positive) / 0 (negative); rows with other
    or NULL labels are the caller's job to exclude. Prefer integer
    ``score_col`` grids (the workload's micro/nano convention) so score
    equality — which drives tie handling — is exact, not float-lucky.

    Returns per group: ``n_pos``, ``n_neg``, ``u2`` (the integer 2U
    statistic), ``auc`` (rounded to 6; NULL when a group lacks one of
    the classes — stated, not NaN). Scale: the per-score aggregation is
    map-side combinable and shrinks data to the distinct-score grain
    before the window; the window partitions per group (a GLOBAL sort
    only for the ungrouped single-report case, over distinct scores —
    bounded by the score grid, stated). ``2U ≤ n1·n0·2 < 2^63`` for any
    n1·n0 < 4.6e18 — beyond int64 only past ~2e9 rows per class."""
    from pyspark.sql import Window

    g = list(group_cols or [])
    per = df.groupBy(*g, score_col).agg(
        F.sum(F.when(F.col(label_col) == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("_np"),
        F.sum(F.when(F.col(label_col) == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("_nn"),
    )
    w = (
        Window.partitionBy(*g)
        .orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = per.withColumn(
        "_nnb", F.coalesce(F.sum("_nn").over(w), F.lit(0).cast("bigint"))
    )
    agg = (cum.groupBy(*g) if g else cum.groupBy()).agg(
        F.sum("_np").cast("bigint").alias("n_pos"),
        F.sum("_nn").cast("bigint").alias("n_neg"),
        F.sum(
            F.col("_np") * (F.lit(2) * F.col("_nnb") + F.col("_nn"))
        )
        .cast("bigint")
        .alias("u2"),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.round(
            F.col("u2").cast("double")
            / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg")),
            6,
        ),
    )
    out = agg.select(*g, "n_pos", "n_neg", "u2", auc.alias("auc"))
    return out.orderBy(*g) if g else out


def seasonal_naive_eval(
    df: DataFrame,
    time_col: str,
    value_col: str,
    season: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Forecast-quality baseline as one window pass: the SEASONAL NAIVE
    forecast (value of ``season`` periods ago — the baseline every real
    forecasting model must beat; Hyndman & Athanasopoulos call beating
    it the minimum bar) evaluated against actuals. For every period
    with a season-back actual: ``forecast``, signed ``err``, ``abs_err``,
    and ``ape`` (absolute percentage error, rounded to 6; NULL on a zero
    actual — stated, not NaN).

    ``df`` must be ONE ROW PER (group, period) — aggregate first (the
    series frame is calendar-sized, so the ordered window is bounded at
    any corpus size; state that in the caller the way the rolling-corr
    query does). Keep ``value_col`` on an exact integer grid (cents,
    micros) so errors are exact and engine-independent; the only float
    op is the rounded APE division. Lags ride
    ``lag(season) OVER (PARTITION BY group ORDER BY time)`` — one
    shuffle on the group key (or the documented bounded global sort,
    ungrouped)."""
    from pyspark.sql import Window

    g = list(group_cols or [])
    w = Window.partitionBy(*g).orderBy(time_col)
    fc = F.lag(value_col, season).over(w)
    out = df.select(
        *g,
        time_col,
        F.col(value_col).alias("actual"),
        fc.alias("forecast"),
    ).filter(F.col("forecast").isNotNull())
    return out.select(
        *g,
        time_col,
        "actual",
        "forecast",
        (F.col("actual") - F.col("forecast")).alias("err"),
        F.abs(F.col("actual") - F.col("forecast")).alias("abs_err"),
        F.when(
            F.col("actual") != 0,
            F.round(
                F.abs(F.col("actual") - F.col("forecast")).cast("double")
                / F.abs(F.col("actual")).cast("double"),
                6,
            ),
        ).alias("ape"),
    )


def pmi_table(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Pointwise mutual information between two categorical columns —
    the feature-association screen (which sources skew toward which
    languages; which labels leak which metadata): per (a, b) cell,
    ``pmi = log2( n_ab·N / (n_a·n_b) )`` in bits, positive = the pair
    co-occurs more than independence predicts.

    Determinism: the nano-bit recipe — both log2 terms are logs of
    EXACT BIGINT products (``n_ab·N`` and ``n_a·n_b``, in-range below
    ~3·10^9 rows), each rounded to integer nano-bits before the exact
    difference; the output divides that integer by 1e9 once. Scale:
    one cell-grain count (map-side combinable) plus two marginal
    counts that BROADCAST back onto the cells (marginals are
    category-grain — tiny by definition of categorical); N is a driver
    scalar inlined as a literal (the tfidf pattern — no 1-row nested
    loop). Returns ``(col_a, col_b, n_pairs, pmi_bits)``."""
    n_total = df.count()
    cells = df.groupBy(col_a, col_b).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    ma = df.groupBy(col_a).agg(
        F.count(F.lit(1)).cast("bigint").alias("_na")
    )
    mb = df.groupBy(col_b).agg(
        F.count(F.lit(1)).cast("bigint").alias("_nb")
    )
    nano = F.round(
        F.log2(F.col("n_pairs") * F.lit(int(n_total))) * 1e9
    ).cast("bigint") - F.round(
        F.log2(F.col("_na") * F.col("_nb")) * 1e9
    ).cast("bigint")
    return (
        cells.join(F.broadcast(ma), col_a)
        .join(F.broadcast(mb), col_b)
        .select(
            col_a,
            col_b,
            "n_pairs",
            F.round(nano.cast("double") / 1e9, 6).alias("pmi_bits"),
        )
    )


def quantile_normalize_dims(
    df: DataFrame,
    id_col: str,
    array_col: str,
    n_dims: int,
) -> DataFrame:
    """Per-dimension QUANTILE (rank-uniform) normalization of a vector
    column — the feature-engineering transform that makes heavy-tailed
    embedding dimensions comparable before distance math or binning:
    within each of the first ``n_dims`` dimensions, a value's output is
    its midrank quantile ``q = (rank − 0.5) / n`` in that dimension's
    empirical distribution.

    Returns flat ``(id, dim, q)`` rows (dims 0-based) — flat because
    ranks are per-dimension facts; reassemble arrays downstream if a
    vector shape is needed. Determinism: rank is a TOTAL order
    ``(value, id)``, and q = ``(2·rank − 1) / (2n)`` divides exact
    integers once, rounded to 6. Scale: one explode to (row × n_dims)
    grain, then a window PARTITIONED PER DIMENSION — n_dims independent
    sorts of n rows each, embarrassingly parallel across dims; no
    global sort."""
    from pyspark.sql import Window

    vals = df.select(
        F.col(id_col),
        F.posexplode(F.col(array_col)).alias("dim", "_v"),
    ).filter(F.col("dim") < n_dims)
    w = Window.partitionBy("dim").orderBy(
        F.col("_v").cast("double").asc(), F.col(id_col).asc()
    )
    n = Window.partitionBy("dim")
    return vals.select(
        id_col,
        F.col("dim").cast("int").alias("dim"),
        F.round(
            (F.lit(2) * F.row_number().over(w) - F.lit(1)).cast("double")
            / (F.lit(2) * F.count(F.lit(1)).over(n)).cast("double"),
            6,
        ).alias("q"),
    )


def group_ols(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group simple linear regression (exact-moment OLS) — the
    trend detector ("is this brand's unit price drifting?") as ONE
    map-side-combinable aggregation: slope, intercept, and r² from the
    five moment sums, no iterative fitting, no per-group collect.

    Determinism is the ``embedding_dim_correlation`` recipe under a
    groupBy: ``x``/``y`` must arrive on exact integer grids (days,
    cents — caller quantizes); all five moments accumulate as
    DECIMAL(38,0) (exact, order-independent), the regression deltas
    ``nSxy − SxSy`` / ``nSxx − Sx²`` / ``nSyy − Sy²`` stay exact
    decimals, and only the final slope/intercept/r² divisions run in
    doubles, rounded to 6 — identical inputs, identical IEEE results.
    Groups with zero x-variance (or < 2 rows) report NULL slope/
    intercept/r², stated. Decimal headroom: |nSxy| ≤ n²·max|x|·max|y|
    must stay under 10³⁸ — satisfied up to ~10¹² rows/group at
    day×cent grids; r²'s squared numerator would overflow decimals, so
    it squares in DOUBLE (exact inputs → identical doubles).

    Returns ``(group…, n_rows, slope, intercept, r2)``."""
    d38 = "decimal(38,0)"
    x = F.col(x_col).cast(d38)
    y = F.col(y_col).cast(d38)
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast(d38).alias("_n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(x * y).alias("_sxy"),
        F.sum(y * y).alias("_syy"),
    )
    dxy = (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast(
        "double"
    )
    dxx = (
        F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    ).cast("double")
    dyy = (
        F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    ).cast("double")
    slope = F.when(dxx > 0, F.round(dxy / dxx, 6))
    intercept = F.when(
        dxx > 0,
        F.round(
            (
                F.col("_sy").cast("double")
                - F.round(dxy / dxx, 6) * F.col("_sx").cast("double")
            )
            / F.col("_n").cast("double"),
            6,
        ),
    )
    r2 = F.when(
        (dxx > 0) & (dyy > 0), F.round(dxy * dxy / (dxx * dyy), 6)
    )
    return agg.select(
        *group_cols,
        F.col("_n").cast("bigint").alias("n_rows"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def theil_sen(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    max_points: int = 1024,
) -> DataFrame:
    """Per-group Theil–Sen robust trend: the MEDIAN of all pairwise
    slopes ``(y_j − y_i)/(x_j − x_i)`` over the group's points — the
    rank-based alternative to :func:`group_ols` with a 29.3% breakdown
    point (up to ~29% of the points can be arbitrary outliers without
    moving the estimate; one bad month CAN move least squares by any
    amount).

    Inputs must be one row per (group, x) with integer x and y (the
    caller aggregates its series first — e.g. months on a calendar
    index and exact-cent monthly means), which makes the estimate
    oracle-replayable: each pairwise slope rounds to integer
    micro-units with half-away-from-zero division written as a
    sign-split of two NON-NEGATIVE integer ``DIV`` terms (floor and
    truncation agree on non-negatives, so Spark's ``DIV`` and DuckDB's
    ``//`` cannot drift), and the median is the LOWER median — the
    element at rank ``(n+1) DIV 2`` under the (slope, x_i, x_j) total
    order — not an averaged midpoint, so no float enters at all.

    Scale: pairs build from one equi-join on the group key — the frame
    is Σ_g n_g²/2 rows, which is why ``max_points`` REFUSES groups
    whose series exceed it (the quadratic blowup should be a stated
    modeling bound, not a surprise shuffle: calendar-grain series are
    bounded by the calendar — 84 months → ≤3.5k pairs — while raw
    event-grain inputs are not and must be pre-aggregated). The
    per-group rank windows sort pair-sized partitions; nothing global.

    Returns ``(*group_cols, n_points, n_pairs, slope_micro)`` with
    slope NULL for groups with a single point (no pair to measure).
    """
    from moisturizer_spark.operators.common import materialize

    gb = [F.col(c) for c in group_cols]
    # persisted: four consumers (the guard collect, both self-join
    # sides, and the result join) would otherwise re-run the caller's
    # upstream pipeline — e.g. brand_price_theilsen's lineitem⋈part +
    # monthly aggregation — once each (the materialize rule)
    pts = materialize(
        df.select(
            *group_cols,
            F.col(x_col).cast("bigint").alias("_x"),
            F.col(y_col).cast("bigint").alias("_y"),
        )
    )
    counts = pts.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_points"))
    over = counts.filter(F.col("n_points") > max_points).limit(1).collect()
    if over:
        raise ValueError(
            f"theil_sen: group {tuple(over[0][c] for c in group_cols)} has "
            f"{over[0]['n_points']} points (max_points={max_points}): the "
            "pair frame is quadratic in series length — pre-aggregate the "
            "series (e.g. to calendar grain) or raise max_points "
            "deliberately"
        )
    a = pts.select(*group_cols, F.col("_x").alias("_xi"), F.col("_y").alias("_yi"))
    b = pts.select(*group_cols, F.col("_x").alias("_xj"), F.col("_y").alias("_yj"))
    dy = F.col("_yj") - F.col("_yi")
    slope = F.when(
        dy >= 0,
        F.expr("(2 * (_yj - _yi) * 1000000 + (_xj - _xi)) DIV (2 * (_xj - _xi))"),
    ).otherwise(
        -F.expr("(2 * (_yi - _yj) * 1000000 + (_xj - _xi)) DIV (2 * (_xj - _xi))")
    )
    pairs = (
        a.join(b, group_cols)
        .filter(F.col("_xj") > F.col("_xi"))
        .select(*group_cols, "_xi", "_xj", slope.alias("slope_micro"))
    )
    from pyspark.sql import Window

    w_rank = Window.partitionBy(*gb).orderBy("slope_micro", "_xi", "_xj")
    w_all = Window.partitionBy(*gb)
    ranked = pairs.select(
        *group_cols,
        "slope_micro",
        F.row_number().over(w_rank).alias("_rk"),
        F.count(F.lit(1)).over(w_all).alias("n_pairs"),
    ).filter(F.col("_rk") == F.expr("(n_pairs + 1) DIV 2"))
    return (
        counts.join(
            ranked.select(*group_cols, "n_pairs", "slope_micro"),
            group_cols,
            "left",
        )
        .select(*group_cols, "n_points", "n_pairs", "slope_micro")
    )
