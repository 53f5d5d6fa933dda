"""Mergeable distinct-count sketches (Apache DataSketches HLL via Spark
built-ins).

The 100 TB pre-aggregation pattern: store a fixed-size HLL sketch per
fine-grained cell (e.g. day × event_type) ONCE, then answer any coarser
distinct-count rollup by merging sketches — no rescan of the fact table,
and union is lossless for HLL (the merged sketch equals the sketch of
the merged data, so estimates never degrade with regrouping). All three
stages are JVM built-ins (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``); the shuffle carries O(cells × sketch_bytes).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def hll_rollup(
    df: DataFrame,
    keys: list[str],
    col: str,
    lg_k: int = 14,
    out_col: str = "hll",
) -> DataFrame:
    """Per-cell HLL sketches of ``col``: the stored, mergeable rollup.
    ``lg_k=14`` ⇒ ~0.8% relative standard error at 16 KB per cell."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias(out_col)
    )


def hll_merge_estimate(
    rollup: DataFrame,
    keys: list[str],
    sketch_col: str = "hll",
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Merge sketch cells up to ``keys`` granularity and estimate the
    distinct count — the any-range query over the stored rollup."""
    grouped = rollup.groupBy(*keys) if keys else rollup.groupBy()
    return grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias(out_col)
    )


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (DDSketch-style log-bucketed histogram)
# ---------------------------------------------------------------------------
#
# The quantile counterpart of the HLL rollup: store per-cell bucket
# counts ONCE, answer any coarser-grain quantile later by summing counts
# — merge is exact (integer addition per bucket), so unlike sampled or
# GK-style sketches the estimate never degrades with regrouping. The
# relative-error guarantee is DDSketch's (Masson, Rim, Lee, "DDSketch: a
# fast and fully-mergeable quantile sketch with relative-error
# guarantees", VLDB 2019): value v lands in bucket ceil(log_gamma(v))
# with gamma = (1+alpha)/(1-alpha), so every value in a bucket is within
# alpha of the bucket's representative 2*gamma^i/(gamma+1).


def _lg_nano(relative_accuracy: float) -> int:
    gamma = (1.0 + relative_accuracy) / (1.0 - relative_accuracy)
    d = round(math.log(gamma) * 1e9)
    if d <= 0:
        raise ValueError(
            f"relative_accuracy {relative_accuracy!r} gives a degenerate "
            "bucket width"
        )
    return d


# |nano(ln v)| for any positive finite double is < 745e9 (ln of the
# extreme doubles is within ±745); a positivity shift must exceed that.
_LN_NANO_MAX = 746_000_000_000


def _bin_shift(d: int) -> int:
    """Shift (in BUCKETS) making the ceil-division numerator positive
    for every representable value: smallest multiple-of-d offset above
    the largest possible |nano(ln v)|, expressed as a bucket count so
    subtracting it back is exact. Keeps the shifted numerator ≤ ~1.5e12
    + 2d ≪ 2^53 for ANY relative_accuracy — a fixed bucket-count shift
    would under-cover tiny accuracies (width d shrinks, |bucket| range
    grows) and a too-large one would overflow exact-double range for
    coarse ones."""
    return _LN_NANO_MAX // d + 1


def ddsketch_bin(col, relative_accuracy: float = 0.01):
    """The DDSketch bucket index expression: ``ceil(log_gamma(v))`` for
    positive ``v``, NULL (the reserved non-positive bucket) otherwise.
    Shared by :func:`ddsketch_rollup` and the incremental CDC fold
    (:class:`moisturizer_spark.incremental.IncrementalDDSketchView`) so
    both paths bucket identically by construction.

    Evaluated in ENGINE-EXACT integer arithmetic: ``ln(v)`` is rounded
    to integer nano-units (a measure-zero boundary on an irrational
    log) and the ceiling division by the integer-nano ``ln(gamma)``
    constant is pure integer math — ``ceil(a/d) = floor((a+d-1)/d)``
    with a positivity shift so floor == truncation. A float
    ``ceil(ln(v)/ln(gamma))`` can straddle a bucket boundary
    differently per engine, and a repeated price straddling a boundary
    moves ALL its rows at once; the integer form is what lets
    ``order_price_quantile_sketch`` carry a DuckDB oracle
    (:func:`sql_ddsketch_bin` renders the identical arithmetic).
    Magnitude safety: |nano(ln v)| < 746e9 for every positive finite
    double, the shift (:func:`_bin_shift`) is the smallest
    multiple-of-d cover of that range, and the shifted numerator stays
    ≪ 2^53 for any accuracy — so the final exact division is lossless
    and the numerator is positive for ALL representable inputs (both
    engines' integer divisions agree on positives; they'd disagree on
    negatives, DuckDB truncating where the pmod form floors)."""
    v = F.col(col).cast("double") if isinstance(col, str) else col.cast("double")
    d = _lg_nano(relative_accuracy)
    off = _bin_shift(d)
    a = F.round(F.log(v) * F.lit(1e9)).cast("bigint")
    x = a + F.lit(off * d + d - 1)
    # exact floor division: x - pmod is a multiple of d and ≪ 2^53, so
    # the double division is lossless
    q = (x - F.pmod(x, F.lit(d))) / F.lit(d)
    return F.when(v > 0, (q - off).cast("int"))


def sql_ddsketch_bin(v_sql: str, relative_accuracy: float = 0.01) -> str:
    """DuckDB rendering of :func:`ddsketch_bin` — same integer
    arithmetic (the shifted numerator is positive for every
    representable input, where ``//`` truncation == floor)."""
    d = _lg_nano(relative_accuracy)
    off = _bin_shift(d)
    x = f"(CAST(ROUND(ln({v_sql}) * 1e9) AS BIGINT) + {off * d + d - 1})"
    return (
        f"CASE WHEN {v_sql} > 0 "
        f"THEN CAST({x} // {d} - {off} AS INT) END"
    )


def ddsketch_rollup(
    df: DataFrame,
    keys: list[str],
    col: str,
    relative_accuracy: float = 0.01,
) -> DataFrame:
    """Per-cell log-bucket histogram of POSITIVE ``col`` values:
    ``(keys..., _qbin, _qn)`` rows — the stored, exactly-mergeable
    quantile rollup. Non-positive values go to the reserved bucket
    ``_qbin = NULL`` (counted, surfaced as rank 0 mass at estimate
    time as value 0.0). NULL values of ``col`` are IGNORED — matching
    ``percentile``/``approx_percentile`` semantics, which skip NULLs
    (they are filtered before bucketing so they cannot masquerade as
    zero mass).

    Bucket count is O(log(max/min)/alpha) per cell (~2.3k buckets for
    9 decades at 1%), each an 8+8-byte row: the shuffle carries
    O(cells × occupied buckets), never the fact rows."""
    bin_ = ddsketch_bin(col, relative_accuracy)
    return (
        df.filter(F.col(col).isNotNull())
        .select(*keys, bin_.alias("_qbin"))
        .groupBy(*keys, "_qbin")
        .agg(F.count(F.lit(1)).alias("_qn"))
    )


def ddsketch_quantiles(
    rollup: DataFrame,
    keys: list[str],
    qs: list[float],
    relative_accuracy: float = 0.01,
    round_digits: int | None = None,
) -> DataFrame:
    """Merge bucket cells to ``keys`` grain and estimate the requested
    quantiles: per group, the q-quantile is the representative value of
    the first bucket whose cumulative count reaches ``ceil(q * n)`` —
    guaranteed within ``relative_accuracy`` of the true quantile.

    Output: (keys..., q double, quantile_est double). ``round_digits``
    rounds the representative to that many ABSOLUTE decimal places —
    opt-in for oracle-facing queries whose value range makes the grid
    negligible (an oracle's ``pow`` may differ in the final ulp), and
    deliberately NOT the default: absolute rounding would break the
    relative-accuracy guarantee for small-magnitude data (a 1e-4-scale
    representative rounded to 4 decimals is up to 50% off, and values
    under half the grid collapse onto the reserved bucket's 0.0
    sentinel). The cumulative walk is a window over each group's
    occupied buckets (hundreds of rows per group, already aggregated),
    not the data."""
    from pyspark.sql import Window

    bad = [q for q in qs if not (0.0 <= float(q) <= 1.0)]
    if bad:
        raise ValueError(
            f"quantiles must be in [0, 1], got {bad!r}"
        )  # out-of-range q would silently drop its group (no bucket's
        #    cumulative count can reach ceil(q*n) for q > 1)
    gamma = (1.0 + relative_accuracy) / (1.0 - relative_accuracy)
    merged = rollup.groupBy(*keys, "_qbin").agg(F.sum("_qn").alias("_qn"))
    # NULL bin (non-positives) sorts FIRST so its mass occupies the
    # lowest ranks, mirroring its position in the value order.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_qbin").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(*keys)
    cum = merged.select(
        *keys,
        "_qbin",
        F.sum("_qn").over(w).alias("_cum"),
        F.sum("_qn").over(wall).alias("_n"),
    )
    raw_rep = (
        F.lit(2.0)
        * F.pow(F.lit(gamma), F.col("_qbin").cast("double"))
        / F.lit(gamma + 1.0)
    )
    if round_digits is not None:
        raw_rep = F.round(raw_rep, round_digits)
    rep = F.when(F.col("_qbin").isNull(), F.lit(0.0)).otherwise(raw_rep)
    qdf = cum.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    hit = (
        cum.crossJoin(F.broadcast(qdf))
        .filter(
            F.col("_cum") >= F.ceil(F.col("q") * F.col("_n"))
        )
        .groupBy(*keys, "q")
        .agg(F.min_by(rep, F.col("_cum")).alias("quantile_est"))
    )
    return hit.select(*keys, "q", "quantile_est")


# -- Deterministic (md5-replayable) HyperLogLog -------------------------------
#
# The JVM-native HLL above is the scale default (fixed-size binary
# registers, datasketches-compatible). This variant trades a little
# speed for a property the native one cannot offer: every step — bucket
# choice, rank, register max, even the ESTIMATOR arithmetic — is
# deterministic and reproducible by any engine that can md5, so the
# whole sketch algebra is oracle-checkable (the KMV/DDSketch move,
# applied to HLL). Cells are plain (bucket, rho) integer rows: exactly
# mergeable by MAX at any grain, storable in ordinary tables, and
# diffable across engines.
#
# Engine-exact estimator arithmetic: the harmonic sum Σ 2^-rho is NOT
# exact in doubles (53-bit mantissa < the 62 bits a 1024-register sum
# can need), so registers are summed as INTEGER 2^(53-rho) and divided
# by 2^53 once at the end — BIGINT sums are order-insensitive, and the
# single bigint→double conversion is IEEE-correctly-rounded in both
# engines. ln() in the small-range correction and the final division
# are rounded to 4 digits (measure-zero boundary on irrationals).

_DET_HLL_M = 1024  # registers; rel. error ~1.04/sqrt(m) ≈ 3.3%
_DET_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _DET_HLL_M)


def _det_hll_bucket_rho(key) -> tuple:
    """(bucket, rho) column pair from md5(key): 12 hex-bit bucket
    folded to m, rank from the next 52 bits via pure STRING arithmetic
    — strip leading zero nibbles, then a 16-way CASE on the first
    non-zero nibble — no float log whose ulp could mis-rank a value
    just below a power of two."""
    k = key if not isinstance(key, str) else F.col(key)
    h = F.md5(k.cast("string"))
    bucket = (F.conv(F.substring(h, 1, 3), 16, 10).cast("int") % _DET_HLL_M)
    s = F.substring(h, 4, 13)  # 52 bits of rank stream
    stripped = F.regexp_replace(s, "^0*", "")
    z_nibbles = F.lit(13) - F.length(stripped)
    first = F.substring(stripped, 1, 1)
    nlz = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rho = F.when(stripped == "", 53).otherwise(
        z_nibbles * 4 + nlz + 1
    )
    return bucket.alias("_hb"), rho.cast("int").alias("_hr")


def det_hll_cells(
    df: DataFrame, keys: list[str], col: str
) -> DataFrame:
    """Per-cell deterministic-HLL registers: ``(keys..., _hb, _hr)``
    with ``_hr`` the max rank seen in that bucket. Mergeable to any
    coarser grain by ``MAX`` (idempotent, associative, commutative —
    re-merging cells equals sketching the union). NULL keys are
    ignored, matching distinct-count semantics."""
    b, r = _det_hll_bucket_rho(col)
    return (
        df.filter(F.col(col).isNotNull())
        .select(*keys, b, r)
        .groupBy(*keys, "_hb")
        .agg(F.max("_hr").alias("_hr"))
    )


def det_hll_estimate(
    cells: DataFrame, keys: list[str], out_col: str = "approx_distinct"
) -> DataFrame:
    """Merge cells to ``keys`` grain and apply the HLL estimator with
    linear-counting small-range correction — every arithmetic step
    engine-exact (see module comment). Output rounded to 4 digits."""
    m = _DET_HLL_M
    merged = cells.groupBy(*keys, "_hb").agg(F.max("_hr").alias("_hr"))
    # integer 2^(53-rho): pow is exact on power-of-two results
    scaled = F.pow(F.lit(2.0), F.lit(53) - F.col("_hr")).cast("bigint")
    agg = merged.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.sum(scaled).alias("_ssum"),
    )
    denom = (
        (F.lit(m) - F.col("_cnt")).cast("double")
        + F.col("_ssum").cast("double") / F.lit(float(2**53))
    )
    raw = F.lit(_DET_HLL_ALPHA * m * m) / denom
    zeros = F.lit(m) - F.col("_cnt")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.round(
            F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
            4,
        ),
    ).otherwise(F.round(raw, 4))
    return agg.select(*keys, est.alias(out_col))


def sql_det_hll_estimate(
    table_sql: str, keys_sql: list[str], col_sql: str,
    out_col: str = "approx_distinct",
) -> str:
    """DuckDB rendering of cells→estimate over ``table_sql`` — the
    identical bucket/rank/estimator arithmetic as the Spark pair
    above, for oracle checking."""
    m = _DET_HLL_M
    keys = ", ".join(keys_sql)
    return f"""
    hx AS (SELECT {keys}, md5(CAST({col_sql} AS VARCHAR)) AS h
           FROM {table_sql} WHERE {col_sql} IS NOT NULL),
    br AS (SELECT {keys},
                  CAST(('0x' || substr(h, 1, 3)) AS INT) % {m} AS hb,
                  regexp_replace(substr(h, 4, 13), '^0*', '') AS st
           FROM hx),
    rr AS (SELECT {keys}, hb,
                  CASE WHEN st = '' THEN 53
                       ELSE (13 - length(st)) * 4
                            + CASE WHEN substr(st, 1, 1) = '1' THEN 3
                                   WHEN substr(st, 1, 1) IN ('2','3') THEN 2
                                   WHEN substr(st, 1, 1) IN ('4','5','6','7')
                                     THEN 1
                                   ELSE 0 END + 1
                  END AS hr
           FROM br),
    cells AS (SELECT {keys}, hb, MAX(hr) AS hr FROM rr GROUP BY {keys}, hb),
    ag AS (SELECT {keys}, COUNT(*) AS cnt,
                  SUM(CAST(pow(2.0, 53 - hr) AS BIGINT)) AS ssum
           FROM cells GROUP BY {keys}),
    est AS (SELECT {keys},
                   {_DET_HLL_ALPHA * m * m!r}
                     / (CAST({m} - cnt AS DOUBLE)
                        + CAST(ssum AS DOUBLE) / {float(2**53)!r}) AS raw,
                   {m} - cnt AS zeros
            FROM ag)
    SELECT {keys},
           CASE WHEN raw <= {2.5 * m!r} AND zeros > 0
                THEN ROUND({float(m)!r} * ln({float(m)!r}
                           / CAST(zeros AS DOUBLE)), 4)
                ELSE ROUND(raw, 4) END AS {out_col}
    FROM est"""
#
# HLL unions losslessly but cannot INTERSECT; the audience questions a
# pipeline actually asks ("users who did A and B") need a theta-family
# sketch. KMV keeps the k smallest hash values of a set: union = merge
# and re-truncate (exact — the k smallest of A∪B), intersection via the
# Jaccard of the union's sample. Hashes are md5 hex prefixes, so the
# whole algebra is DETERMINISTIC and bit-for-bit reproducible by the
# DuckDB oracle — no randomness anywhere, unlike library theta sketches.

_KMV_SPAN = float(1 << 32)


def _kmv_frac(h):
    """Uniform (0,1] fraction from an md5 hex string's 8-hex prefix."""
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("double") + 1.0) / _KMV_SPAN


def kmv_sketch(
    df: DataFrame,
    keys: list[str],
    col: str,
    k: int = 64,
    out_col: str = "kmv",
) -> DataFrame:
    """Per-group KMV sketch: the SORTED array of the k smallest
    md5(value) hashes. One combinable aggregation — collect_set of
    hashes per group is truncated via slice(array_sort(...), 1, k), so
    the shuffled state is bounded by the group's distinct values and
    the stored cell is ≤ k × 32 bytes.

    At corpus scale, pre-aggregate per (group, hash) first if a single
    group's distinct count is huge; for the stored-rollup pattern the
    cells are fine-grained, which bounds set sizes by construction.
    """
    h = F.md5(F.col(col).cast("string"))
    return df.groupBy(*keys).agg(
        F.slice(F.array_sort(F.collect_set(h)), 1, k).alias(out_col)
    )


def kmv_merge(a, b, k: int = 64):
    """Union of two KMV sketches: k smallest of the merged hash sets —
    EXACTLY the sketch of the unioned data (pinned by test), so stored
    cells roll up to any grain without estimate degradation."""
    return F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)


def kmv_estimate(kmv, k: int = 64):
    """Distinct-count estimate: (k-1)/m with m the k-th smallest hash
    fraction; exact (= array size) when the set had fewer than k
    distinct values. Deterministic — identical IEEE ops both engines —
    and rounded to 6 digits for cross-engine hashing."""
    n = F.size(kmv)
    kth = _kmv_frac(F.element_at(kmv, k))
    return F.when(n < k, n.cast("double")).otherwise(
        F.round((F.lit(float(k - 1))) / kth, 6)
    )


def kmv_intersect_estimate(a, b, k: int = 64):
    """|A∩B| estimate: Jaccard over the union's k-sample × |A∪B|
    estimate — the theta-sketch intersection rule. All terms derive
    from the two stored arrays; no data rescan."""
    u = kmv_merge(a, b, k)
    in_both = F.size(F.array_intersect(F.array_intersect(u, a), b))
    jacc = in_both.cast("double") / F.size(u)
    return F.round(jacc * kmv_estimate(u, k), 6)


# -- Windowed reach: the LINEAR scale path for sliding-window distinct -------
#
# Round-10 sf1 scale probe: the exact sliding-window co-activity query
# (events_coactivity — "distinct other users within ±120 s of each
# purchase") grew 29.6× at 10× data. That quadratic is SEMANTIC: exact
# distinct-over-a-window needs the probe×event pair frame, whose size is
# |probes| × (window · event density) — both factors grow with the
# corpus on a fixed time span. These two functions are the scale path:
# per-time-bucket det-HLL register cells (linear build, mergeable by
# MAX), probed by exploding each probe row to the ≤⌈window/bucket⌉+1
# covering buckets and merging registers per probe — |probes| ×
# buckets-per-window rows instead of the pair frame. The trade, stated:
# (a) HLL accuracy (~13% at m=64), and (b) WINDOW GRANULARITY — the
# estimate covers the bucket-aligned span ⊇ [t+lower, t+upper], up to
# one bucket wider on each side; shrink `bucket_s` to tighten (cost
# grows only in the probe explode, not the cell build).


def windowed_reach_sketch(
    df: DataFrame, ts_col: str, user_col: str, bucket_s: int
) -> DataFrame:
    """Per-time-bucket det-HLL cells ``(_wb, _hb, _hr)`` over
    ``user_col`` — the pre-aggregated state a sliding-window reach
    probe merges. One map-side pass; output is |buckets| × ≤m rows,
    broadcastable for bounded time ranges and foldable under the
    IVM/streaming max-merge discipline like any det-HLL cell frame."""
    b = F.floor(
        F.unix_timestamp(F.col(ts_col).cast("timestamp"))
        / F.lit(int(bucket_s))
    ).cast("bigint").alias("_wb")
    return det_hll_cells(
        df.select(b, F.col(user_col).alias("_wu")), ["_wb"], "_wu"
    )


def windowed_reach_probe(
    probes: DataFrame,
    cells: DataFrame,
    ts_col: str,
    lower_s: int,
    upper_s: int,
    bucket_s: int,
    keys: list[str],
    out_col: str = "approx_users",
) -> DataFrame:
    """Approximate distinct users active within ``[t+lower_s,
    t+upper_s]`` of each probe row's ``ts_col`` — answered from the
    bucket cells alone (no event rescan, no pair frame): each probe
    explodes to its covering buckets, equi-joins the cells, and the
    registers merge per probe key through the standard estimator.
    Covered span is bucket-aligned (see module comment)."""
    epoch = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    lo = F.floor((epoch + F.lit(int(lower_s))) / F.lit(int(bucket_s)))
    hi = F.floor((epoch + F.lit(int(upper_s))) / F.lit(int(bucket_s)))
    probe_bands = probes.select(
        *keys, F.explode(F.sequence(lo, hi)).alias("_wb")
    )
    joined = probe_bands.join(cells, "_wb")
    return det_hll_estimate(joined, keys, out_col)
