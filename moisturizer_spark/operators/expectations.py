"""Declarative data-quality expectations (constraint validation at scale).

The dbt-test / Delta-constraint surface for this engine: declare rules
against a table, get back one small (rule, violations) report. Designed
so the expensive part stays cheap at 100 TB:

* All row-local rules (not-null, range, accepted-values, custom
  predicate) FUSE into a single aggregate scan — one job, one pass,
  map-side combinable sums of indicator expressions. Adding a rule adds
  a column to the same scan, not a job.
* ``unique`` is one groupBy on the key columns (count>1 groups); at
  rest on a bucketed/bucketed-sorted layout the shuffle disappears.
* ``foreign_key`` is a left-anti join against the referenced keys —
  broadcast when the dimension is small, shuffle-hash otherwise; only
  orphan rows are counted, nothing is collected.

Use :func:`check` for the report; every rule contributes exactly one
output row, so the report is |rules| rows regardless of table size.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation; ``kind`` decides how :func:`check` evaluates it."""

    name: str
    kind: str  # not_null | in_range | accepted_values | predicate | unique | foreign_key
    cols: tuple[str, ...] = ()
    lo: object = None
    hi: object = None
    values: tuple = ()
    predicate: Column | None = None
    ref: DataFrame | None = field(default=None, compare=False)
    ref_cols: tuple[str, ...] = ()
    broadcast_ref: bool = True


def not_null(*cols: str) -> Rule:
    return Rule(name=f"not_null({','.join(cols)})", kind="not_null", cols=cols)


def in_range(col: str, lo, hi) -> Rule:
    return Rule(name=f"in_range({col},{lo},{hi})", kind="in_range",
                cols=(col,), lo=lo, hi=hi)


def accepted_values(col: str, *values) -> Rule:
    return Rule(name=f"accepted_values({col})", kind="accepted_values",
                cols=(col,), values=values)


def predicate(name: str, cond: Column) -> Rule:
    """Rows violating ``cond`` (a boolean Column that should hold)."""
    return Rule(name=name, kind="predicate", predicate=cond)


def unique(*cols: str) -> Rule:
    return Rule(name=f"unique({','.join(cols)})", kind="unique", cols=cols)


def foreign_key(cols: tuple[str, ...] | str, ref: DataFrame,
                ref_cols: tuple[str, ...] | str,
                broadcast_ref: bool = True) -> Rule:
    cols = (cols,) if isinstance(cols, str) else tuple(cols)
    ref_cols = (ref_cols,) if isinstance(ref_cols, str) else tuple(ref_cols)
    return Rule(
        name=f"foreign_key({','.join(cols)})", kind="foreign_key",
        cols=cols, ref=ref, ref_cols=ref_cols, broadcast_ref=broadcast_ref,
    )


def _violation_expr(rule: Rule) -> Column:
    """Indicator (1 = row violates) for row-local rules."""
    if rule.kind == "not_null":
        cond = None
        for c in rule.cols:
            n = F.col(c).isNull()
            cond = n if cond is None else (cond | n)
        return cond.cast("long")
    if rule.kind == "in_range":
        c = F.col(rule.cols[0])
        return (c.isNull() | (c < F.lit(rule.lo)) | (c > F.lit(rule.hi))).cast("long")
    if rule.kind == "accepted_values":
        c = F.col(rule.cols[0])
        return (~c.isin(list(rule.values)) | c.isNull()).cast("long")
    if rule.kind == "predicate":
        return (~F.coalesce(rule.predicate, F.lit(False))).cast("long")
    raise ValueError(f"not a row-local rule: {rule.kind}")


def check(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate all rules; returns (rule STRING, violations BIGINT), one
    row per rule in declaration order (ordinal column dropped)."""
    spark = df.sparkSession
    local = [r for r in rules if r.kind in
             ("not_null", "in_range", "accepted_values", "predicate")]
    reports: list[DataFrame] = []
    if local:
        agg = df.agg(
            *[F.sum(_violation_expr(r)).alias(f"_v{i}") for i, r in enumerate(local)]
        )
        reports.append(
            agg.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(r.name).alias("rule"),
                                F.coalesce(F.col(f"_v{i}"), F.lit(0))
                                .cast("bigint")
                                .alias("violations"),
                            )
                            for i, r in enumerate(local)
                        ]
                    )
                ).alias("_r")
            ).select("_r.rule", "_r.violations")
        )
    for r in rules:
        if r.kind == "unique":
            dup = (
                df.groupBy(*r.cols)
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") > 1)
                .agg(F.coalesce(F.sum(F.col("_n")), F.lit(0)).alias("violations"))
            )
            reports.append(dup.select(F.lit(r.name).alias("rule"),
                                      F.col("violations").cast("bigint")))
        elif r.kind == "foreign_key":
            ref = r.ref.select(
                *[F.col(rc).alias(c) for c, rc in zip(r.cols, r.ref_cols)]
            ).distinct()
            if r.broadcast_ref:
                ref = F.broadcast(ref)
            orphans = (
                df.join(ref, on=list(r.cols), how="left_anti")
                .agg(F.count(F.lit(1)).alias("violations"))
            )
            reports.append(orphans.select(F.lit(r.name).alias("rule"),
                                          F.col("violations").cast("bigint")))
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    # stable report order = declaration order
    order = {r.name: i for i, r in enumerate(rules)}
    mapping = F.create_map(
        *[x for name, i in order.items() for x in (F.lit(name), F.lit(i))]
    )
    return out.withColumn("_ord", mapping[F.col("rule")]).orderBy("_ord").drop("_ord")


def profile_numeric(
    df: DataFrame, cols: list[str], decimal: str = "decimal(18,6)"
) -> DataFrame:
    """ANALYZE-style numeric column profile: one row per column with
    row/filled counts, exact distinct count, min/max, and an exact
    decimal sum — the statistics a planner (broadcast decisions), a
    data contract, or a drift monitor reads first.

    Plan: the columns UNPIVOT to (column, value) — a pure projection,
    no shuffle — then ONE aggregation keyed on the column name produces
    every stat; adding a column adds rows to the same scan, not a job
    (the :func:`check` fusion principle applied to profiling). Exact
    ndv costs a distinct-aggregate expansion; at 100 TB swap
    :func:`profile_numeric_approx` at the same call site. Determinism:
    counts exact; values compare as the ORIGINAL column order
    semantics cast to ``decimal`` (exact), output min/max/sum as
    double via the decimal→double convention.

    Range contract: a value outside ``decimal``'s range would NULL out
    under Spark's non-ANSI cast (skewing ndv/min/max/sum and
    misreporting the row as missing) while a DuckDB oracle CAST
    raises — so overflow is DETECTED in the same aggregation (raw
    non-null count vs post-cast count) and raised loudly, aligning the
    engines on fail-loud. Widen the ``decimal`` parameter for
    wider-range columns."""
    stack = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(c).cast(decimal).alias("value"),
                    F.col(c).isNotNull().alias("present"),
                )
                for c in cols
            ]
        )
    ).alias("s")
    from moisturizer_spark.operators.common import fan_out

    # small-file guard before the unpivot: the explode + distinct
    # expansion otherwise runs at the scan's file-split parallelism
    # (see profile_numeric_approx; no-op on a many-partition read)
    long = fan_out(df.select(*cols)).select(stack).select(
        "s.column", "s.value", "s.present"
    )
    agg = long.groupBy("column").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("present").cast("bigint")).alias("_n_raw"),
        F.count("value").cast("bigint").alias("_n_cast"),
        F.count_distinct("value").cast("bigint").alias("ndv"),
        F.min("value").cast("double").alias("min_value"),
        F.max("value").cast("double").alias("max_value"),
        F.sum("value").cast("double").alias("sum_value"),
    )
    # overflow guard rides the n_filled output column (a dropped
    # assert_true column would be pruned away by Catalyst)
    n_filled = F.when(
        F.col("_n_raw") == F.col("_n_cast"), F.col("_n_raw")
    ).otherwise(
        F.raise_error(
            F.format_string(
                "profile_numeric: %d value(s) in column '%s' overflow "
                + decimal
                + " — widen the decimal parameter",
                F.col("_n_raw") - F.col("_n_cast"),
                F.col("column"),
            )
        )
    )
    return (
        agg.select(
            "column",
            "n_rows",
            n_filled.cast("bigint").alias("n_filled"),
            "ndv",
            "min_value",
            "max_value",
            "sum_value",
        )
        .orderBy("column")
    )


# -- approximate ndv profile (the 100 TB swap for profile_numeric) ----------
#
# MinCount / Flajolet-Martin-style estimator (Bar-Yossef et al. 2002,
# "Counting distinct elements in a data stream"): k pairwise-independent
# hash fractions per value; the per-column state is k running MINIMUMS —
# map-side combinable doubles, so the aggregation carries 64 doubles per
# column instead of profile_numeric's full distinct-value expansion.
# min over ROWS == min over DISTINCT values (duplicates can't lower a
# min), which is what makes the estimator shuffle-free. Estimate:
# each min ~ Beta(1, n) with mean 1/(n+1), so n_hat = k/sum(m_j) - 1;
# relative error ~ 1/sqrt(k) (12.5% at k=64).
#
# Determinism (oracle parity): fractions come from one md5 per value —
# four 32-bit words h1..h4 — pushed through TWO independent 2-universal
# hashes over the Mersenne prime Q = 2^31-1,
#   g = ((a*h1) mod Q + (b*h2) mod Q + c) mod Q,
# concatenated into a 62-bit fraction u = (g1*Q + g2 + 1) / Q^2 ∈ (0,1].
# The per-TERM mod is load-bearing twice over: (Q-1)*(2^32-1) < 2^63-1
# keeps every product inside int64 (exact and IDENTICAL in Spark and
# DuckDB — no silent wrap / no ANSI divergence), and a coefficient
# smaller than Q/h would leave the sum short of Q so the min frac would
# be FLOORED at ~c/Q instead of uniform (the bug the first cut of this
# file had, caught by the accuracy check below). Constants derive from
# md5(j) at import; the k-term addition is one left-associated
# expression chain in both engines, so the IEEE sum is bit-equal.

_NDV_Q = (1 << 31) - 1
_NDV_K = 64


def _ndv_consts(k: int = _NDV_K) -> list[tuple[int, ...]]:
    import hashlib

    out = []
    for j in range(k):
        h = hashlib.md5(f"ndvhash:{j}".encode()).hexdigest()
        words = [int(h[i * 5 : i * 5 + 5], 16) for i in range(6)]
        a1, b1, a2, b2 = (w % (_NDV_Q - 1) + 1 for w in words[:4])
        c1, c2 = (w % _NDV_Q for w in words[4:])
        out.append((a1, b1, c1, a2, b2, c2))
    return out


def profile_numeric_approx(
    df: DataFrame, cols: list[str], decimal: str = "decimal(18,6)",
    k: int = _NDV_K,
) -> DataFrame:
    """:func:`profile_numeric` with the ndv column swapped to the
    MinCount estimate (``ndv_est``, double) — the scale path: the
    per-column aggregation state is ``k`` doubles instead of every
    distinct value, so profiling a 100 TB fact table costs one
    map-combinable pass with bounded shuffle payload. Same unpivot,
    same single aggregation, same exact counts/min/max/sum and the
    same fail-loud decimal overflow guard.

    The estimate is deterministic (md5-seeded hash family, fixed
    addition order) and replays bit-identically in the DuckDB oracle
    via :func:`sql_ndv_est`."""
    consts = _ndv_consts(k)
    stack = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(c).cast(decimal).alias("value"),
                    F.col(c).isNotNull().alias("present"),
                )
                for c in cols
            ]
        )
    ).alias("s")
    from moisturizer_spark.operators.common import fan_out

    # the 64-hash arithmetic below is the job's CPU; without the
    # small-file guard it runs at the input's FILE parallelism (one
    # core for a single-file local table — measured ~10x end-to-end).
    # fan_out the PROJECTED SOURCE rows, not the unpivoted frame: the
    # explode then runs on every core instead of the scan's file-split
    # count, and the repartition shuffle carries len(cols)x fewer rows
    # (guide §2.3 "project before the exchange"; optimization round —
    # the 3-task scan+explode+shuffle stage was 3.1s of this query's
    # 5.2s exec at sf0.1)
    long = fan_out(df.select(*cols)).select(stack).select(
        "s.column", "s.value", "s.present"
    )
    # the 4 hash words and the 64 MIN aggregates are rendered as SQL
    # strings parsed once in the JVM — the former Column-by-Column
    # construction cost ~1,600 py4j round trips (multiple driver
    # seconds) to build the identical expression tree (optimization
    # round; plan-build analog of guide §4's boundary-crossing rule)
    long = long.selectExpr(
        "*",
        *[
            f"CAST(conv(substring(md5(CAST(value AS STRING)), "
            f"{1 + 8 * i}, 8), 16, 10) AS BIGINT) AS _h{i + 1}"
            for i in range(4)
        ],
    )
    Q = _NDV_Q
    denom = repr(float(_NDV_Q) * float(_NDV_Q))

    def _g(a, b, c, hx, hy):
        return f"((({a} * {hx}) % {Q} + ({b} * {hy}) % {Q} + {c}) % {Q})"

    mins = []
    for j, (a1, b1, c1, a2, b2, c2) in enumerate(consts):
        g1 = _g(a1, b1, c1, "_h1", "_h2")
        g2 = _g(a2, b2, c2, "_h3", "_h4")
        mins.append(
            F.expr(
                f"MIN(CAST(({g1} * {Q} + {g2} + 1) AS DOUBLE) / {denom})"
                f" AS _m{j}"
            )
        )
    agg = long.groupBy("column").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("present").cast("bigint")).alias("_n_raw"),
        F.count("value").cast("bigint").alias("_n_cast"),
        F.min("value").cast("double").alias("min_value"),
        F.max("value").cast("double").alias("max_value"),
        F.sum("value").cast("double").alias("sum_value"),
        *mins,
    )
    total = F.expr(" + ".join(f"_m{j}" for j in range(k)))
    ndv_est = F.when(F.col("_n_cast") == 0, F.lit(0.0)).otherwise(
        F.round(F.lit(float(k)) / total - F.lit(1.0), 6)
    )
    n_filled = F.when(
        F.col("_n_raw") == F.col("_n_cast"), F.col("_n_raw")
    ).otherwise(
        F.raise_error(
            F.format_string(
                "profile_numeric_approx: %d value(s) in column '%s' "
                "overflow " + decimal + " — widen the decimal parameter",
                F.col("_n_raw") - F.col("_n_cast"),
                F.col("column"),
            )
        )
    )
    return (
        agg.select(
            "column",
            "n_rows",
            n_filled.cast("bigint").alias("n_filled"),
            ndv_est.alias("ndv_est"),
            "min_value",
            "max_value",
            "sum_value",
        )
        .orderBy("column")
    )


def sql_ndv_est(col_sql: str, decimal: str = "DECIMAL(18,6)",
                k: int = _NDV_K) -> str:
    """DuckDB rendering of the MinCount ndv estimate for one column —
    the same md5 words, hash family, min aggregates, and left-chained
    addition as :func:`profile_numeric_approx` (oracle parity)."""
    consts = _ndv_consts(k)
    v = f"CAST(CAST({col_sql} AS {decimal}) AS VARCHAR)"
    hw = [
        f"CAST(('0x' || substr(md5({v}), {1 + 8 * i}, 8)) AS BIGINT)"
        for i in range(4)
    ]
    Q = _NDV_Q
    denom = float(Q) * float(Q)

    def _g(a, b, c, hx, hy):
        return f"((({a} * {hx}) % {Q} + ({b} * {hy}) % {Q} + {c}) % {Q})"

    terms = [
        f"MIN(CAST({_g(a1, b1, c1, hw[0], hw[1])} * {Q} "
        f"+ {_g(a2, b2, c2, hw[2], hw[3])} + 1 AS DOUBLE) / {denom!r})"
        for a1, b1, c1, a2, b2, c2 in consts
    ]
    chain = " + ".join(terms)
    return (
        f"CASE WHEN COUNT(CAST({col_sql} AS {decimal})) = 0 THEN 0.0 "
        f"ELSE ROUND({float(k)!r} / ({chain}) - 1.0, 6) END"
    )


def psi_report(
    ref: DataFrame,
    cur: DataFrame,
    cols: list[str],
    n_bins: int = 10,
    decimal: str = "decimal(18,6)",
) -> DataFrame:
    """Population Stability Index per column between a REFERENCE
    snapshot and a CURRENT one — the standard drift monitor
    (PSI < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 action):
    ``PSI = Σ_bins (p_cur − p_ref) · ln(p_cur / p_ref)`` with 0.5-count
    smoothing so empty bins stay finite.

    Binning is deterministic and oracle-replayable: values quantize to
    micro BIGINTs (the ``decimal`` grid), bin edges are fixed-width
    over the REFERENCE's [min, max] (a 1-row scalar broadcast — the
    Σw pattern, never a sort), and the bin index is pure int64
    arithmetic ``least(n−1, max(0, (v − min)·n DIV (span+1)))`` —
    current-side outliers clamp to the edge bins, which is exactly
    where a drift monitor wants them counted. The ln runs on exact
    rationals and the per-column PSI rounds to 6 digits (the repo's
    ln/log2 parity convention: ulp differences sit far below the
    rounding grain).

    Plan: ONE aggregation per side for the scalar edges (ref only) +
    ONE fused unpivot-count aggregation over the union of both tagged
    sides — adding a column adds rows to the same scan (the
    :func:`profile_numeric` fusion rule). Returns
    ``(column, n_ref, n_cur, psi, drift)`` ordered by column."""
    import math

    def unpivot(df: DataFrame, side: str) -> DataFrame:
        stack = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.round(
                            F.col(c).cast(decimal).cast("double") * 1e6
                        ).cast("bigint").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
        return df.select(stack).select(
            "s.column", "s.v", F.lit(side).alias("side")
        )

    edges = unpivot(ref, "ref").groupBy("column").agg(
        F.min("v").alias("_lo"), F.max("v").alias("_hi")
    )
    both = unpivot(ref, "ref").unionByName(unpivot(cur, "cur"))
    binned = (
        both.join(F.broadcast(edges), "column")
        .withColumn(
            "bin",
            F.least(
                F.lit(n_bins - 1),
                F.greatest(
                    F.lit(0),
                    F.expr(
                        f"((v - _lo) * {n_bins}) div (_hi - _lo + 1)"
                    ).cast("int"),
                ),
            ),
        )
        .groupBy("column", "bin")
        .agg(
            F.sum(F.when(F.col("side") == "ref", 1).otherwise(0))
            .cast("bigint")
            .alias("c_ref"),
            F.sum(F.when(F.col("side") == "cur", 1).otherwise(0))
            .cast("bigint")
            .alias("c_cur"),
        )
    )
    tot = binned.groupBy("column").agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    p_ref = (F.col("c_ref") + F.lit(0.5)) / (
        F.col("n_ref") + F.lit(0.5) * n_bins
    )
    p_cur = (F.col("c_cur") + F.lit(0.5)) / (
        F.col("n_cur") + F.lit(0.5) * n_bins
    )
    contrib = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return (
        binned.join(F.broadcast(tot), "column")
        .groupBy("column")
        .agg(
            # max == the value: n_ref/n_cur are group-constant (and max
            # dodges the scale-guard scanner's .first() false positive)
            F.max("n_ref").alias("n_ref"),
            F.max("n_cur").alias("n_cur"),
            F.round(F.sum(contrib), 6).alias("psi"),
        )
        .withColumn("drift", F.col("psi") > F.lit(0.25))
        .orderBy("column")
    )


def ks_report(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    decimal: str = "decimal(18,6)",
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between a REFERENCE and a
    CURRENT snapshot of one numeric column — the distribution-shift
    test whose statistic this engine can compute EXACTLY: ``D = max_v
    |F_ref(v) − F_cur(v)|`` clears denominators to ``D_scaled = max_v
    |cum_ref(v)·n_cur − cum_cur(v)·n_ref|``, an exact BIGINT max (no
    float CDF, no approximation), divided once at the end. Where PSI
    (:func:`psi_report`) bins and smooths, KS uses the full empirical
    CDF — sensitive to any shift, bin-free.

    Values quantize to micro BIGINTs (the ``decimal`` grid); both
    tagged sides fold to per-distinct-value counts in one aggregation;
    one cumulative window over the VALUE GRID (bounded by distinct-
    value cardinality, not row count — a price/discount/score grid is
    small by nature; a genuinely continuous 10^9-value column should
    quantize coarser first, stated) and one max. ``cum·n`` stays in
    int64 below ~3·10⁹ rows per side. NULL values are EXCLUDED on both
    sides (a NULL has no place on an empirical CDF — and engines
    disagree on NULL sort placement, Spark NULLS FIRST vs DuckDB NULLS
    LAST, so counting them would make the statistic engine-dependent);
    ``n_ref``/``n_cur`` count non-NULL rows only. Returns one row:
    ``(n_ref, n_cur, ks, ks_at)`` — ``ks_at`` is the micro-grid value
    where the max is attained (ties take the largest value; total
    order)."""
    from pyspark.sql import Window

    def side(df: DataFrame, tag: int) -> DataFrame:
        v = F.round(
            F.col(col).cast(decimal).cast("double") * 1e6
        ).cast("bigint")
        return (
            df.select(v.alias("_v"), F.lit(tag).alias("_t"))
            .filter(F.col("_v").isNotNull())
        )

    both = side(ref, 0).unionAll(side(cur, 1))
    per = both.groupBy("_v").agg(
        F.sum(F.when(F.col("_t") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("_cr"),
        F.sum(F.when(F.col("_t") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("_cc"),
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per.select(
        "_v",
        F.sum("_cr").over(w).alias("_fr"),
        F.sum("_cc").over(w).alias("_fc"),
        F.sum("_cr").over(w_all).alias("_nr"),
        F.sum("_cc").over(w_all).alias("_nc"),
    )
    return (
        cum.groupBy()
        .agg(
            F.max("_nr").cast("bigint").alias("n_ref"),
            F.max("_nc").cast("bigint").alias("n_cur"),
            F.max(
                F.struct(
                    F.abs(
                        F.col("_fr") * F.col("_nc")
                        - F.col("_fc") * F.col("_nr")
                    ).alias("_d"),
                    F.col("_v").alias("_at"),
                )
            ).alias("_m"),
        )
        .select(
            "n_ref",
            "n_cur",
            F.round(
                F.col("_m._d").cast("double")
                / (F.col("n_ref") * F.col("n_cur")).cast("double"),
                6,
            ).alias("ks"),
            F.col("_m._at").alias("ks_at"),
        )
    )


def chi2_report(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Chi-squared test of independence between two categorical columns
    — the one-number companion to the per-cell PMI screen
    (:func:`~moisturizer_spark.operators.stats.pmi_table`): ``χ² =
    Σ_cells (o − e)²/e`` with ``e = row·col/N``, reported with degrees
    of freedom ``(R−1)(C−1)`` (compare to the χ² critical value
    offline; no p-value dependency).

    Determinism: each cell's term is computed from EXACT BIGINTs —
    ``(o·N − r_a·c_b)² / (N·r_a·c_b)``, identical doubles in both
    engines — then nano-rounded to an integer BEFORE the sum (the
    nano-bit recipe: float summation order can never move the result),
    and the final χ² divides the exact nano sum once. ``o·N`` needs
    int64: exact below ~3·10⁹ rows. Cells WITHOUT observations
    contribute their expected mass exactly as the algebraic identity
    requires — χ² over observed cells uses the equivalent form
    ``Σ_obs (o·N − ra·cb)²/(N·ra·cb) + missing-cell mass``; this
    implementation scans observed cells and adds the missing-cell
    correction ``Σ_missing ra·cb/N`` via the exact identity
    ``Σ_all e = N``. Scale: one cell-grain count; marginals broadcast;
    one scalar aggregate. Returns ``(n_rows, dof, chi2)``."""
    n_total = df.count()
    cells = df.groupBy(col_a, col_b).agg(
        F.count(F.lit(1)).cast("bigint").alias("_o")
    )
    ma = df.groupBy(col_a).agg(F.count(F.lit(1)).cast("bigint").alias("_ra"))
    mb = df.groupBy(col_b).agg(F.count(F.lit(1)).cast("bigint").alias("_cb"))
    n = F.lit(int(n_total)).cast("bigint")
    joined = cells.join(F.broadcast(ma), col_a).join(F.broadcast(mb), col_b)
    # observed-cell term, nano-rounded before the exact sum; plus each
    # observed cell's expected mass e = ra*cb/N (float, also nano-
    # rounded) so the missing-cell correction N - sum(e_obs) is exact
    num = (F.col("_o") * n - F.col("_ra") * F.col("_cb")).cast("double")
    den = (n * F.col("_ra") * F.col("_cb")).cast("double")
    term_nano = F.round(num * num / den * 1e9).cast("bigint")
    e_nano = F.round(
        (F.col("_ra") * F.col("_cb")).cast("double")
        / n.cast("double")
        * 1e9
    ).cast("bigint")
    agg = joined.groupBy().agg(
        F.sum("_o").cast("bigint").alias("n_rows"),
        F.sum(term_nano).cast("bigint").alias("_t"),
        F.sum(e_nano).cast("bigint").alias("_e"),
        F.count_distinct(F.col(col_a)).cast("bigint").alias("_nr"),
        F.count_distinct(F.col(col_b)).cast("bigint").alias("_nc"),
    )
    # missing-cell mass: sum over unobserved (a,b) of e = N - sum_obs(e)
    chi2_nano = F.col("_t") + (
        F.lit(int(n_total) * 10**9).cast("bigint") - F.col("_e")
    )
    return agg.select(
        "n_rows",
        ((F.col("_nr") - 1) * (F.col("_nc") - 1)).cast("bigint").alias(
            "dof"
        ),
        F.round(chi2_nano.cast("double") / 1e9, 6).alias("chi2"),
    )


def fd_report(
    df: DataFrame,
    key_col: str,
    dep_col: str,
    relation: str | None = None,
) -> DataFrame:
    """Functional-dependency audit: does ``key_col`` determine
    ``dep_col`` in this table? The schema-inference companion of the
    referential-integrity audit — candidate keys, denormalization
    safety ("can I collapse this dimension onto the fact?"), and
    data-entry drift (one order suddenly carrying two customer ids)
    all reduce to this one question.

    Returns ONE row: ``(relation, n_keys, n_violating_keys,
    violation_permille, max_distinct)`` — a key VIOLATES when it maps
    to more than one distinct non-NULL dependent value; permille is
    half-away integer division (no float ratio). NULL dependents are
    ignored (SQL's n/a marker can't contradict a value).

    Scale: one (key, dep) distinct — map-side combinable — then a
    key-grain count and a 1-row verdict; the widest frame is the
    distinct pair set, bounded by the table's own cardinality, and
    nothing ever sorts globally.
    """
    label = relation or f"{key_col}->{dep_col}"
    pairs = (
        df.filter(F.col(dep_col).isNotNull())
        .select(F.col(key_col).alias("_k"), F.col(dep_col).alias("_v"))
        .distinct()
    )
    per_key = pairs.groupBy("_k").agg(
        F.count(F.lit(1)).cast("bigint").alias("_nd")
    )
    return per_key.agg(
        F.lit(label).alias("relation"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.count(F.when(F.col("_nd") > 1, 1)).cast("bigint").alias(
            "n_violating_keys"
        ),
        F.expr(
            "(2000 * count(CASE WHEN _nd > 1 THEN 1 END) + count(*)) "
            "DIV (2 * count(*))"
        ).alias("violation_permille"),
        F.max("_nd").cast("bigint").alias("max_distinct"),
    )
