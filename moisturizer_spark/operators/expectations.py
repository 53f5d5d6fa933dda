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
    ``approx_count_distinct`` or the KMV sketch cells
    (``operators/sketches.py``) at the same call site — the report
    schema is unchanged. Determinism: counts exact; values compare as
    the ORIGINAL column order semantics cast to ``decimal`` (exact),
    output min/max/sum as double via the decimal→double convention.
    """
    stack = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(c).cast(decimal).alias("value"),
                )
                for c in cols
            ]
        )
    ).alias("s")
    long = df.select(stack).select("s.column", "s.value")
    return (
        long.groupBy("column")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count("value").cast("bigint").alias("n_filled"),
            F.count_distinct("value").cast("bigint").alias("ndv"),
            F.min("value").cast("double").alias("min_value"),
            F.max("value").cast("double").alias("max_value"),
            F.sum("value").cast("double").alias("sum_value"),
        )
        .orderBy("column")
    )
