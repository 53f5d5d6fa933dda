"""As-of join: for each left row, the latest right row at-or-before it.

Spark has no built-in ASOF JOIN (DuckDB/Pandas do), so this composes one
from existing operators — the union-and-window formulation:

1. tag both sides, union on (partition keys, event time),
2. one window pass per partition key ordered by time carries the most
   recent right-row payload forward (``last(..., ignorenulls=True)``),
3. keep left rows, unpack the carried payload.

Cost: ONE shuffle on the partition keys (same as the sort-merge join the
equivalent range-join would need, but with no range-explosion), then a
linear windowed scan — the right strategy at 100 TB, where a naive
``a.ts >= b.ts`` range join degenerates to a near-cross-product.
Skewed partition keys are handled by AQE skew splitting on the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_payload: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: latest right row with time <= left time per key.

    Left rows with no prior right row keep nulls (left-outer semantics,
    matching DuckDB ``ASOF LEFT JOIN``). Ties on time resolve to the right
    row (right side sorts before left at equal times), i.e. ``<=``.
    """
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in on and c != right_time]

    lhs = left.withColumn("_side", F.lit(1)).withColumn("_t", F.col(left_time)).withColumn(
        "_payload",
        F.lit(None).cast(
            "struct<" + ", ".join(
                f"`{c}`: {right.schema[c].dataType.simpleString()}" for c in right_payload + [right_time]
            ) + ">"
        ),
    )
    rhs = right.select(
        *on,
        F.lit(0).alias("_side"),
        F.col(right_time).alias("_t"),
        F.struct(*right_payload, F.col(right_time)).alias("_payload"),
    )
    lhs = lhs.select(*left.columns, "_side", "_t", "_payload")
    rhs_aligned = rhs.select(
        *[
            F.col(c) if c in on else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        "_side",
        "_t",
        "_payload",
    )
    unioned = lhs.unionByName(rhs_aligned)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_match", F.last(F.col("_payload"), ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1).select(
        *left.columns,
        *[F.col("_match")[c].alias(f"{c}{suffix}") for c in right_payload],
        F.col("_match")[right_time].alias(f"{right_time}{suffix}"),
    )
    return out


def banded_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    lo_seconds: int,
    hi_seconds: int,
    on: list[str] | None = None,
    right_payload: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Batch interval join: each left row paired with every right row whose
    time falls in ``[left.t + lo, left.t + hi]`` (inclusive, seconds) —
    the batch sibling of
    :func:`moisturizer_spark.streaming.joins.stream_interval_join`, which
    covers the KEYED case (an equi key makes Spark's planner happy on its
    own). With no equi key, a naive ``ON r.t BETWEEN l.t+lo AND l.t+hi``
    is a BroadcastNestedLoopJoin — a cross product that compares every
    left row with every right row. This operator supplies the missing
    equi key by TIME BANDING (the classic bucketed range-join rewrite):

    1. band width ``W = (hi - lo + 1) seconds`` (in microseconds), so a
       left row's admissible window spans at most two bands;
    2. each right row lands in exactly ONE band
       (``floor(epoch_us / W)``); each left row probes the ≤2 distinct
       bands its window overlaps (explode — a ≤2× fan-out);
    3. equi-join on ``(*on, band)``, then the exact microsecond range
       filter. A (left,right) pair can meet in at most one band (the
       right row has one band id), so no post-join dedup is needed.

    Scale: one shuffle per side keyed on ``(*on, band)`` and a
    sort-merge join — shuffle volume is ~2×|left| + |right| rows, vs the
    |left|×|right| comparisons of the nested-loop plan. Time-clustered
    data (everything in one band) skews the band key; widen with ``on``
    keys when available, or rely on AQE skew splitting — both join
    children are fresh shuffle reads here, exactly the shape
    OptimizeSkewedJoin can re-plan (unlike the persisted-table joins in
    textan, see ``bigram_lm_bits``). Inner semantics only: a band-
    exploded left side would emit unmatched rows once per probed band,
    so left-outer composes as aggregate-then-join-back (see the
    ``events_coactivity`` workload query for the pattern, which gets
    outer semantics for free by letting each row self-match).

    Band arithmetic is PURE integer (``x - pmod(x, W)) DIV W`` — exact
    floor division for any sign), on ``unix_micros`` of the timestamp
    columns, so band assignment can never disagree with the exact
    filter through float rounding. ``lo/hi`` must be whole seconds with
    ``lo <= hi``; timestamps are compared at full microsecond precision.
    TIMESTAMP_NTZ inputs are cast to TIMESTAMP (value-preserving under
    the session's pinned UTC zone — see ``workload._micros``).
    """
    if lo_seconds > hi_seconds:
        raise ValueError(
            f"empty interval: lo={lo_seconds} > hi={hi_seconds}"
        )
    if on is None:
        on = []
    if right_payload is None:
        right_payload = [
            c for c in right.columns if c not in on and c != right_time
        ]
    width_us = (hi_seconds - lo_seconds + 1) * 1_000_000
    lo_us, hi_us = lo_seconds * 1_000_000, hi_seconds * 1_000_000

    def _us(col: str) -> F.Column:
        return F.unix_micros(F.col(col).cast("timestamp"))

    def _band_sql(us_expr: str) -> str:
        # exact integer floor division, correct for negative epochs too:
        # pmod is the non-negative remainder, so the subtraction snaps
        # down to the band start for either sign, and DIV is then exact.
        return (
            f"(({us_expr}) - pmod({us_expr}, {width_us})) DIV {width_us}"
        )

    lhs = left.withColumn("_ivj_us", _us(left_time)).withColumn(
        "_ivj_band",
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr(_band_sql(f"_ivj_us + {lo_us}")),
                    F.expr(_band_sql(f"_ivj_us + {hi_us}")),
                )
            )
        ),
    )
    rhs = right.select(
        *on,
        _us(right_time).alias("_ivj_rus"),
        F.col(right_time).alias(f"{right_time}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_payload],
    ).withColumn("_ivj_band", F.expr(_band_sql("_ivj_rus")))
    joined = lhs.join(
        rhs,
        [*on, "_ivj_band"],
    ).filter(
        (F.col("_ivj_rus") >= F.col("_ivj_us") + F.lit(lo_us))
        & (F.col("_ivj_rus") <= F.col("_ivj_us") + F.lit(hi_us))
    )
    return joined.drop("_ivj_us", "_ivj_band", "_ivj_rus")


def scd2_build(
    changes: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Build a Type-2 slowly-changing dimension from a change log: per
    key, consecutive records with UNCHANGED attributes collapse, each
    surviving attribute version carries ``valid_from`` (its first
    appearance), ``valid_to`` (the next version's start; NULL while
    current) and ``is_current`` — the half-open intervals an as-of
    join (:func:`asof_join`) consumes.

    ``tiebreak_cols`` extends the per-key ordering past ``ts_col`` to a
    TOTAL order (pass the change-log's unique id) — without it, equal
    timestamps make version order nondeterministic, which is the
    classic silent SCD2 bug.

    Plan: two windows over the same (key, order) partitioning — a lag
    per attribute to detect change rows, a lead for the interval end —
    so the whole build is ONE shuffle on the key (the second window
    reuses the sort). Change detection is null-safe (``<=>``): a NULL
    attribute is a value, not a wildcard. Scale: windows partition per
    key; no key's history is ever driver-side."""
    from pyspark.sql import Window

    order = [ts_col, *(tiebreak_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    first = F.row_number().over(w) == 1
    versions = changes.withColumn(
        "_is_version", first | changed
    ).filter("_is_version")
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return (
        versions.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(key_col, *attr_cols, "valid_from", "valid_to", "is_current")
    )


def pit_join(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    ts_col: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    attr_cols: list[str] | None = None,
    suffix: str = "_dim",
    how: str = "left",
) -> DataFrame:
    """Point-in-time join: each fact row picks the dimension VERSION
    whose half-open validity interval contains the fact's timestamp —
    the lookup a Type-2 SCD (:func:`scd2_build`) exists to serve
    ("what was this customer's segment WHEN the order happened", the
    leakage-free feature-store read). Match rule: ``valid_from <= ts``
    and (``valid_to`` IS NULL or ``ts < valid_to``).

    ``attr_cols`` defaults to every dim column except the key, the
    validity pair, and ``is_current``; matched attributes come back
    suffixed, plus ``valid_from{suffix}`` as the version identifier.
    ``how='left'`` keeps facts that precede the key's first version
    (NULL attributes), the warehouse default.

    Scale: this is an EQUI join on the key with the interval test as a
    residual join predicate — a SortMergeJoin/broadcast on the key,
    never a range-explosion or nested loop: when the dim is a proper
    SCD2 (intervals per key are disjoint and tile the timeline —
    scd2_build's construction guarantees it, zero-length versions from
    equal-timestamp changes match nothing by half-openness), each fact
    row matches AT MOST ONE version, so output cardinality is bounded
    by |facts|. Per-key version history fans out only within the
    matched key's sort run; hot keys split under AQE. An unversioned
    (messy, overlapping) dim is the caller's bug — this operator
    faithfully returns the duplicate matches rather than guessing.

    Works UNCHANGED with a STREAMING fact side (Structured Streaming's
    stream-static join): each event enriches with the version valid at
    its EVENT time, so late data gets the historical version instead
    of the current one — the leakage-free streaming feature read
    (e2e-tested in ``tests/test_streaming.py``)."""
    if attr_cols is None:
        attr_cols = [
            c
            for c in dim.columns
            if c not in (key_col, valid_from_col, valid_to_col, "is_current")
        ]
    d = dim.select(
        F.col(key_col).alias("_k"),
        F.col(valid_from_col).alias("_vf"),
        F.col(valid_to_col).alias("_vt"),
        *[F.col(c).alias(f"{c}{suffix}") for c in attr_cols],
    )
    cond = (
        (facts[key_col] == d["_k"])
        & (d["_vf"] <= facts[ts_col])
        & (d["_vt"].isNull() | (facts[ts_col] < d["_vt"]))
    )
    return facts.join(d, cond, how).select(
        *facts.columns,
        *[f"{c}{suffix}" for c in attr_cols],
        F.col("_vf").alias(f"{valid_from_col}{suffix}"),
    )


def coalesce_intervals(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge overlapping or touching half-open intervals per key — the
    gaps-and-islands primitive behind coverage/active-time analytics,
    interval dedup, and validity-window repair: ``[1,5) ∪ [3,8) ∪
    [8,9) → [1,9)``. Returns one row per merged island:
    ``(key…, island_start, island_end)``.

    The sweep is two window passes over ONE (key, start, end) sort: a
    row opens a new island iff its start lies strictly past the running
    max of all earlier ends (half-open semantics: an interval starting
    exactly at the previous max end TOUCHES it and merges); a running
    sum of those open-flags numbers the islands; min/max per island
    close them. Works for any orderable interval type (ints, micros,
    timestamps) with exact comparisons — no epsilon, no floats.

    Scale: one shuffle on the key; the two windows and the final
    aggregate all share that partitioning (per-key sort runs, the SCD2
    build shape). Zero-length intervals (start == end) merge into any
    island containing their point and otherwise produce a zero-length
    island — faithful, stated."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    opens = (
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end)
    ).cast("bigint")
    with_island = df.select(
        *key_cols,
        start_col,
        end_col,
        F.sum(opens)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_island"),
    )
    return (
        with_island.groupBy(*key_cols, "_island")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
        )
        .drop("_island")
    )
