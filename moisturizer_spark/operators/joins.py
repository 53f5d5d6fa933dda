"""Join-side reduction infrastructure.

The fact-side shuffle dominates a big join's cost. When the dimension
side is SELECTIVE but too large to broadcast as rows (the gap between
"fits in `spark.sql.autoBroadcastJoinThreshold`" and "fits in executor
memory"), a Bloom sketch of the dim's join keys — kilobytes to a few
megabytes — filters the fact side BEFORE its shuffle, cutting shuffle
volume by the dim's selectivity at the cost of one tiny aggregation.
Spark 3.3+ can inject this automatically (``spark.sql.optimizer.
runtime.bloomFilter.enabled``) when its cost heuristics fire; this
operator is the EXPLICIT form for when the planner's heuristics miss
(filter hidden behind an opaque expression, cross-query reuse of one
sketch, or a dim produced mid-pipeline where runtime filter injection
does not reach). Spark's own ``bloom_filter_agg`` is internal-only
(not SQL-registered in 4.x), so the sketch here is built from public
primitives: ``xxhash64`` positions, ``bit_or`` word aggregation, and
an array-literal probe — everything JVM-side, whole-stage-codegen.

Correctness is unconditional: build and probe compute bit positions
with the IDENTICAL expressions, so a joining key can never miss (no
false negatives); false positives are eliminated by the exact join
that follows. The sketch therefore never changes results — only
shuffle bytes — which is what makes the workload query hash-checkable
against a plain-join oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F


def _positions(key: Column, n_hashes: int, n_bits: int) -> list[Column]:
    """Kirsch-Mitzenmacher double hashing: position_i = (h1 + i·h2)
    mod m from two independent xxhash64 draws, both pre-reduced mod m
    so the combination stays far inside int64. Build and probe share
    THIS function — no-false-negative correctness is structural."""
    h1 = F.pmod(F.xxhash64(key), F.lit(n_bits))
    h2 = F.pmod(F.xxhash64(key, F.lit("bloom2")), F.lit(n_bits))
    return [
        F.pmod(h1 + F.lit(i) * h2, F.lit(n_bits)) for i in range(n_hashes)
    ]


def bloom_prefilter(
    big: DataFrame,
    big_key: str,
    small: DataFrame,
    small_key: str,
    expected_items: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """Filter ``big`` to rows whose ``big_key`` MIGHT appear among
    ``small``'s ``small_key`` values, via a Bloom sketch built in one
    map-side-combinable aggregation over the small side. Follow with
    the exact equi join — the prefilter is a bandwidth optimization,
    not a join.

    ``expected_items`` sizes the sketch (defaults to a distinct-count
    of the small side's keys — one extra cheap aggregation; pass it
    when known to skip that). Sketch size is ``~1.44·expected_items·
    log2(1/fpp)`` bits (~1.2 MB at 10^6 keys, 1% fpp) — set by the
    parameters, NEVER by either table's row count. Build: each key
    emits its hash positions, which aggregate to int64 words via
    ``bit_or`` (map-side combinable, ≤ n_bits/64 result rows); the
    word rows collect to the driver and ship back as ONE array
    literal. Probe: k shift-and-mask tests against that literal,
    whole-stage codegen, no UDF, no join.

    Scale: the win is on the BIG side — rows failing the sketch never
    reach the join's Exchange (or the join at all), so shuffle volume
    drops by the dim's selectivity. An empty small side returns an
    empty frame (the semi-join identity). Keys hash by their exact
    value with integer keys canonicalized to BIGINT — big/small key
    TYPES must agree on that canonicalization (int vs string key pairs
    are the caller's modeling bug, as in any equi join)."""
    int_types = ("int", "bigint", "smallint", "tinyint")
    if expected_items is None:
        expected_items = small.select(small_key).distinct().count()
    if expected_items == 0:
        return big.filter(F.lit(False))
    n_bits = max(
        64,
        int(math.ceil(-expected_items * math.log(fpp) / math.log(2) ** 2)),
    )
    n_hashes = max(1, min(8, round(n_bits / expected_items * math.log(2))))

    skey = F.col(small_key)
    if dict(small.dtypes)[small_key] in int_types:
        skey = skey.cast("bigint")
    pos = F.explode(F.array(*_positions(skey, n_hashes, n_bits))).alias(
        "_pos"
    )
    words = (
        small.select(pos)
        .select(
            (F.col("_pos") / 64).cast("int").alias("_w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(_pos, 64) AS INT))"
            ).alias("_m"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_m").alias("_word"))
        # driver fetch is <= n_bits/64 word rows — sketch-sized by the
        # (expected_items, fpp) parameters, never data-sized: the
        # allowlisted bounded-scalar pattern
        .collect()
    )
    dense = [0] * ((n_bits + 63) // 64)
    for r in words:
        dense[r["_w"]] = r["_word"]
    sketch = F.lit(dense)  # ONE ArrayType literal node

    bkey = F.col(big_key)
    if dict(big.dtypes)[big_key] in int_types:
        bkey = bkey.cast("bigint")
    hit = F.lit(True)
    for p in _positions(bkey, n_hashes, n_bits):
        word = F.get(sketch, (p / 64).cast("int"))
        hit = hit & (F.bit_get(word, F.pmod(p, F.lit(64))) == 1)
    return big.filter(hit)
