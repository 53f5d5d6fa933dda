"""banded_interval_join: parity vs a naive quadratic reference, boundary
exactness to the microsecond, keyed variant, and the no-nested-loop plan
guarantee that is the operator's whole reason to exist."""

from __future__ import annotations

import contextlib
import datetime
import io
import random

import pytest
from pyspark.sql import functions as F

from moisturizer_spark.operators.asof import banded_interval_join

BASE = datetime.datetime(2024, 1, 1)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, ts timestamp, k long")


def _naive(rows_l, rows_r, lo, hi, keyed=False):
    out = set()
    for a in rows_l:
        for b in rows_r:
            if keyed and a[2] != b[2]:
                continue
            if (
                a[1] + datetime.timedelta(seconds=lo)
                <= b[1]
                <= a[1] + datetime.timedelta(seconds=hi)
            ):
                out.add((a[0], b[0]))
    return out


@pytest.fixture(scope="module")
def random_rows():
    rng = random.Random(7)
    return [
        (
            i,
            BASE + datetime.timedelta(microseconds=rng.randint(0, 3_600_000_000)),
            rng.randint(0, 5),
        )
        for i in range(250)
    ]


@pytest.mark.parametrize("lo,hi", [(-120, 120), (30, 90), (-90, -30), (0, 0)])
def test_parity_vs_naive(spark, random_rows, lo, hi):
    df = _mk(spark, random_rows)
    out = banded_interval_join(
        df.select(F.col("id").alias("lid"), "ts"),
        df.select(F.col("id").alias("rid"), F.col("ts").alias("rts")),
        "ts",
        "rts",
        lo,
        hi,
    )
    got = {(r.lid, r.rid_right) for r in out.collect()}
    assert got == _naive(random_rows, random_rows, lo, hi)


def test_keyed_parity_vs_naive(spark, random_rows):
    df = _mk(spark, random_rows)
    out = banded_interval_join(
        df.select(F.col("id").alias("lid"), "ts", "k"),
        df.select(F.col("id").alias("rid"), F.col("ts").alias("rts"), "k"),
        "ts",
        "rts",
        -120,
        120,
        on=["k"],
    )
    got = {(r.lid, r.rid_right) for r in out.collect()}
    assert got == _naive(random_rows, random_rows, -120, 120, keyed=True)


def test_boundaries_exact_to_the_microsecond(spark):
    rows = [
        (0, BASE, 0),
        (1, BASE + datetime.timedelta(seconds=120), 0),
        (2, BASE + datetime.timedelta(seconds=120, microseconds=1), 0),
        (3, BASE - datetime.timedelta(seconds=120), 0),
        (4, BASE - datetime.timedelta(seconds=120, microseconds=1), 0),
    ]
    df = _mk(spark, rows)
    out = banded_interval_join(
        df.select(F.col("id").alias("lid"), "ts"),
        df.select(F.col("id").alias("rid"), F.col("ts").alias("rts")),
        "ts",
        "rts",
        -120,
        120,
    )
    matches_of_0 = {r.rid_right for r in out.collect() if r.lid == 0}
    # ±120s inclusive; one microsecond beyond is out
    assert matches_of_0 == {0, 1, 3}


def test_no_duplicate_pairs(spark, random_rows):
    df = _mk(spark, random_rows)
    out = banded_interval_join(
        df.select(F.col("id").alias("lid"), "ts"),
        df.select(F.col("id").alias("rid"), F.col("ts").alias("rts")),
        "ts",
        "rts",
        -120,
        120,
    )
    pairs = [(r.lid, r.rid_right) for r in out.collect()]
    assert len(pairs) == len(set(pairs)), "a pair matched in two bands"


def test_plan_is_equi_join_not_nested_loop(spark, random_rows):
    df = _mk(spark, random_rows)
    out = banded_interval_join(
        df.select(F.col("id").alias("lid"), "ts"),
        df.select(F.col("id").alias("rid"), F.col("ts").alias("rts")),
        "ts",
        "rts",
        -120,
        120,
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_empty_interval_rejected(spark, random_rows):
    df = _mk(spark, random_rows)
    with pytest.raises(ValueError, match="empty interval"):
        banded_interval_join(df, df, "ts", "ts", 10, 5)


def test_banded_join_traffic_spike_parity_and_aqe_split(spark):
    """The operator's skew story, proven rather than asserted: a traffic
    spike concentrates one band, and — unlike the textan scoring joins,
    whose cached build side AQE cannot re-plan — BOTH children here are
    fresh shuffle reads, exactly the shape OptimizeSkewedJoin handles.
    With the skew thresholds floored the executed plan must show a
    skew=true split, and the pair count must still be exact (numpy
    two-pointer ground truth)."""
    import numpy as np

    rng = random.Random(13)
    spike = [
        (i, BASE + datetime.timedelta(microseconds=rng.randint(0, 240_000_000)), 0)
        for i in range(600)
    ]
    spread = [
        (
            4000 + i,
            BASE
            + datetime.timedelta(hours=2)
            + datetime.timedelta(microseconds=rng.randint(0, 3_600_000_000)),
            0,
        )
        for i in range(400)
    ]
    rows = spike + spread

    def _us(dt):
        td = dt - BASE
        return (td.days * 86_400_000_000 + td.seconds * 1_000_000
                + td.microseconds)

    df = _mk(spark, rows)
    us = np.sort(np.array([_us(r[1]) for r in rows], dtype=np.int64))
    lo = np.searchsorted(us, us - 120_000_000, side="left")
    hi = np.searchsorted(us, us + 120_000_000, side="right")
    want = int((hi - lo).sum())

    conf = spark.conf
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.forceOptimizeSkewedJoin",
    )
    saved = {k: conf.get(k, None) for k in keys}
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "2048",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2048")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
        conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        out = banded_interval_join(
            df.select(F.col("id").alias("lid"), "ts"),
            df.select(F.col("id").alias("rid"), F.col("ts").alias("rts")),
            "ts",
            "rts",
            -120,
            120,
        )
        # collect the Dataset itself so ITS adaptive plan finalizes
        # (count() would execute a different query execution)
        got = len(out.collect())
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert got == want
        assert "skew=true" in plan, (
            "AQE did not split the spiked band — the operator's "
            "documented skew story no longer holds"
        )
    finally:
        for key, val in saved.items():
            if val is None:
                conf.unset(key)
            else:
                conf.set(key, val)


def test_scd2_build_collapses_and_orders(spark):
    """Consecutive unchanged attributes collapse; interleaved values
    re-version; equal timestamps resolve by the tiebreak column (the
    classic silent SCD2 bug, here a hard contract); NULL attributes
    compare as values."""
    from pyspark.sql import functions as F

    from moisturizer_spark.operators.asof import scd2_build

    rows = [
        (1, "A", 1, 10),
        (1, "A", 2, 11),   # unchanged -> collapses
        (1, "B", 3, 12),
        (1, "A", 4, 13),   # back to A -> NEW version
        (2, None, 1, 20),  # NULL is a value
        (2, None, 2, 21),  # unchanged NULL collapses
        (2, "X", 2, 22),   # same ts as row 21: tiebreak by id
    ]
    df = spark.createDataFrame(rows, "k long, attr string, ts long, id long")
    got = [
        (r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_build(
            df, "k", ["attr"], "ts", tiebreak_cols=["id"]
        ).orderBy("k", "valid_from", "id").collect()
    ]
    assert got == [
        (1, "A", 1, 3, False),
        (1, "B", 3, 4, False),
        (1, "A", 4, None, True),
        (2, None, 1, 2, False),
        (2, "X", 2, None, True),
    ]


def test_pit_join_picks_containing_version(spark):
    from moisturizer_spark.operators.asof import pit_join

    dim = spark.createDataFrame(
        [
            ("k1", "bronze", 10, 20),
            ("k1", "silver", 20, 40),
            ("k1", "gold", 40, None),
            ("k2", "solo", 5, None),
        ],
        "key string, tier string, valid_from int, valid_to int",
    )
    facts = spark.createDataFrame(
        [
            ("k1", 1, 15),   # inside bronze
            ("k1", 2, 20),   # boundary: half-open -> silver, not bronze
            ("k1", 3, 39),   # last instant of silver
            ("k1", 4, 99),   # open interval -> gold
            ("k1", 5, 3),    # precedes first version -> NULL
            ("k2", 6, 5),    # open interval from its own start
            ("k3", 7, 50),   # unknown key -> NULL
        ],
        "key string, fact_id int, ts int",
    )
    got = {
        r["fact_id"]: (r["tier_dim"], r["valid_from_dim"])
        for r in pit_join(facts, dim, "key", "ts").collect()
    }
    assert got == {
        1: ("bronze", 10),
        2: ("silver", 20),
        3: ("silver", 20),
        4: ("gold", 40),
        5: (None, None),
        6: ("solo", 5),
        7: (None, None),
    }


def test_pit_join_zero_length_versions_match_nothing(spark):
    """Two same-timestamp changes produce a zero-length version; the
    half-open rule resolves the lookup to the LAST version at that
    instant, exactly once per fact."""
    from moisturizer_spark.operators.asof import pit_join, scd2_build

    changes = spark.createDataFrame(
        [("k", "a", 10, 1), ("k", "b", 10, 2), ("k", "c", 30, 3)],
        "key string, v string, ts int, seq int",
    )
    dim = scd2_build(changes, "key", ["v"], "ts", tiebreak_cols=["seq"])
    facts = spark.createDataFrame(
        [("k", 1, 10), ("k", 2, 29), ("k", 3, 31)],
        "key string, fact_id int, ts int",
    )
    rows = pit_join(facts, dim, "key", "ts").collect()
    assert len(rows) == 3  # exactly one match per fact, no dup explosion
    got = {r["fact_id"]: r["v_dim"] for r in rows}
    assert got == {1: "b", 2: "b", 3: "c"}


def test_pit_join_equi_key_plan_no_nested_loop(spark):
    """The interval test must ride the equi join as a residual
    predicate — never a BroadcastNestedLoopJoin/CartesianProduct."""
    import contextlib
    import io

    from moisturizer_spark.operators.asof import pit_join

    dim = spark.createDataFrame(
        [("k1", "x", 0, None)],
        "key string, attr string, valid_from int, valid_to int",
    )
    facts = spark.createDataFrame(
        [("k1", 1, 5)], "key string, fact_id int, ts int"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pit_join(facts, dim, "key", "ts").explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_coalesce_intervals_planted(spark):
    from moisturizer_spark.operators.asof import coalesce_intervals

    rows = [
        ("u1", 1, 5), ("u1", 3, 8), ("u1", 8, 9),   # overlap + touch -> [1,9)
        ("u1", 20, 25),                              # separate island
        ("u2", 0, 2), ("u2", 2, 4), ("u2", 10, 11),  # touch chain + island
    ]
    df = spark.createDataFrame(rows, "u string, s int, e int")
    got = sorted(
        (r["u"], r["island_start"], r["island_end"])
        for r in coalesce_intervals(df, ["u"], "s", "e").collect()
    )
    assert got == [("u1", 1, 9), ("u1", 20, 25), ("u2", 0, 4), ("u2", 10, 11)]


def test_coalesce_intervals_contained_and_equal(spark):
    from moisturizer_spark.operators.asof import coalesce_intervals

    rows = [("k", 1, 10), ("k", 2, 3), ("k", 1, 10), ("k", 5, 7)]
    df = spark.createDataFrame(rows, "k string, s int, e int")
    got = [
        (r["island_start"], r["island_end"])
        for r in coalesce_intervals(df, ["k"], "s", "e").collect()
    ]
    assert got == [(1, 10)]


def test_coalesce_intervals_matches_python_replay(spark):
    import random

    from moisturizer_spark.operators.asof import coalesce_intervals

    rng = random.Random(31)
    rows = []
    for u in range(5):
        for _ in range(40):
            s = rng.randrange(1000)
            rows.append((f"u{u}", s, s + rng.randrange(1, 30)))

    def ref(intervals):
        out = []
        for s, e in sorted(intervals):
            if out and s <= out[-1][1]:
                out[-1][1] = max(out[-1][1], e)
            else:
                out.append([s, e])
        return [tuple(x) for x in out]

    df = spark.createDataFrame(rows, "u string, s int, e int")
    got = {}
    for r in coalesce_intervals(df, ["u"], "s", "e").collect():
        got.setdefault(r["u"], []).append((r["island_start"], r["island_end"]))
    for u in {r[0] for r in rows}:
        assert sorted(got[u]) == ref([(s, e) for k, s, e in rows if k == u])
