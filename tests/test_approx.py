"""Approximate-aggregate accuracy: HLL distinct counts vs exact.

The workload's `events_distinct_reach` keeps COUNT(DISTINCT) exact for
cross-engine hash-matching; this pins the scale path (one-pass HLL, no
expand) to within its advertised error so the swap-in is safe.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from moisturizer_spark.session import load_tables


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= max(0.05 * r["exact"], 2.0), r


def test_hll_reach_within_tolerance(spark, sf_dir):
    # HLL++ at rsd=0.023 should sit well within 5% of exact on every group
    import __spark_entry__ as em

    rows = em.queries()["events_hll_reach"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        err = abs(r["approx_users"] - r["exact_users"]) / max(r["exact_users"], 1)
        assert err <= 0.05, f"{r['event_type']}: HLL error {err:.3f}"


def test_frequent_items_equals_group_by_having(spark, sf_dir):
    from moisturizer_spark.operators.frequent import frequent_items
    from moisturizer_spark.session import load_tables

    events = load_tables(spark, sf_dir, ("events",))["events"]
    n = events.count()
    threshold = (n * 7 + 999) // 1000
    exact = {
        (r["user_id"], r["n"])
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= threshold)
        .collect()
    }
    got = {
        (r["user_id"], r["n"])
        for r in frequent_items(events, "user_id", support=(7, 1000)).collect()
    }
    assert got == exact and got  # non-trivial fixture


def test_frequent_items_tiny_support_and_validation(spark):
    import pytest
    from moisturizer_spark.operators.frequent import frequent_items

    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1, "k string"
    )
    got = {(r["k"], r["n"]) for r in frequent_items(df, "k", support=(3, 10)).collect()}
    assert got == {("a", 6), ("b", 3)}
    with pytest.raises(ValueError):
        frequent_items(df, "k", support=(0, 10))


def test_frequent_items_null_heavy_hitter_and_single_pass(spark):
    from moisturizer_spark.operators.frequent import frequent_items

    # null is the most common value: it must appear in the result with
    # its exact count (null-safe verify join), matching GROUP BY output
    df = spark.createDataFrame(
        [(None,)] * 5 + [("a",)] * 4 + [("b",)] * 1, "k string"
    )
    got = {(r["k"], r["n"]) for r in frequent_items(df, "k", support=(3, 10)).collect()}
    assert got == {(None, 5), ("a", 4)}

    # the candidate phase folds the global count into its one job — no
    # separate df.count() scan
    sc = spark.sparkContext
    sc.setJobGroup("fi_single_pass", "frequent_items candidate phase")
    try:
        frequent_items(df, "k", support=(3, 10))  # no action on the result
    finally:
        sc.setJobGroup(None, None)
    jobs = spark._jsc.sc().statusTracker().getJobIdsForGroup("fi_single_pass")
    assert len(jobs) == 1, f"candidate phase ran {len(jobs)} jobs, want 1"


def test_hll_rollup_merge_accuracy_and_losslessness(spark, sf_dir):
    from moisturizer_spark.operators.sketches import hll_merge_estimate, hll_rollup
    from moisturizer_spark.session import load_tables

    events = load_tables(spark, sf_dir, ("events",))["events"].withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    exact = {
        r["event_type"]: r["exact"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    daily = hll_rollup(events, ["day", "event_type"], "user_id")
    merged = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_merge_estimate(daily, ["event_type"]).collect()
    }
    assert set(merged) == set(exact)
    for et, ex in exact.items():
        assert abs(merged[et] - ex) / ex <= 0.05, (et, merged[et], ex)

    # lossless merge: sketching directly at the coarse grain estimates
    # the same as merging the stored fine-grained cells
    direct = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_merge_estimate(
            hll_rollup(events, ["event_type"], "user_id"), ["event_type"]
        ).collect()
    }
    assert merged == direct


def test_ddsketch_quantiles_relative_error_bound(spark, sf_dir):
    """Sketch quantiles must honor DDSketch's guarantee: within alpha
    (relative) of a true quantile — checked against exact percentiles
    over o_totalprice per priority."""
    from moisturizer_spark.operators.sketches import (
        ddsketch_quantiles,
        ddsketch_rollup,
    )

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    alpha = 0.01
    qs = [0.1, 0.5, 0.9, 0.99]
    roll = ddsketch_rollup(orders, ["o_orderpriority"], "o_totalprice", alpha)
    est = {
        (r["o_orderpriority"], r["q"]): r["quantile_est"]
        for r in ddsketch_quantiles(roll, ["o_orderpriority"], qs, alpha).collect()
    }
    # ground truth = the rank-ceil(q*n) DATA value (the sketch's actual
    # guarantee target), not an interpolated percentile
    exact = {
        r["o_orderpriority"]: sorted(r["vals"])
        for r in orders.groupBy("o_orderpriority")
        .agg(F.collect_list("o_totalprice").alias("vals"))
        .collect()
    }
    assert est
    import math

    for (prio, q), v in est.items():
        vals = exact[prio]
        true = float(vals[max(math.ceil(q * len(vals)), 1) - 1])
        assert abs(v - true) / true <= alpha + 1e-9, (prio, q, v, true)


def test_ddsketch_merge_equals_direct_and_nonpositive_bucket(spark):
    from pyspark.sql import Row

    from moisturizer_spark.operators.sketches import (
        ddsketch_quantiles,
        ddsketch_rollup,
    )

    rows = [Row(g=("a" if i % 2 else "b"), sub=i % 4, v=float(i)) for i in range(1, 401)]
    rows += [Row(g="a", sub=9, v=0.0), Row(g="a", sub=9, v=-5.0)]
    df = spark.createDataFrame(rows)
    fine = ddsketch_rollup(df, ["g", "sub"], "v")
    # merging the fine-grain cells == sketching at the coarse grain
    direct = ddsketch_rollup(df, ["g"], "v")
    merged = {
        (r["g"], r["_qbin"]): r["_qn"]
        for r in fine.groupBy("g", "_qbin").agg(F.sum("_qn").alias("_qn")).collect()
    }
    want = {(r["g"], r["_qbin"]): r["_qn"] for r in direct.collect()}
    assert merged == want
    # the two non-positive values occupy the lowest ranks of group "a"
    est = {
        (r["g"], r["q"]): r["quantile_est"]
        for r in ddsketch_quantiles(fine, ["g"], [0.0, 0.5]).collect()
    }
    assert est[("a", 0.0)] == 0.0  # min of group a is the reserved bucket
    assert est[("b", 0.5)] > 0


def test_det_hll_accuracy_and_merge_law(spark):
    """Deterministic HLL: (a) estimate within ~5x the theoretical
    relative error (1.04/sqrt(1024) ≈ 3.3%) on 10k distincts; (b)
    merging per-part cells equals sketching the union — the register
    MAX is associative/commutative/idempotent, so a stored rollup
    loses nothing; (c) the estimator matches its DuckDB rendering on
    the same data."""
    import duckdb

    from moisturizer_spark.operators.sketches import (
        det_hll_cells,
        det_hll_estimate,
        sql_det_hll_estimate,
    )

    df = spark.createDataFrame(
        [(i % 4, f"user{i % 10_000}") for i in range(40_000)], "part int, uid string"
    ).withColumn("g", F.lit("all"))
    direct = det_hll_cells(df, ["g"], "uid")
    est = det_hll_estimate(direct, ["g"]).first()["approx_distinct"]
    assert abs(est - 10_000) / 10_000 < 0.17, est

    # merge law: per-part cells merged == direct cells
    per_part = det_hll_cells(df, ["g", "part"], "uid")
    merged_est = det_hll_estimate(per_part, ["g"]).first()["approx_distinct"]
    assert merged_est == est

    # oracle parity on an in-memory table
    rows = [(r["part"], r["uid"]) for r in df.select("part", "uid").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (part INT, uid VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows[:5000])
    want = con.execute(
        "WITH src AS (SELECT 'all' AS g, uid FROM t),\n"
        + sql_det_hll_estimate("src", ["g"], "uid")
    ).fetchone()[1]
    got = det_hll_estimate(
        det_hll_cells(
            spark.createDataFrame(rows[:5000], "part int, uid string")
            .withColumn("g", F.lit("all")),
            ["g"],
            "uid",
        ),
        ["g"],
    ).first()["approx_distinct"]
    assert got == want


def test_ddsketch_small_values_and_tiny_accuracy(spark):
    """Review-finding regressions: (a) the operator applies NO absolute
    rounding by default, so small-magnitude data (1e-4-scale latencies)
    keeps the relative-accuracy guarantee instead of collapsing onto
    the 1e-4 grid / the 0.0 sentinel; (b) the positivity shift adapts
    to the bucket width, so the SQL rendering bins identically to the
    Spark expression even for subnormal-adjacent values at tight
    accuracies (where a fixed shift would leave the numerator negative
    and the engines' integer divisions would disagree by one)."""
    import duckdb

    from moisturizer_spark.operators.sketches import (
        ddsketch_bin,
        ddsketch_quantiles,
        ddsketch_rollup,
        sql_ddsketch_bin,
    )

    vals = [1.2e-4, 3.4e-5, 5.6e-90, 7.8e-200, 4.9e-324, 1.0e5]
    df = spark.createDataFrame([(str(v), v) for v in vals], "k string, v double")

    # (a) per-group p50 of a single value must sit within 1% of it
    roll = ddsketch_rollup(df, ["k"], "v")
    est = {r["k"]: r["quantile_est"]
           for r in ddsketch_quantiles(roll, ["k"], [0.5]).collect()}
    for v in vals:
        assert abs(est[str(v)] - v) <= 0.0101 * v, (v, est[str(v)])

    # (b) Spark expression == DuckDB rendering, bucket for bucket,
    # down to alpha=0.001 and the smallest positive double
    for alpha in (0.01, 0.001):
        got = [
            r["b"]
            for r in df.orderBy("v")
            .select(ddsketch_bin("v", alpha).alias("b"))
            .collect()
        ]
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT unnest(?::DOUBLE[]) AS v",
                    [sorted(vals)])
        want = [
            row[0]
            for row in con.execute(
                f"SELECT {sql_ddsketch_bin('v', alpha)} FROM t ORDER BY v"
            ).fetchall()
        ]
        assert got == want, (alpha, got, want)


def test_ddsketch_ignores_nulls_and_validates_qs(spark):
    import pytest
    from pyspark.sql import Row

    from moisturizer_spark.operators.sketches import (
        ddsketch_quantiles,
        ddsketch_rollup,
    )

    rows = [Row(g="a", v=float(i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows)
    with_nulls = df.unionByName(
        spark.createDataFrame([Row(g="a", v=None)] * 50, df.schema)
    )
    # NULLs are skipped (percentile/approx_percentile semantics): the
    # sketch of the null-padded frame equals the sketch without nulls —
    # in particular the nulls do NOT surface as value-0.0 mass deflating
    # low quantiles
    a = {(r["_qbin"], r["_qn"]) for r in ddsketch_rollup(df, ["g"], "v").collect()}
    b = {
        (r["_qbin"], r["_qn"])
        for r in ddsketch_rollup(with_nulls, ["g"], "v").collect()
    }
    assert a == b
    est = {
        r["q"]: r["quantile_est"]
        for r in ddsketch_quantiles(
            ddsketch_rollup(with_nulls, ["g"], "v"), ["g"], [0.1]
        ).collect()
    }
    assert est[0.1] > 5.0  # would be 0.0 if nulls counted as zero mass

    # out-of-range quantiles raise instead of silently dropping the group
    roll = ddsketch_rollup(df, ["g"], "v")
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        ddsketch_quantiles(roll, ["g"], [0.5, 1.5])
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        ddsketch_quantiles(roll, ["g"], [-0.1])


# -- KMV theta-style sketches -------------------------------------------------


def test_kmv_merge_equals_sketch_of_union(spark):
    """The lossless-rollup law: merging two stored KMV cells yields
    EXACTLY the sketch of the unioned data (deterministic md5 hashes,
    no estimate degradation under regrouping)."""
    import pyspark.sql.functions as F

    from moisturizer_spark.operators.sketches import kmv_merge, kmv_sketch

    df = spark.createDataFrame(
        [("a", i) for i in range(500)] + [("b", i) for i in range(300, 900)],
        "grp string, uid long",
    )
    cells = kmv_sketch(df, ["grp"], "uid", k=64)
    a = cells.filter("grp = 'a'").select(F.col("kmv").alias("_a"))
    b = cells.filter("grp = 'b'").select(F.col("kmv").alias("_b"))
    merged = (
        a.join(b).select(kmv_merge(F.col("_a"), F.col("_b"), 64).alias("m")).first()["m"]
    )
    direct = (
        kmv_sketch(df.withColumn("grp", F.lit("all")), ["grp"], "uid", k=64)
        .first()["kmv"]
    )
    assert list(merged) == list(direct)


def test_kmv_estimate_accuracy_and_exact_small_sets(spark):
    import pyspark.sql.functions as F

    from moisturizer_spark.operators.sketches import kmv_estimate, kmv_sketch

    # small set (< k): estimate is EXACT
    small = spark.createDataFrame([(1, i) for i in range(40)], "g int, uid long")
    est = (
        kmv_sketch(small, ["g"], "uid", k=64)
        .select(kmv_estimate(F.col("kmv"), 64).alias("e"))
        .first()["e"]
    )
    assert est == 40.0
    # large set: within the KMV error regime (~1/sqrt(k-2) ≈ 13% at k=64;
    # allow 3 sigma)
    big = spark.createDataFrame([(1, i) for i in range(20000)], "g int, uid long")
    est2 = (
        kmv_sketch(big, ["g"], "uid", k=64)
        .select(kmv_estimate(F.col("kmv"), 64).alias("e"))
        .first()["e"]
    )
    assert abs(est2 - 20000) / 20000 < 0.4


def test_kmv_intersection_estimate_tracks_true_overlap(spark):
    import pyspark.sql.functions as F

    from moisturizer_spark.operators.sketches import (
        kmv_intersect_estimate,
        kmv_sketch,
    )

    # |A|=3000, |B|=3000, |A∩B|=1000
    df = spark.createDataFrame(
        [("a", i) for i in range(3000)] + [("b", i) for i in range(2000, 5000)],
        "grp string, uid long",
    )
    cells = kmv_sketch(df, ["grp"], "uid", k=256)
    a = cells.filter("grp = 'a'").select(F.col("kmv").alias("_a"))
    b = cells.filter("grp = 'b'").select(F.col("kmv").alias("_b"))
    est = (
        a.join(b)
        .select(kmv_intersect_estimate(F.col("_a"), F.col("_b"), 256).alias("e"))
        .first()["e"]
    )
    assert 500 < est < 1600  # true 1000; Jaccard-sample error at k=256
