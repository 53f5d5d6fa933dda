"""Round-11 second-wave interleaved A/B: shortest-paths merge shapes,
LPA flip folding, copresence-chain distinct partitioning, basket-reuse
for part_affinity_lift, and the agreement-report shared subset.
Variants alternate inside ONE session so co-tenant drift cancels (the
r10/r11 measurement discipline).

Usage: python tools/ab_r11b.py [--reps N] [--sf-dir DIR] [--only case...]
Prints one JSON line per (case, variant): per-rep seconds, job count of
the last rep, and a result checksum (every variant of a case must
match).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from moisturizer_spark import workload
    from moisturizer_spark.operators import graph as G
    from moisturizer_spark.operators.common import cache_scope, materialize
    from moisturizer_spark.operators.frequent import basket_pairs
    from moisturizer_spark.session import get_spark, load_tables

    spark = get_spark(app_name="ab_r11b", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    warm = spark.range(1_000_000)
    warm.selectExpr("sum(cast(id as decimal(15,4))) as s").collect()
    warm.join(spark.range(100).hint("broadcast"), "id").count()
    t = load_tables(spark, args.sf_dir)
    for df in t.values():
        df.head(1)
    tracker = spark.sparkContext.statusTracker()

    def cop_pairs(min_cells, shape="base"):
        cell = t["events"].select(
            F.concat(
                F.col("event_type"), F.lit("|"),
                F.date_trunc("hour", F.col("ts")).cast("string"),
            ).alias("cell"),
            F.col("user_id"),
        )
        if shape == "cellpart":
            cell = cell.repartition("cell")
        elif shape == "userpart":
            cell = cell.repartition("user_id")
        cell = materialize(cell.distinct())
        return materialize(
            basket_pairs(cell, "cell", "user_id", item_cap=64,
                         assume_distinct=True)
            .filter(F.col("n_both") >= min_cells)
        )

    def checksum(df):
        cols = df.columns
        return df.select(
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)"))
            .cast("string").alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0].asDict()

    # --- case builders: name -> {variant: fn() -> DataFrame} ----------
    def sp_variants():
        # the merge_join variant (full-outer least-merge) was measured
        # here (no gain over pe, +2 jobs) and REMOVED from graph.py
        def mk(partition_edges):
            def build():
                cop = cop_pairs(3)
                w = F.expr("CAST(1000000 DIV n_both AS BIGINT)")
                we = cop.select(
                    F.col("item_a").alias("src"),
                    F.col("item_b").alias("dst"), w.alias("w"),
                ).unionAll(cop.select(
                    F.col("item_b").alias("src"),
                    F.col("item_a").alias("dst"), w.alias("w"),
                ))
                seed = we.agg(F.min("src").alias("node"))
                return (
                    G.shortest_paths_bounded(
                        we, seed, rounds=3, broadcast_dist=True,
                        assume_nonneg_weights=True,
                        partition_edges=partition_edges,
                    )
                    .select(F.col("node").alias("user_id"),
                            F.col("dist").alias("dist_micro"))
                    .orderBy("dist_micro", "user_id").limit(15)
                )
            return build
        return {
            "base": mk(False),
            "pe": mk(True),
        }

    def lpa_variants():
        # the fold_flips variant was measured here (base 8.1 vs fold
        # 11.1 s median, jobs 31 vs 34) and REMOVED from graph.py —
        # this case now just times the shipped shape for reference
        def mk():
            def build():
                edges = cop_pairs(3)
                return G.lpa_convergence(
                    edges, src_col="item_a", dst_col="item_b",
                    iterations=3, broadcast_labels=True,
                    assume_distinct=True, partition_edges=True,
                ).orderBy("round")
            return build
        return {"base": mk()}

    def chain_variants():
        def mk(shape):
            def build():
                return cop_pairs(3, shape=shape)
            return build
        return {
            "base": mk("base"),
            "cellpart": mk("cellpart"),
            "userpart": mk("userpart"),
        }

    def part_aff_variants():
        def mk(shape):
            def build():
                li = t["lineitem"].select("l_orderkey", "l_partkey")
                if shape == "okpart":
                    li = li.repartition("l_orderkey")
                li = materialize(li.distinct())
                if shape == "base":
                    n_orders = (
                        t["lineitem"].select("l_orderkey").distinct().count()
                    )
                else:
                    n_orders = li.select("l_orderkey").distinct().count()
                freq = materialize(
                    li.groupBy("l_partkey").agg(
                        F.count(F.lit(1)).cast("bigint").alias("n_part"))
                )
                pairs = (
                    basket_pairs(li, "l_orderkey", "l_partkey", item_cap=32,
                                 freq=freq, assume_distinct=True)
                    .withColumnRenamed("item_a", "part_a")
                    .withColumnRenamed("item_b", "part_b")
                    .filter(F.col("n_both") >= 2)
                )
                return (
                    pairs.join(F.broadcast(
                        freq.withColumnRenamed("l_partkey", "part_a")
                        .withColumnRenamed("n_part", "n_a")), "part_a")
                    .join(F.broadcast(
                        freq.withColumnRenamed("l_partkey", "part_b")
                        .withColumnRenamed("n_part", "n_b")), "part_b")
                    .select(
                        "part_a", "part_b", "n_both",
                        F.round(
                            F.col("n_both").cast("double") * F.lit(n_orders)
                            / (F.col("n_a") * F.col("n_b")), 6,
                        ).alias("lift"))
                    .orderBy(F.col("lift").desc(), "part_a", "part_b")
                    .limit(20)
                )
            return build
        return {
            "base": mk("base"),
            "lireuse": mk("lireuse"),
            "okpart": mk("okpart"),
        }

    def agree_variants():
        def base():
            return workload.QUERIES["docs_dedup_method_agreement"](
                spark, args.sf_dir)

        def shared():
            from moisturizer_spark.operators.dedup import (
                minhash_near_duplicates, simhash_near_duplicates)
            from moisturizer_spark.operators.textan import (
                tokens_col, winnowing_near_duplicates)
            subset = materialize(
                t["documents"]
                .filter(F.col("doc_id") < workload._DET_SUBSET_MAX_DOC_ID)
                .select("doc_id", "text")
            )
            mh = minhash_near_duplicates(
                subset, num_hashes=workload._MINHASH_DET_HASHES,
                threshold=workload._MINHASH_DET_THRESHOLD, det=True,
            ).select("id_a", "id_b")
            sh = simhash_near_duplicates(
                subset.filter(F.size(tokens_col(F.col("text"))) > 0),
                max_hamming=16, det=True,
            ).select("id_a", "id_b")
            wn = winnowing_near_duplicates(
                subset, min_common=10, det=True,
            ).select("id_a", "id_b")
            u = (
                mh.withColumn("m", F.lit("mh"))
                .unionByName(sh.withColumn("m", F.lit("sh")))
                .unionByName(wn.withColumn("m", F.lit("wn")))
            )
            lab = u.groupBy("id_a", "id_b").agg(
                F.max(F.when(F.col("m") == "mh", 1).otherwise(0)).alias("i_mh"),
                F.max(F.when(F.col("m") == "sh", 1).otherwise(0)).alias("i_sh"),
                F.max(F.when(F.col("m") == "wn", 1).otherwise(0)).alias("i_wn"),
            )
            return lab.agg(
                F.sum("i_mh").cast("bigint").alias("minhash_pairs"),
                F.sum("i_sh").cast("bigint").alias("simhash_pairs"),
                F.sum("i_wn").cast("bigint").alias("winnowing_pairs"),
                F.sum(F.col("i_mh") * F.col("i_sh")).cast("bigint").alias("mh_sh_both"),
                F.sum(F.col("i_mh") * F.col("i_wn")).cast("bigint").alias("mh_wn_both"),
                F.sum(F.col("i_sh") * F.col("i_wn")).cast("bigint").alias("sh_wn_both"),
                F.sum(F.col("i_mh") * F.col("i_sh") * F.col("i_wn"))
                .cast("bigint").alias("all_three"),
                F.count(F.lit(1)).cast("bigint").alias("any_method"),
            )
        return {"base": base, "shared": shared}

    cases = {
        "sp_dist": sp_variants(),
        "lpa_conv": lpa_variants(),
        "cop_chain": chain_variants(),
        "part_aff": part_aff_variants(),
        "agree": agree_variants(),
    }
    if args.only:
        cases = {k: v for k, v in cases.items() if k in args.only}

    for cname, variants in cases.items():
        times = {v: [] for v in variants}
        jobs = {v: None for v in variants}
        sums = {v: None for v in variants}
        for rep in range(args.reps):
            for vname, build in variants.items():
                spark.sparkContext.setJobDescription(
                    f"ab:{cname}:{vname}:rep{rep}")
                j0 = len(tracker.getJobIdsForGroup(None))
                t0 = time.perf_counter()
                with cache_scope():
                    df = build()
                    df.write.format("noop").mode("overwrite").save()
                    if rep == 0:
                        sums[vname] = checksum(df)
                times[vname].append(round(time.perf_counter() - t0, 3))
                jobs[vname] = len(tracker.getJobIdsForGroup(None)) - j0
        for vname in variants:
            ts = sorted(times[vname])
            print(json.dumps({
                "case": cname, "variant": vname,
                "median_s": ts[len(ts) // 2], "min_s": ts[0],
                "times": times[vname], "jobs_last_rep": jobs[vname],
                "checksum": sums[vname],
            }), flush=True)


if __name__ == "__main__":
    main()
