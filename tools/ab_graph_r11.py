"""Round-11 interleaved A/B: graph-family partition_edges / broadcast /
checkpoint variants, alternated inside ONE session so co-tenant drift
cancels (the only trustworthy comparison on this host — see
OPTIMIZATION_r10.md "ambient-drift problem").

Usage: python tools/ab_graph_r11.py [--reps N] [--sf-dir DIR] [--only name...]
Prints one JSON line per (case, variant) with per-rep times, and an
Exchange-node count from the formatted plan of each variant.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _exchanges(df) -> tuple[int, int]:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    txt = buf.getvalue()
    numbered = len(re.findall(r"^\s*\(\d+\) Exchange", txt, re.M))
    raw = len(re.findall(r"\bExchange\b", txt))
    return numbered, raw


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    from moisturizer_spark.session import get_spark, load_tables
    from moisturizer_spark.operators.common import cache_scope
    from moisturizer_spark.operators import graph as G
    from pyspark.sql import functions as F

    spark = get_spark(app_name="ab_graph_r11", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    warm = spark.range(1_000_000)
    warm.selectExpr("sum(cast(id as decimal(15,4))) as s").collect()
    warm.join(spark.range(100).hint("broadcast"), "id").count()
    t = load_tables(spark, args.sf_dir)
    for df in t.values():
        df.head(1)

    def trade_edges():
        cs = (
            t["orders"].join(
                t["lineitem"],
                t["orders"]["o_orderkey"] == t["lineitem"]["l_orderkey"])
            .select("o_custkey", "l_suppkey").distinct()
        )
        return cs.select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        ).unionAll(cs.select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
        ))

    def cs_directed():
        cs = (
            t["orders"].join(
                t["lineitem"],
                t["orders"]["o_orderkey"] == t["lineitem"]["l_orderkey"])
            .select("o_custkey", "l_suppkey").distinct()
        )
        return cs.select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )

    def cop_pairs(min_cells):
        from moisturizer_spark.workload import _copresence_pairs
        return _copresence_pairs(t, min_cells)

    cases = {}

    cases["pagerank"] = {
        "off": lambda: G.pagerank_int(
            trade_edges(), iterations=3, scale=10**10,
            broadcast_ranks=True, assume_distinct=True,
            partition_edges=False),
        "on": lambda: G.pagerank_int(
            trade_edges(), iterations=3, scale=10**10,
            broadcast_ranks=True, assume_distinct=True,
            partition_edges=True),
    }
    cases["lpa_comm"] = {
        "off": lambda: G.lpa_communities(
            cop_pairs(3), src_col="item_a", dst_col="item_b", iterations=3,
            broadcast_labels=True, assume_distinct=True,
            partition_edges=False),
        "on": lambda: G.lpa_communities(
            cop_pairs(3), src_col="item_a", dst_col="item_b", iterations=3,
            broadcast_labels=True, assume_distinct=True,
            partition_edges=True),
    }
    cases["lpa_conv"] = {
        "off": lambda: G.lpa_convergence(
            cop_pairs(3), src_col="item_a", dst_col="item_b", iterations=3,
            broadcast_labels=True, assume_distinct=True,
            partition_edges=False),
        "on": lambda: G.lpa_convergence(
            cop_pairs(3), src_col="item_a", dst_col="item_b", iterations=3,
            broadcast_labels=True, assume_distinct=True,
            partition_edges=True),
    }
    cases["hits"] = {
        "off": lambda: G.hits_bipartite(
            cs_directed(), rounds=2, assume_distinct=True),
        "bcast": lambda: G.hits_bipartite(
            cs_directed(), rounds=2, assume_distinct=True,
            broadcast_scores=True),
        "bcast_part": lambda: G.hits_bipartite(
            cs_directed(), rounds=2, assume_distinct=True,
            broadcast_scores=True, partition_edges=True),
    }

    def bfs_seeds():
        return t["supplier"].filter(F.col("s_suppkey") < 3).select(
            F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node"))

    cases["bfs"] = {
        "off": lambda: G.bfs_levels(
            trade_edges(), bfs_seeds(), max_hops=3, assume_distinct=True),
        "bcast_part": lambda: G.bfs_levels(
            trade_edges(), bfs_seeds(), max_hops=3, assume_distinct=True,
            broadcast_frontier=True, partition_edges=True),
    }

    def kcore_edges():
        return cop_pairs(3).select(
            F.col("item_a").alias("src"), F.col("item_b").alias("dst"))

    cases["kcore"] = {
        "eager": lambda: G.k_core(
            kcore_edges(), k=2, rounds=4, assume_distinct=True,
            broadcast_alive=True, eager_checkpoints=True),
        "lazy": lambda: G.k_core(
            kcore_edges(), k=2, rounds=4, assume_distinct=True,
            broadcast_alive=True, eager_checkpoints=False),
    }

    if args.only:
        cases = {k: v for k, v in cases.items() if k in args.only}

    results = {}
    for name, variants in cases.items():
        results[name] = {v: [] for v in variants}
        # plan shape once per variant
        for v, fn in variants.items():
            with cache_scope():
                df = fn()
                numbered, raw = _exchanges(df)
            results[name][f"_exchanges_{v}"] = [numbered, raw]
        for rep in range(args.reps):
            for v, fn in variants.items():
                spark.sparkContext.setJobDescription(f"ab {name}/{v} rep{rep}")
                t0 = time.perf_counter()
                with cache_scope():
                    fn().write.format("noop").mode("overwrite").save()
                results[name][v].append(
                    round(time.perf_counter() - t0, 3))
        out = {"case": name}
        for v in variants:
            ts = results[name][v]
            out[v] = {"min": min(ts), "med": sorted(ts)[len(ts) // 2],
                      "all": ts, "exchanges": results[name][f"_exchanges_{v}"]}
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
