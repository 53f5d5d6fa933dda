"""Per-query profiler: split a workload query's wall time into plan
construction (Python DataFrame building), Catalyst analysis+optimization
(explain), and execution (noop write), plus Spark job/stage counts.

Usage:
    python tools/qprof.py [--passes N] [--sf-dir DIR] [--plans-out DIR] q1 q2 ...
    python tools/qprof.py --top K          # K most expensive by bench_detail.json

Writes one JSON line per query to stdout and optionally the
``.explain("formatted")`` text to ``<plans-out>/<query>.txt``.
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
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans-out", default=None)
    ap.add_argument("--top", type=int, default=0)
    args = ap.parse_args()

    from moisturizer_spark.session import get_spark, load_tables
    from moisturizer_spark import workload
    from moisturizer_spark.operators.common import cache_scope

    names = list(args.queries)
    if args.top:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        detail = json.load(open(os.path.join(here, "bench_detail.json")))
        med = detail["queries_median"]
        names += sorted(med, key=med.get, reverse=True)[: args.top]

    spark = get_spark(app_name="qprof", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench.py
    warm = spark.range(1_000_000)
    warm.selectExpr("sum(cast(id as decimal(15,4))) as s", "avg(id) as a").collect()
    warm.selectExpr(
        "id", "row_number() over (partition by id % 7 order by id) as rn"
    ).where("rn < 0").count()
    warm.join(spark.range(100).hint("broadcast"), "id").count()
    spark.range(10_000).mapInPandas(lambda it: it, "id long").count()
    for df in load_tables(spark, args.sf_dir).values():
        df.head(1)

    tracker = spark.sparkContext.statusTracker()

    for name in names:
        fn = workload.QUERIES[name]
        spark.sparkContext.setJobDescription(f"qprof:{name}")
        best = None
        for p in range(args.passes):
            jobs0 = tracker.getJobIdsForGroup(None)
            t0 = time.perf_counter()
            with cache_scope():
                df = fn(spark, args.sf_dir)
                t1 = time.perf_counter()
                plan_txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
                t2 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t3 = time.perf_counter()
            njobs = len(tracker.getJobIdsForGroup(None)) - len(jobs0)
            rec = {
                "query": name, "pass": p,
                "build_s": round(t1 - t0, 3),
                "plan_s": round(t2 - t1, 3),
                "exec_s": round(t3 - t2, 3),
                "total_s": round(t3 - t0, 3),
                "n_jobs": njobs,
                "n_exchange": plan_txt.count("Exchange"),
                "n_pyeval": plan_txt.count("EvalPython")
                + plan_txt.count("MapInArrow") + plan_txt.count("MapInPandas"),
            }
            print(json.dumps(rec), flush=True)
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
                if args.plans_out and p == 0:
                    os.makedirs(args.plans_out, exist_ok=True)
                    with open(os.path.join(args.plans_out, f"{name}.txt"), "w") as fh:
                        fh.write(plan_txt)
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
