"""sf0.1 -> sf1 runtime-growth probe (VERDICT r09 #4).

Runs a named set of workload queries at two scale dirs with bench.py's
materialization discipline (noop writer, warmup, one session) and
reports per-query times + growth ratios. Results feed SCALE.md.

Usage:
  python tools/scale_probe.py --queries q1,q2 [--passes 2] \
      --dirs /root/testdata/sf0.1,/tmp/scale_sf1 --out /tmp/scale_probe.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument(
        "--dirs", default="/root/testdata/sf0.1,/tmp/scale_sf1"
    )
    ap.add_argument("--out", default="/tmp/scale_probe.json")
    args = ap.parse_args()
    names = [q for q in args.queries.split(",") if q]
    dirs = args.dirs.split(",")
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )

    from moisturizer_spark.session import get_spark
    from moisturizer_spark import workload

    spark = get_spark(
        app_name="scale_probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm = spark.range(1_000_000)
    warm.selectExpr("sum(cast(id as decimal(15,4)))").collect()

    results: dict[str, dict[str, list[float]]] = {}
    for name in names:
        fn = workload.QUERIES[name]
        results[name] = {}
        for d in dirs:
            ts = []
            err = None
            for _ in range(args.passes):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                try:
                    fn(spark, d).write.format("noop").mode(
                        "overwrite"
                    ).save()
                except Exception as e:  # record, keep probing
                    err = f"{type(e).__name__}: {str(e)[:200]}"
                    break
                ts.append(round(time.monotonic() - t0, 3))
            results[name][d] = {"times": ts, "err": err} if err else ts
            print(f"{name} @ {d}: {ts} {err or ''}",
                  file=sys.stderr, flush=True)
    load1 = os.getloadavg()[0]
    out = {"passes": args.passes, "dirs": dirs, "results": results,
           "load_avg_end": round(load1, 2)}
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    for name, per in results.items():
        if any(isinstance(per[d], dict) for d in dirs):
            print(json.dumps({"query": name, "err": per}, default=str))
            continue
        best = [min(per[d]) for d in dirs]
        ratio = round(best[1] / best[0], 2) if best[0] > 0 else None
        print(json.dumps({"query": name, "best": best, "ratio": ratio}))
    spark.stop()


if __name__ == "__main__":
    main()
