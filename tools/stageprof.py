"""Stage-level profiler: run one workload query with the Spark event
log enabled and print per-stage wall/exec times, task counts, shuffle
bytes, and the first line of each stage's callsite — the local-mode
stand-in for the Spark UI's stage table (guide §7.1).

Usage: python tools/stageprof.py <query> [--passes N] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    evdir = tempfile.mkdtemp(prefix="sparkev_")
    from moisturizer_spark.session import get_spark, load_tables
    from moisturizer_spark import workload
    from moisturizer_spark.operators.common import cache_scope

    spark = get_spark(app_name=f"stageprof_{args.query}", extra_conf={
        "spark.ui.showConsoleProgress": "false",
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": evdir,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")
    for df in load_tables(spark, args.sf_dir).values():
        df.head(1)

    fn = workload.QUERIES[args.query]
    marks = []
    for p in range(args.passes):
        t0 = time.perf_counter()
        with cache_scope():
            df = fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        marks.append((t0, t1, t2))
        print(f"pass {p}: build={t1-t0:.2f}s exec={t2-t1:.2f}s total={t2-t0:.2f}s",
              file=sys.stderr)
    spark.stop()

    # parse the event log: stages of the LAST pass (between marks[-1])
    import glob
    cands = sorted(
        f for f in glob.glob(os.path.join(evdir, "**", "*"), recursive=True)
        if os.path.isfile(f) and "appstatus" not in os.path.basename(f)
    )
    logf = cands[-1]
    stages = []
    with open(logf) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except Exception:
                continue
            if ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time", 0) / 1000.0
                comp = si.get("Completion Time", 0) / 1000.0
                stages.append({
                    "stage": si["Stage ID"],
                    "wall_s": round(comp - sub, 3),
                    "ntasks": si.get("Number of Tasks"),
                    "name": si.get("Stage Name", "")[:80],
                    "sub": sub,
                })
    # report all stages in submission order with wall time
    stages.sort(key=lambda s: s["sub"])
    total = sum(s["wall_s"] for s in stages)
    print(f"# {len(stages)} stages, sum of stage walls {total:.2f}s")
    for s in stages:
        print(f"stage {s['stage']:4d} {s['wall_s']:7.3f}s {s['ntasks']:4d}t  {s['name']}")


if __name__ == "__main__":
    main()
