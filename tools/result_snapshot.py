"""Snapshot query results for before/after equivalence checking.

For each named query, collects the full result (ordered by every column
as a canonical sort for unordered results are already deterministic by
contract), renders rows to a canonical string form, and writes
``{query: md5, ...}`` JSON. Run before and after an optimization and
diff the two files: identical hashes == identical results.

Usage:
    python tools/result_snapshot.py --out /tmp/before.json [--sf-dir DIR] q1 q2 ...
    python tools/result_snapshot.py --out /tmp/before.json --all
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(v) -> str:
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (bytes, bytearray)):
        return "b:" + bytes(v).hex()
    return f"{type(v).__name__}:{v}"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--out", required=True)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from moisturizer_spark.session import get_spark
    from moisturizer_spark import workload
    from moisturizer_spark.operators.common import cache_scope

    spark = get_spark(app_name="result_snapshot", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    names = list(workload.QUERIES) if args.all else args.queries
    out = {}
    for name in names:
        fn = workload.QUERIES[name]
        try:
            with cache_scope():
                df = fn(spark, args.sf_dir)
                rows = df.collect()
            lines = sorted(
                "|".join(canon(v) for v in row) for row in rows
            )
            h = hashlib.md5(
                ("\n".join(lines) + f"\nschema:{df.schema.simpleString()}")
                .encode()
            ).hexdigest()
            out[name] = {"rows": len(lines), "md5": h}
        except Exception as exc:  # pragma: no cover - diagnostic tool
            out[name] = {"error": str(exc)[:300]}
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
