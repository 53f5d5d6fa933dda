"""Plan auditing: the engine's own plan-review loop as a queryable table.

Every round of this engine's development ends with the same manual
audit — for each workload query, how many Exchanges does the plan
carry, does the small side broadcast, do filters reach the parquet
scan, did a nested-loop join sneak in. The shuffle-budget and
no-cartesian test suites enforce those properties mechanically; this
module exposes the SAME measurements as a runtime affordance, so an
operator (or a CI job against a new Spark version) can diff plan shapes
across releases without reading formatted-explain walls of text.

Everything here is driver-side string analysis of ``explain`` output —
no job runs, no data moves; auditing 100 queries costs seconds.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame, SparkSession

_NODE = re.compile(r"^\(\d+\) (\w+)", re.M)
_PUSHED = re.compile(r"PushedFilters: \[(?!\])")


def plan_facts(df: DataFrame) -> dict:
    """Structural facts about one DataFrame's initial physical plan:
    Exchange count (ReusedExchange excluded — a reuse is free),
    broadcast / sort-merge / nested-loop join presence, whether any
    scan reports pushed filters, and whole-stage-codegen span count."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    nodes = _NODE.findall(plan)
    return {
        "n_exchanges": sum(1 for n in nodes if n == "Exchange"),
        "n_reused_exchanges": sum(1 for n in nodes if n == "ReusedExchange"),
        "has_broadcast_join": any("BroadcastHashJoin" in n for n in nodes),
        "has_sort_merge_join": any("SortMergeJoin" in n for n in nodes),
        "has_nested_loop": any(
            "BroadcastNestedLoopJoin" in n or "CartesianProduct" in n
            for n in nodes
        ),
        "has_pushed_filters": bool(_PUSHED.search(plan)),
        "n_scans": sum(1 for n in nodes if n.startswith("Scan")),
    }


def workload_plan_report(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> DataFrame:
    """One row of :func:`plan_facts` per workload query — the artifact
    to diff across Spark upgrades or plan-affecting config changes
    ("which queries lost their broadcast?", "where did a new shuffle
    appear?"). Queries whose plan construction fails are reported with
    ``error`` set instead of aborting the sweep."""
    from moisturizer_spark.workload import QUERIES

    rows = []
    for name in names or list(QUERIES):
        try:
            facts = plan_facts(QUERIES[name](spark, sf_dir))
            rows.append((name, *facts.values(), None))
        except Exception as exc:  # noqa: BLE001 — survey must complete
            rows.append((name, None, None, None, None, None, None, None,
                         f"{type(exc).__name__}: {exc}"[:200]))
    return spark.createDataFrame(
        rows,
        "query string, n_exchanges int, n_reused_exchanges int, "
        "has_broadcast_join boolean, has_sort_merge_join boolean, "
        "has_nested_loop boolean, has_pushed_filters boolean, "
        "n_scans int, error string",
    )
