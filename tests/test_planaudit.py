"""planaudit: the plan-review loop as data."""

from __future__ import annotations

from moisturizer_spark.planaudit import plan_facts, workload_plan_report
from moisturizer_spark.session import load_tables


def test_plan_facts_sees_broadcast_and_pushdown(spark, sf_dir):
    from moisturizer_spark.workload import QUERIES

    # q3 is pinned broadcast + pushdown by the plan suites — the audit
    # must report the same facts the tests assert
    facts = plan_facts(QUERIES["q3_top_revenue_orders"](spark, sf_dir))
    assert facts["has_broadcast_join"] and facts["has_pushed_filters"]
    assert not facts["has_nested_loop"]
    assert facts["n_scans"] >= 2


def test_workload_plan_report_matches_budget_counts(spark, sf_dir):
    from tests.test_plan_budgets import BUDGETS

    names = ["q1_pricing_summary", "events_coactivity", "tfidf_top_terms"]
    rep = {
        r.query: r.asDict()
        for r in workload_plan_report(spark, sf_dir, names).collect()
    }
    for n in names:
        assert rep[n]["error"] is None
        assert rep[n]["n_exchanges"] <= BUDGETS[n]
        assert not rep[n]["has_nested_loop"]


def test_workload_plan_report_survives_broken_query(spark, sf_dir):
    import moisturizer_spark.workload as wl

    wl.QUERIES["__broken__"] = lambda s, d: (_ for _ in ()).throw(
        RuntimeError("boom")
    )
    try:
        rep = {
            r.query: r
            for r in workload_plan_report(
                spark, sf_dir, ["q6_forecast_revenue", "__broken__"]
            ).collect()
        }
        assert rep["q6_forecast_revenue"].error is None
        assert "RuntimeError" in rep["__broken__"].error
    finally:
        del wl.QUERIES["__broken__"]
